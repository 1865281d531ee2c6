package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression

/** Arity-checked builders for the engine's registered SQL functions: a
  * call with the wrong argument count gets a readable one-line error
  * naming the function and the expected arity, instead of an
  * IndexOutOfBoundsException thrown from inside Catalyst's function
  * resolution (an opaque internal error for a plain user mistake). */
private[plans] object Builders {

  def binary(name: String)(f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case other => throw new IllegalArgumentException(
      s"$name requires exactly 2 arguments, got ${other.size}")
  }

  def ternary(name: String)(f: (Expression, Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b, c) => f(a, b, c)
    case other => throw new IllegalArgumentException(
      s"$name requires exactly 3 arguments, got ${other.size}")
  }
}
