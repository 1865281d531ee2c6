package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-callable handles on Spark's OWN Bloom-filter expressions —
  * `BloomFilterAggregate` (the builder: a commutative OR-merge aggregate
  * producing one serialized filter) and `BloomFilterMightContain` (the
  * probe: constant filter, xxhash64'd value). Catalyst ships both for its
  * runtime row-level filtering but leaves them out of the public function
  * registry; registering them (rather than re-implementing a bloom as a
  * UDF or UDAF) keeps the zero-UDF discipline AND inherits the tuned,
  * codegen-aware implementations the engine itself trusts.
  *
  * Usage contract: both sides hash with `xxhash64(col)` (LongType in,
  * default seed), the builder's items/bits arguments are literals, and the
  * probe's filter argument is a literal byte array — the collected filter
  * is small (numBits/8 bytes) and rides into the plan the same way a
  * broadcast small side would.
  */
object BloomMembership {

  private[plans] val aggInfo =
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg")
  private[plans] val probeInfo =
    new ExpressionInfo(classOf[BloomFilterMightContain].getName,
      "bloom_might_contain")

  val aggBuilder: Seq[Expression] => Expression =
    Builders.ternary("bloom_agg")(new BloomFilterAggregate(_, _, _))
  val probeBuilder: Seq[Expression] => Expression =
    Builders.binary("bloom_might_contain")(BloomFilterMightContain(_, _))

  /** Idempotent per-session registration (same defensive shape as
    * [[FloatDotProduct.register]]). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val aggId = FunctionIdentifier("bloom_agg")
    if (!reg.functionExists(aggId))
      reg.registerFunction(aggId, aggInfo, aggBuilder)
    val probeId = FunctionIdentifier("bloom_might_contain")
    if (!reg.functionExists(probeId))
      reg.registerFunction(probeId, probeInfo, probeBuilder)
  }
}
