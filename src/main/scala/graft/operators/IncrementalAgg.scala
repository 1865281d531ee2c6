package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: per-key rollup STATE that merges
  * exactly — the aggregate twin of the dedup `SignatureIndex` and the ANN
  * `IvfIndex` build/probe split. Build state once per corpus version
  * (write it as a table), then fold each arriving batch in with one
  * state-sized merge instead of re-scanning the corpus — the difference
  * between O(batch) and O(corpus) per refresh at 100 TB.
  *
  * Mergeability is exact, not approximate: counts and sums are algebraic
  * (long-unit fixed-point sums, so merge order — and therefore executor
  * scheduling — can never change a bit), min/max are idempotent
  * semilattice ops. State is self-describing via column-name prefixes
  * (`cnt_` / `sum_` / `min_` / `max_`): `merge` needs no side-channel
  * schema, so state written by one job merges in another.
  *
  * Retraction (CDC deletes) is supported for the invertible metrics only:
  * counts and sums subtract; min/max cannot un-see a value (classic
  * non-invertibility) — `retract` refuses state carrying them rather than
  * silently producing stale bounds.
  */
object IncrementalAgg {

  private val Prefixes = Seq("cnt_", "sum_", "min_", "max_")
  private def isMetric(c: String): Boolean = Prefixes.exists(c.startsWith)

  /** Aggregate `df` into mergeable per-key state.
    *
    * @param sums (column, scale) pairs: values are rounded to integer
    *             units at `scale` decimals and summed as longs — exact for
    *             fixed-point data, deterministic under any merge order
    *             (same contract as the query surface's exactSum)
    * @param minMax columns to track min/max of (cast to double)
    */
  def build(df: DataFrame, keys: Seq[String],
            sums: Seq[(String, Int)] = Nil,
            minMax: Seq[String] = Nil): DataFrame = {
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("cnt_rows")) ++
        sums.map { case (c, scale) =>
          val f = math.pow(10, scale)
          sum(round(col(c) * f, 0).cast("long")).as(s"sum_${c}__$scale")
        } ++
        minMax.flatMap(c => Seq(
          min(col(c).cast("double")).as(s"min_$c"),
          max(col(c).cast("double")).as(s"max_$c")))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge state frames (same schema) into one: one shuffle of STATE rows
    * — never of the underlying data. Keys are whatever columns carry no
    * metric prefix. */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state frame")
    val all = states.reduce(_.unionByName(_))
    val keys = all.columns.filterNot(isMetric)
    require(keys.nonEmpty, "state has no key columns")
    val aggs: Seq[Column] = all.columns.filter(isMetric).map { c =>
      if (c.startsWith("min_")) min(col(c)).as(c)
      else if (c.startsWith("max_")) max(col(c)).as(c)
      else sum(col(c)).as(c) // cnt_ and sum_ both add
    }
    all.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Remove `deleted` rows' contribution from `state`: build state over
    * the deleted rows with the SAME spec, negate its additive metrics, and
    * merge. Only count/sum state is invertible — refuses min/max. Keys
    * whose count reaches 0 are dropped (fully-retracted key). */
  def retract(state: DataFrame, deletedState: DataFrame): DataFrame = {
    val bad = deletedState.columns.filter(c =>
      c.startsWith("min_") || c.startsWith("max_"))
    require(bad.isEmpty,
      s"min/max state is not invertible; cannot retract: ${bad.mkString(", ")}")
    val negated = deletedState.columns.foldLeft(deletedState) { (d, c) =>
      if (c.startsWith("cnt_") || c.startsWith("sum_"))
        d.withColumn(c, -col(c)) else d
    }
    merge(state, negated).filter(col("cnt_rows") > 0)
  }

  /** Present state for reading: decode `sum_<c>__<scale>` long units back
    * to doubles as `sum_<c>`, rename `cnt_rows` to `n`. Derived metrics
    * (avg = sum/n) are one select away and deliberately not stored — they
    * don't merge. */
  def finish(state: DataFrame): DataFrame = {
    val cols: Seq[Column] = state.columns.toIndexedSeq.map {
      case "cnt_rows" => col("cnt_rows").as("n")
      case c if c.startsWith("sum_") && c.contains("__") =>
        val base = c.substring(4, c.lastIndexOf("__"))
        val scale = c.substring(c.lastIndexOf("__") + 2).toInt
        (col(c) / math.pow(10, scale)).as(s"sum_$base")
      case c => col(c)
    }
    state.select(cols: _*)
  }
}
