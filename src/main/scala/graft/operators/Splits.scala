package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-splitting and sequence-packing operators for training-data
  * pipelines.
  *
  * Both are deterministic by construction (closed-form hash / pinned
  * window order), so they are exactly reproducible across runs, across
  * cluster layouts, AND by the DuckDB oracle — unlike `randomSplit`,
  * whose per-partition Bernoulli sampling changes with partitioning and
  * gives no stable row↔split mapping.
  */
object Splits {

  /** Deterministic split assignment by multiplicative hash of `key` over
    * the 2³² ring: cumulative weight boundaries carve the ring, and a row
    * lands in the segment its hash falls into. Same key → same split,
    * always — pass a GROUP key (source, url domain, author) instead of the
    * row id to keep groups intact across splits (leakage control).
    *
    * Map-only (no shuffle, no state); the hash is the same Knuth
    * multiplicative scheme the IVF initializer uses, closed-form in SQL
    * for the oracle. */
  def assign(key: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.size >= 2, "need at least two splits")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1, got ${weights.map(_._2).sum}")
    val ring = 4294967296L // 2^32
    val bucket = pmod(key.cast("long") * lit(2654435761L), lit(ring))
    val cuts = weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c * ring).toLong)
    // when(bucket < cut1, name1).when(bucket < cut2, name2)...otherwise(last)
    val chain = weights.dropRight(1).zip(cuts).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cut)) =>
        Some(acc.fold(when(bucket < cut, name))(_.when(bucket < cut, name)))
    }
    chain.get.otherwise(weights.last._1)
  }

  /** The split boundaries [[assign]] uses, for embedding in oracle SQL. */
  def cutsFor(weights: Seq[(String, Double)]): Seq[Long] =
    weights.map(_._2).scanLeft(0.0)(_ + _).tail.map(c => (c * 4294967296L).toLong)

  /** Sequence packing: assign each row to a fixed-budget bin by the
    * cumulative size of the rows before it (within `part`, ordered by
    * `order`) — the standard pretraining "pack documents into ~budget-token
    * sequences" step, as a window computation. A row whose prefix sum
    * crosses the boundary starts in its bin and may overflow it by at most
    * one row — greedy sequential packing, deterministic for a unique
    * `order` key.
    *
    * Scale shape: one window per `part` value — the partition key (shard,
    * language, date bucket) is the parallelism unit; packing is never a
    * global single-partition sort. */
  def packByBudget(df: DataFrame, part: Column, order: Column,
                   size: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(part).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum_before", coalesce(sum(size.cast("long")).over(w), lit(0L)))
      .withColumn("bin", floor(col("__cum_before") / budget).cast("long"))
      .drop("__cum_before")
  }
}
