package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** One materialization per micro-batch delta, shared by every fold path.
  *
  * Each `foldBatch` consumes its delta at least twice — once for the
  * empty-batch probe, once for the build/commit (majors and audited folds
  * scan it more) — and a `foreachBatch` frame re-computes its upstream on
  * EVERY action, so a derived delta (a join, a distinct) pays its full
  * plan per consumption. Pinning the delta for the duration of the fold
  * makes the batch's upstream cost exactly one scan. The cache is
  * |Δ|-sized (bounded by the micro-batch), never the corpus, so the pin
  * holds at 100 TB; it is released before the fold returns, and nothing a
  * fold commits is lazy over the delta (epoch commits are durable parquet
  * by contract), so no released frame escapes.
  */
object Deltas {

  /** Run `f` over a persisted view of `delta`, releasing the cache on the
    * way out (success or throw). */
  def withMaterialized[T](delta: DataFrame)(f: DataFrame => T): T = {
    val pinned = delta.persist(StorageLevel.MEMORY_AND_DISK)
    try f(pinned) finally { pinned.unpersist(); () }
  }
}
