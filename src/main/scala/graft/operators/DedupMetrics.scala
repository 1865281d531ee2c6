package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator
import org.slf4j.LoggerFactory

/** Observability for the LSH bucket-size caps in [[Dedup]].
  *
  * Both MinHash-LSH and SimHash banding drop buckets larger than `maxBucket`
  * to refuse quadratic work on degenerate boilerplate. A dropped bucket is a
  * *recall* event: every pair inside it is not emitted, which voids any
  * completeness guarantee for the affected documents. This helper makes the
  * drop observable instead of silent:
  *
  *  - drop counts are carried in named `LongAccumulator`s, incremented at
  *    the point of refusal inside the bucket-side pair enumeration — named
  *    accumulators surface per-stage in the Spark web UI, so a cluster
  *    operator sees them without any code;
  *  - the executor task that refuses a bucket logs a WARN naming the recall
  *    consequence (rate-limited to one line per task, with per-task totals);
  *  - callers read the numbers through [[Dedup.ManagedPairs.drops]] after
  *    consuming the result; reading a non-zero count WARNs driver-side too.
  *
  * Design note: the first implementation used `Dataset.observe` +
  * `QueryExecutionListener`, which is the textbook mechanism — but AQE's
  * empty-relation propagation replaces the subtree holding the
  * `CollectMetrics` node with an empty `LocalTableScan` whenever the
  * candidate side collapses to zero rows (exactly the all-buckets-dropped
  * case that most needs reporting), and `QueryExecution.observedMetrics`
  * reads the final executed plan, so the metric vanished. Accumulators are
  * collected by the scheduler per task, independent of plan surgery.
  *
  * Accumulator semantics: values are cumulative across actions on the same
  * frame (a second `.count()` re-runs the post-shuffle stage and adds
  * again), so treat the stats as "has this pipeline ever dropped" — zero is
  * exact, non-zero magnitudes are per-run only if the caller runs one
  * action. This is the standard Spark accumulator contract.
  */
object DedupMetrics {

  /** Dropped-bucket statistics for a dedup pipeline.
    * @param buckets number of over-`maxBucket` buckets discarded
    * @param rows    total member rows inside those buckets (pairs lost is
    *                O(rows²) within each bucket)
    */
  final case class DropStats(buckets: Long, rows: Long) {
    def isZero: Boolean = buckets == 0L && rows == 0L
  }

  private val log = LoggerFactory.getLogger("graft.operators.Dedup")

  /** A pair of named accumulators (dropped buckets, dropped member rows)
    * plus a reader that WARNs when it observes a non-zero count. */
  final case class DropCounter(buckets: LongAccumulator, rows: LongAccumulator,
                               kind: String, maxBucket: Int) {
    def stats(): DropStats = {
      val s = DropStats(buckets.value, rows.value)
      if (!s.isZero) {
        log.warn(
          s"graft $kind dedup dropped ${s.buckets} LSH bucket(s) larger than " +
            s"maxBucket=$maxBucket (${s.rows} member rows). Pairs within " +
            s"dropped buckets are NOT emitted — RECALL for those documents " +
            s"is void and any exactness guarantee is conditional on zero " +
            s"drops. Raise maxBucket or pre-filter boilerplate to recover.")
      }
      s
    }
  }

  // Every live counter, so Verify/Bench can audit "did ANY capped kernel
  // drop pairs this run" without threading ManagedPairs handles through 118
  // query closures (r8 advice: a capped editPairs1 can silently lose pairs;
  // the artifact must carry the drop counts).
  private val registry =
    new java.util.concurrent.ConcurrentLinkedQueue[DropCounter]()

  /** Aggregate drop stats per kind across all counters created in this JVM.
    * Zero-valued kinds are included — "signature: 0 drops" is the positive
    * statement the bench artifact needs. */
  def snapshot(): Map[String, DropStats] = {
    val it = registry.iterator()
    val acc = scala.collection.mutable.Map[String, DropStats]()
    while (it.hasNext) {
      val c = it.next()
      val prev = acc.getOrElse(c.kind, DropStats(0L, 0L))
      acc(c.kind) = DropStats(prev.buckets + c.buckets.value,
        prev.rows + c.rows.value)
    }
    acc.toMap
  }

  def counter(spark: SparkSession, kind: String, maxBucket: Int): DropCounter = {
    val c = DropCounter(
      spark.sparkContext.longAccumulator(s"graft.dedup.$kind.droppedBuckets"),
      spark.sparkContext.longAccumulator(s"graft.dedup.$kind.droppedRows"),
      kind, maxBucket)
    registry.add(c)
    c
  }

  /** Drop all registered counters — scopes a later [[snapshot]] to the work
    * that follows. Bench calls this between its warm-up sweep and the timed
    * run so `dedup_drops` in the artifact speaks ONLY for the timed
    * queries: accumulators are cumulative per JVM, and a warm-up drop
    * would otherwise falsely void the timed run's exactness claim. Also
    * the registry's release valve — one DropCounter is registered per
    * kernel invocation and retained for the JVM lifetime otherwise. */
  def reset(): Unit = registry.clear()

  /** Executor-side WARN at the point of refusal — called from inside the
    * pair-enumeration task. Rate-limit in the caller (once per partition). */
  def warnDropped(kind: String, bucketSize: Int, maxBucket: Int): Unit =
    log.warn(
      s"graft $kind dedup: refusing bucket of $bucketSize members " +
        s"(maxBucket=$maxBucket) — its pairs are dropped; recall for these " +
        s"documents is void. Further drops in this task are counted but not " +
        s"logged.")
}
