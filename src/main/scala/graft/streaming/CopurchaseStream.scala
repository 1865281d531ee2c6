package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Rolling co-purchase graph from the RAW fact stream — the missing hop
  * between a lineitem feed and [[GraphEpochStream]]: deriving edges
  * per-batch with a plain pair-gen self-join silently DROPS every pair
  * whose two lines arrive in different micro-batches (an order is not a
  * batch-local object). The incremental-join identity fixes it the way
  * [[graft.operators.IncrementalJoin]] maintains join views:
  *
  *   Δedges = Δ ⋈ standing (both directions) ∪ Δ ⋈ Δ,   keyed on order
  *
  * so a pair materializes exactly when its LATER line arrives. The
  * standing side prunes to the batch's TOUCHED ORDERS by a semi-join
  * before any pair expansion — per-batch cost is |Δ|-proportional, never
  * a standing×standing re-generation. Derived deltas feed
  * [[GraphEpochStream.foldBatch]] (dedup = true absorbs the duplicate
  * edges replays and standing/delta overlaps produce), so the rolled
  * index converges to `Adjacency.build(copurchasePairs(all lines))`
  * bit-identically.
  *
  * State: processed lines land under `linesDir/batch=<id>` (overwrite —
  * replay-idempotent); the standing read EXCLUDES the current batch id,
  * so a replayed batch derives the same delta it derived the first time.
  * Crash matrix: lines written but epoch torn → the replay overwrites the
  * lines (same content) and re-folds; epoch committed but the checkpoint
  * not → the replay rewrites lines and [[GraphEpochStream.foldBatch]]
  * skips the already-applied fold. Single-writer, like every epoch
  * artifact. */
object CopurchaseStream {

  private val LineSchema = StructType(Seq(
    StructField("o", LongType), StructField("p", LongType)))

  private def batchDirs(spark: SparkSession, linesDir: String,
                        excludeId: Long): Seq[String] = {
    val root = new Path(linesDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("batch=") &&
          scala.util.Try(n.stripPrefix("batch=").toLong)
            .toOption.exists(_ != excludeId))
        Some(st.getPath.toString)
      else None
    }
  }

  /** All lines of batches BEFORE (≠) `excludeId` — empty-schema frame at
    * bootstrap. */
  private def standingLines(spark: SparkSession, linesDir: String,
                            excludeId: Long): DataFrame = {
    val dirs = batchDirs(spark, linesDir, excludeId)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], LineSchema)
    else spark.read.schema(LineSchema).parquet(dirs: _*)
  }

  /** The delta co-purchase edges one batch of `(l_orderkey, l_partkey)`
    * lines adds over the standing lines: batch × standing-of-touched-
    * orders in BOTH directions plus batch × batch (the self-join emits
    * both directions itself). Pure batch logic. */
  def deltaEdges(batch: DataFrame, standing: DataFrame): DataFrame = {
    val b = batch.select(col("l_orderkey").cast("long").as("o"),
      col("l_partkey").cast("long").as("p")).distinct()
    val touched = b.select("o").distinct()
    val s = standing.join(touched, Seq("o"), "left_semi")
    val bs = b.as("a").join(s.as("x"),
      col("a.o") === col("x.o") && col("a.p") =!= col("x.p"))
    val bb = b.as("a").join(b.as("x"),
      col("a.o") === col("x.o") && col("a.p") =!= col("x.p"))
    bs.select(col("a.p").as("src"), col("x.p").as("dst"))
      .unionByName(bs.select(col("x.p").as("src"), col("a.p").as("dst")))
      .unionByName(bb.select(col("a.p").as("src"), col("x.p").as("dst")))
  }

  /** Process ONE batch: derive the delta edges against the standing
    * lines, record the batch's lines (overwrite — idempotent), fold the
    * delta into the newest graph epoch. Pure batch logic — unit-testable
    * without a stream. */
  def foldBatch(batch: DataFrame, linesDir: String, indexRoot: String,
                batchId: Long, keepEpochs: Int = 2): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // standing must be read under the PREVIOUS batches' view (exclude a
    // crashed attempt's own lines) BEFORE this batch's lines land; the
    // write then happens before the fold so a torn fold replays over
    // complete state
    val lines = batch.select(col("l_orderkey").cast("long").as("o"),
      col("l_partkey").cast("long").as("p")).distinct()
    val edges = deltaEdges(batch, standingLines(spark, linesDir, batchId))
      .persist()
    try {
      edges.count() // pin the delta BEFORE the lines write changes state
      lines.write.mode("overwrite").parquet(s"$linesDir/batch=$batchId")
      GraphEpochStream.foldBatch(edges, indexRoot, batchId,
        dedup = true, keepEpochs = keepEpochs)
    } finally { edges.unpersist(); () }
  }

  /** Start the roll: a stream of raw order lines → per-batch
    * [[foldBatch]] → committed co-purchase graph epochs under
    * `indexRoot`. */
  def start(lines: DataFrame, linesDir: String, indexRoot: String,
            checkpointDir: String, keepEpochs: Int = 2,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, linesDir, indexRoot, batchId, keepEpochs)
      }
      .start()
}
