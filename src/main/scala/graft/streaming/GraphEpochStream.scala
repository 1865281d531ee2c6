package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Adjacency, Checkpoints, IndexStore}

/** Streaming maintenance of the durable graph index — the stream side of
  * [[Adjacency.foldEdges]], closing the graph family's ingest loop the way
  * [[NearDupAdmission]] + [[graft.operators.Components.foldEdges]] close
  * the dedup family's: each arriving micro-batch of edges FOLDS into the
  * standing adjacency (per-batch cost proportional to the delta, q79's
  * certified identity) and the folded form is committed as a NEW epoch
  * directory under `root` — `epoch=<batchId>` — via
  * [[IndexStore.saveGraphIndex]].
  *
  * Why epoch DIRECTORIES rather than overwrite-in-place: the fold's input
  * is the standing index itself, so a torn overwrite would destroy the
  * only copy of the state it was derived from. A new directory per epoch
  * makes the save crash-safe without a transaction log — the meta file is
  * the per-epoch commit marker (IndexStore's torn-write contract), and
  * readers pick the NEWEST epoch with a valid marker:
  *
  *  - crash mid-save → epoch N+1 has no marker → readers and the replayed
  *    batch both see epoch N; the replay re-folds and overwrites the torn
  *    directory;
  *  - crash after save, before the stream checkpoint commits → the
  *    replayed batch finds its own epoch already valid and SKIPS — the
  *    fold is never applied twice (exactly-once, pinned in
  *    GraphEpochStreamSpec);
  *  - retention keeps `keepEpochs` newest valid epochs (≥2 so one
  *    fallback always survives a torn head) and prunes older directories
  *    after each successful commit.
  *
  * Reader contract: [[loadCurrent]] hands out LAZY frames over the
  * epoch's parquet files (the IndexStore zero-job contract), so a
  * reader's hold on an epoch must not outlive `keepEpochs − 1`
  * subsequent commits — after that, retention deletes the files under
  * its not-yet-cached (or evicted) partitions and a scan throws
  * FileNotFoundException. `keepEpochs` is therefore the reader GRACE
  * WINDOW, not just crash fallback: size it to ceil(longest reader
  * session / batch interval) + 1. Same single-writer ownership model as
  * every IndexStore artifact; concurrent writers need an external lock.
  *
  * Scale shape: the per-batch cost is the fold's (delta-sized shuffles +
  * one map-side pass over |V|) plus an O(|V|) parquet rewrite for the
  * epoch commit. The rewrite is the durability price — size micro-batches
  * like ingest epochs (minutes+, `Trigger.ProcessingTime`), not
  * per-second ticks. Compaction is free here: every epoch IS a compact
  * save, so fold-chain lineage never outlives one batch. */
object GraphEpochStream {

  private def epochDir(root: String, id: Long): String = EpochDirs.dir(root, id)

  private def params(dedup: Boolean, hubLimit: Long): Map[String, String] =
    Map("dedup" -> dedup.toString, "hub_limit" -> hubLimit.toString)

  /** Ids of committed (valid-marker, matching-parameter) epochs,
    * NEWEST first. Listing only — no Spark jobs. */
  def epochs(spark: SparkSession, root: String,
             dedup: Boolean, hubLimit: Long): Seq[Long] =
    EpochDirs.rawIds(spark, root)
      .filter(id => IndexStore.graphIndexMeta(spark,
        epochDir(root, id), params(dedup, hubLimit)).isDefined)
      .sorted(Ordering[Long].reverse)

  /** Load the newest committed epoch: `(epochId, hybrid)`, `None` when no
    * epoch has committed yet. Zero Spark jobs (the IndexStore load
    * contract). */
  def loadCurrent(spark: SparkSession, root: String,
                  dedup: Boolean, hubLimit: Long)
      : Option[(Long, Adjacency.Hybrid)] =
    epochs(spark, root, dedup, hubLimit).view
      .flatMap(id => IndexStore.loadGraphIndex(spark, epochDir(root, id),
        expectedParams = params(dedup, hubLimit)).map(id -> _))
      .headOption

  /** Fold ONE batch of edges (`(src, dst)` LONG columns, the
    * [[Adjacency.build]] contract) into the newest epoch and commit the
    * result as `epoch=<batchId>`; bootstrap-builds when no epoch exists.
    * Idempotent under replay: a batch whose epoch is already committed is
    * skipped. Pure batch logic — unit-testable without a stream. */
  def foldBatch(edges: DataFrame, root: String, batchId: Long,
                dedup: Boolean = true,
                hubLimit: Long = Adjacency.DefaultHubLimit,
                keepEpochs: Int = 2): Unit = {
    require(keepEpochs >= 2,
      "keepEpochs < 2 leaves no fallback epoch under a torn head")
    val spark = edges.sparkSession
    val pm = params(dedup, hubLimit)
    if (IndexStore.graphIndexMeta(spark, epochDir(root, batchId), pm).isDefined)
      return // replayed after a committed save — the fold already applied
    // an empty micro-batch (rate-limited sources emit them) folds to the
    // standing adjacency unchanged — skip the content-free O(|V|) epoch
    // rewrite instead of committing it; epoch ids need not be dense
    Deltas.withMaterialized(edges) { delta =>
      if (!delta.isEmpty) {
        val next = loadCurrent(spark, root, dedup, hubLimit) match {
          case Some((_, standing)) =>
            try Checkpoints.sweepingOnFailure(spark.sparkContext)(
              Adjacency.foldEdges(standing, delta, dedup = dedup,
                hubLimit = hubLimit))
            finally standing.release() // the fold owns its frames
          case None =>
            Checkpoints.sweepingOnFailure(spark.sparkContext)(
              Adjacency.build(delta, dedup = dedup, hubLimit = hubLimit))
        }
        try IndexStore.saveGraphIndex(spark, next, epochDir(root, batchId),
          s"batch:$batchId", pm)
        finally next.release()
        // retention AFTER the commit: keep the newest keepEpochs valid
        // epochs, drop every older epoch directory (valid or torn)
        EpochDirs.prune(spark, root,
          epochs(spark, root, dedup, hubLimit).take(keepEpochs).toSet)
      }
    }
  }

  /** Start the epoch-roll stream: `edges` (a streaming DataFrame of
    * `(src, dst)` rows) → per-batch [[foldBatch]] → committed epoch
    * directories under `root`.
    *
    * @param trigger AvailableNow (default) drains what exists and stops —
    *                the replay/backfill shape; a continuously-ingesting
    *                deployment passes `Trigger.ProcessingTime(...)` sized
    *                like an ingest epoch */
  def start(edges: DataFrame, root: String, checkpointDir: String,
            dedup: Boolean = true,
            hubLimit: Long = Adjacency.DefaultHubLimit,
            keepEpochs: Int = 2,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, root, batchId, dedup, hubLimit, keepEpochs)
      }
      .start()
}
