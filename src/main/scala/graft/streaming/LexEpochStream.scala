package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Checkpoints, IndexStore, Postings}

/** Streaming maintenance of the durable LEXICAL (BM25 postings) index —
  * the stream side of [[Postings.foldDocs]], completing the epoch-roll
  * family: [[GraphEpochStream]] rolls the graph index, [[VectorEpochStream]]
  * the IVF index, this rolls the retrieval index behind t37/v23. Each
  * arriving micro-batch of documents folds into the standing postings
  * (per-batch cost: |Δ| tokenization + compact-frame pass-throughs —
  * never a corpus re-tokenization, t38's certified identity) and commits
  * as its own `epoch=<batchId>` directory via
  * [[IndexStore.savePostingsIndex]].
  *
  * Replacement semantics ride foldDocs: a re-ingested doc_id replaces its
  * postings in the next epoch — the document-EDIT story an append-only
  * roll can't express.
  *
  * Crash matrix, identical to the sibling rolls (shared [[EpochDirs]]
  * layout, meta file as per-epoch commit marker):
  *  - torn save → no marker → readers and the replayed batch fall back to
  *    the previous epoch and re-fold over the torn directory;
  *  - crash after save, before the stream checkpoint commit → the replay
  *    finds its epoch valid and SKIPS (exactly-once);
  *  - retention keeps `keepEpochs ≥ 2` newest valid epochs, pruned only
  *    after a successful commit, so a torn head always has a fallback.
  *
  * Reader contract: [[loadCurrent]] hands out LAZY frames over the
  * epoch's parquet (zero jobs); a reader's hold must not outlive
  * `keepEpochs − 1` subsequent commits — size `keepEpochs` to
  * ceil(longest reader session / batch interval) + 1. Single-writer
  * ownership, as with every IndexStore artifact. */
object LexEpochStream {

  private def epochDir(root: String, id: Long): String = EpochDirs.dir(root, id)

  /** The postings build has no tunable geometry, but epochs are still
    * SHAPE-KEYED (tokenizer contract) so a future non-whitespace index
    * never chains onto these directories — the parameter-invisibility
    * contract of the sibling rolls. */
  private val Params: Map[String, String] = Map("tokenizer" -> "ws")

  /** Ids of committed (valid-marker, matching-shape) epochs, NEWEST
    * first. Listing only — no Spark jobs. */
  def epochs(spark: SparkSession, root: String): Seq[Long] =
    EpochDirs.rawIds(spark, root)
      .filter(id => IndexStore.postingsIndexMeta(spark,
        epochDir(root, id), Params).isDefined)
      .sorted(Ordering[Long].reverse)

  /** Load the newest committed epoch: `(epochId, index)`, `None` when no
    * epoch has committed yet. Zero Spark jobs. */
  def loadCurrent(spark: SparkSession, root: String)
      : Option[(Long, Postings.Index)] =
    epochs(spark, root).view
      .flatMap(id => IndexStore.loadPostingsIndex(spark, epochDir(root, id),
        expectedParams = Params).map(id -> _))
      .headOption

  /** Fold ONE batch of documents (`doc_id`, `text` columns) into the
    * newest epoch and commit the result as `epoch=<batchId>`;
    * bootstrap-builds when no epoch exists. Idempotent under replay.
    * Pure batch logic — unit-testable without a stream. */
  def foldBatch(docsBatch: DataFrame, root: String, batchId: Long,
                keepEpochs: Int = 2): Unit = {
    require(keepEpochs >= 2,
      "keepEpochs < 2 leaves no fallback epoch under a torn head")
    val spark = docsBatch.sparkSession
    if (IndexStore.postingsIndexMeta(spark, epochDir(root, batchId), Params)
        .isDefined)
      return // replayed after a committed save — the fold already applied
    Deltas.withMaterialized(docsBatch) { delta =>
      if (!delta.isEmpty) { // skip the content-free epoch rewrite
        val next = loadCurrent(spark, root) match {
          case Some((_, standing)) =>
            try Checkpoints.sweepingOnFailure(spark.sparkContext)(
              Postings.foldDocs(standing, delta))
            finally standing.release() // the fold owns its frames
          case None =>
            Checkpoints.sweepingOnFailure(spark.sparkContext)(
              Postings.build(delta))
        }
        try IndexStore.savePostingsIndex(spark, next, epochDir(root, batchId),
          s"batch:$batchId", Params)
        finally next.release()
        EpochDirs.prune(spark, root, epochs(spark, root).take(keepEpochs).toSet)
      }
    }
  }

  /** Start the epoch-roll stream: `docs` (a streaming DataFrame of
    * `(doc_id, text)` rows) → per-batch [[foldBatch]] → committed epoch
    * directories under `root`.
    *
    * @param trigger AvailableNow (default) drains what exists and stops;
    *                a continuously-ingesting deployment passes
    *                `Trigger.ProcessingTime(...)` sized like an ingest
    *                epoch (the epoch rewrite is the durability price) */
  def start(docs: DataFrame, root: String, checkpointDir: String,
            keepEpochs: Int = 2,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, root, batchId, keepEpochs)
      }
      .start()
}
