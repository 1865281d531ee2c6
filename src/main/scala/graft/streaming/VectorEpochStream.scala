package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{IndexStore, Similarity}

/** Streaming maintenance of the durable IVF index — the vector twin of
  * [[GraphEpochStream]], closing the ANN family's ingest loop: each
  * arriving micro-batch of embeddings FOLDS into the standing index and
  * the folded form is committed as a new `epoch=<batchId>` directory via
  * [[IndexStore.saveIvfIndex]]. v12 (append ≡ fresh assignment under the
  * same centroids) is the batch twin that certifies the fold; v19's drift
  * audit is wired in as the RETRAIN TRIGGER its contract promises:
  *
  *  - the default fold is [[Similarity.ivfAppend]] — one broadcast-map
  *    assignment pass over the batch, no training, work linear in |Δ|;
  *  - when `maxDriftedCells` is finite, each batch first runs
  *    [[Similarity.driftAudit]] against the standing index (one pass over
  *    the batch + one aggregate over the persisted assignment); a batch
  *    that drifts more than the threshold RETRAINS over standing ∪ batch
  *    instead of appending — the maintenance-window rebuild, scheduled by
  *    measurement instead of by calendar.
  *
  * Durability/crash matrix is [[GraphEpochStream]]'s, verbatim: epoch
  * directories (never overwrite-in-place — the fold's input is the
  * standing index itself), the meta file as per-epoch commit marker, torn
  * head → fall back + re-fold, replay after commit → skip (exactly-once),
  * retention keeps the `keepEpochs` newest valid epochs. Readers hold
  * LAZY frames (the IndexStore zero-job contract), so `keepEpochs` is the
  * reader grace window — size it to ceil(longest reader session / batch
  * interval) + 1. Single writer; concurrent writers need an external
  * lock.
  *
  * Epochs are parameter-keyed: meta records the REQUESTED model shape
  * (`roll_n_cells`, `roll_train_sample`, `roll_iters` — constant for the
  * chain even when a small bootstrap trains fewer actual cells), and
  * readers with different parameters see no epochs at all rather than a
  * chain trained under someone else's model.
  *
  * Scale shape: per-batch cost is the assignment pass over |Δ| (plus the
  * drift audit's aggregate when armed) plus an O(|corpus|) parquet
  * rewrite for the epoch commit — the durability price, same as the graph
  * roll's O(|V|) rewrite. Size micro-batches like ingest epochs
  * (`Trigger.ProcessingTime` in minutes), not per-second ticks. Each
  * epoch IS a compact save, so append-chain lineage never outlives one
  * batch. */
object VectorEpochStream {

  import BatchOutcome._

  private def params(nCells: Int, trainSample: Int, iters: Int): Map[String, String] =
    Map("roll_n_cells" -> nCells.toString,
      "roll_train_sample" -> trainSample.toString,
      "roll_iters" -> iters.toString)

  /** Ids of committed (valid-marker, matching-parameter) epochs, NEWEST
    * first. Listing only — no Spark jobs. */
  def epochs(spark: SparkSession, root: String,
             nCells: Int, trainSample: Int = 10000, iters: Int = 8): Seq[Long] =
    EpochDirs.rawIds(spark, root)
      .filter(id => IndexStore.ivfIndexMeta(spark, EpochDirs.dir(root, id),
        params(nCells, trainSample, iters)).isDefined)
      .sorted(Ordering[Long].reverse)

  /** Load the newest committed epoch: `(epochId, index)`, `None` when no
    * epoch has committed yet. Zero Spark jobs until the assignment is
    * probed. */
  def loadCurrent(spark: SparkSession, root: String,
                  nCells: Int, trainSample: Int = 10000, iters: Int = 8)
      : Option[(Long, Similarity.IvfIndex)] =
    epochs(spark, root, nCells, trainSample, iters).view
      .flatMap(id => IndexStore.loadIvfIndex(spark, EpochDirs.dir(root, id),
        expectedParams = params(nCells, trainSample, iters)).map(id -> _))
      .headOption

  /** Fold ONE batch of embeddings (`idCol` numeric, `vecCol`
    * array&lt;float&gt; — the [[Similarity.ivfBuild]] contract) into the
    * newest epoch and commit the result as `epoch=<batchId>`;
    * bootstrap-trains when no epoch exists. Idempotent under replay: a
    * batch whose epoch is already committed is skipped. Pure batch logic —
    * unit-testable without a stream.
    *
    * @param maxDriftedCells retrain (instead of append) when more than
    *   this many cells drift vs the standing index; the default never
    *   retrains (and never pays the audit's jobs) */
  def foldBatch(batch: DataFrame, idCol: String, vecCol: String,
                root: String, batchId: Long,
                nCells: Int = 16, trainSample: Int = 10000, iters: Int = 8,
                maxDriftedCells: Int = Int.MaxValue,
                keepEpochs: Int = 2): BatchOutcome = {
    require(keepEpochs >= 2,
      "keepEpochs < 2 leaves no fallback epoch under a torn head")
    val spark = batch.sparkSession
    val pm = params(nCells, trainSample, iters)
    val dir = EpochDirs.dir(root, batchId)
    if (IndexStore.ivfIndexMeta(spark, dir, pm).isDefined)
      return Skipped // replayed after a committed save — already applied
    // an empty micro-batch (rate-limited sources emit them) must not
    // crash the bootstrap (ivfBuild requires a non-empty corpus) or pay
    // a content-free O(|corpus|) epoch rewrite — commit nothing; epoch
    // ids need not be dense, and a replay of the empty batch re-skips
    // here identically
    val outcome = Deltas.withMaterialized(batch) { delta =>
      if (delta.isEmpty) EmptyBatch
      else {
        def commit(idx: Similarity.IvfIndex, note: String): Unit =
          try IndexStore.saveIvfIndex(spark, idx, dir,
            s"batch:$batchId $note", pm)
          finally idx.release()
        loadCurrent(spark, root, nCells, trainSample, iters) match {
          case None =>
            commit(Similarity.ivfBuild(delta, idCol, vecCol, nCells,
              trainSample, iters), "bootstrap")
            Bootstrapped
          case Some((_, standing)) =>
            // the audit can only fire when the threshold is under the cell
            // count — skip its jobs entirely otherwise
            val drifted =
              if (maxDriftedCells < standing.nCells)
                Some(Similarity.driftAudit(standing, delta, idCol, vecCol)
                  .filter(col("drifted")).count())
              else None
            drifted match {
              case Some(d) if d > maxDriftedCells =>
                // v19's trigger fired: retrain over standing ∪ batch. The
                // union plan reads the standing assignment during the save,
                // so standing is released only after the commit.
                val corpus = standing.assigned.select(col("nid"), col("nv"))
                  .unionByName(delta.select(col(idCol).as("nid"),
                    col(vecCol).cast("array<float>").as("nv")))
                try commit(Similarity.ivfBuild(corpus, "nid", "nv", nCells,
                  trainSample, iters), s"retrain drift=$d")
                finally standing.release()
                Retrained(d)
              case _ =>
                // append: the folded index owns standing (ivfAppend chains
                // the release), so the commit frees both
                commit(Similarity.ivfAppend(standing, delta, idCol, vecCol),
                  drifted.fold("append")(d => s"append drift=$d"))
                Appended(drifted)
            }
        }
      }
    }
    if (outcome != EmptyBatch)
      EpochDirs.prune(spark, root,
        epochs(spark, root, nCells, trainSample, iters).take(keepEpochs).toSet)
    outcome
  }

  /** Start the epoch-roll stream: `vectors` (a streaming DataFrame with
    * `idCol`/`vecCol`) → per-batch [[foldBatch]] → committed epoch
    * directories under `root`.
    *
    * @param trigger AvailableNow (default) drains what exists and stops —
    *                the replay/backfill shape; a continuously-ingesting
    *                deployment passes `Trigger.ProcessingTime(...)` sized
    *                like an ingest epoch */
  def start(vectors: DataFrame, idCol: String, vecCol: String,
            root: String, checkpointDir: String,
            nCells: Int = 16, trainSample: Int = 10000, iters: Int = 8,
            maxDriftedCells: Int = Int.MaxValue,
            keepEpochs: Int = 2,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, idCol, vecCol, root, batchId, nCells, trainSample,
          iters, maxDriftedCells, keepEpochs)
        ()
      }
      .start()
}
