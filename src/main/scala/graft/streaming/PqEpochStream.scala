package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{IndexStore, Similarity}

/** Streaming maintenance of the durable PQ index — the quantized-tier
  * twin of [[VectorEpochStream]], completing the epoch-roll family
  * (graph, IVF, lexical, raw-line, and now PQ): each arriving
  * micro-batch of embeddings is ENCODED UNDER THE STANDING CODEBOOKS
  * ([[Similarity.pqAppend]] — one map-only argmax pass per subspace,
  * no training, work linear in |Δ|) and the folded form commits as a new
  * `epoch=<batchId>` directory via [[IndexStore.savePqIndex]]. v24
  * (append ≡ full rebuild under an unchanged training sample) is the
  * batch twin certifying the fold.
  *
  * Drift: when `auditDrift` is set, each append first runs
  * [[Similarity.pqDriftAudit]] against the standing epoch and STAMPS the
  * drifted-(subspace, code) count into the committed epoch's meta
  * (`drifted_codes`) — the retrain signal surfaced where operators and
  * maintenance tooling read commit state. Unlike the IVF roll, the PQ
  * roll deliberately does NOT retrain in-stream: a PQ epoch stores int8
  * CODES ONLY — the compression is the point — so the standing state
  * cannot re-derive the training vectors a retrain needs. Retraining is
  * the maintenance window's job: a full [[Similarity.pqBuild]] over the
  * source corpus (which the lake retains; v25/pqDriftAudit is the
  * trigger measurement), committed as the next epoch.
  *
  * Durability/crash matrix is [[GraphEpochStream]]'s, verbatim: epoch
  * directories (never overwrite-in-place), the meta file as per-epoch
  * commit marker, torn head → fall back + re-fold, replay after commit →
  * skip (exactly-once), retention keeps the `keepEpochs` newest valid
  * epochs as the reader grace window. Epochs are parameter-keyed by the
  * REQUESTED model shape (`roll_m/k/iters/train_sample/dim`), so readers
  * under a different model see no chain. Single writer.
  *
  * Scale shape: per-batch cost is the |Δ| encode pass (plus the audit's
  * two aggregates when armed) plus the O(|corpus codes|) epoch rewrite —
  * codes are m small ints per row, so the durability price is the
  * compressed footprint, not the raw vectors'. */
object PqEpochStream {

  import BatchOutcome._

  private def params(dim: Int, m: Int, k: Int, iters: Int,
                     trainSample: Int): Map[String, String] =
    Map("roll_dim" -> dim.toString, "roll_m" -> m.toString,
      "roll_k" -> k.toString, "roll_iters" -> iters.toString,
      "roll_train_sample" -> trainSample.toString)

  /** Ids of committed (valid-marker, matching-parameter) epochs, NEWEST
    * first. Listing + meta peeks only — no Spark jobs. */
  def epochs(spark: SparkSession, root: String, dim: Int,
             m: Int = 4, k: Int = 8, iters: Int = 4,
             trainSample: Int = 10000): Seq[Long] =
    EpochDirs.rawIds(spark, root)
      .filter(id => IndexStore.pqIndexMeta(spark, EpochDirs.dir(root, id),
        params(dim, m, k, iters, trainSample)).isDefined)
      .sorted(Ordering[Long].reverse)

  /** Load the newest committed epoch: `(epochId, index)`, `None` when no
    * epoch has committed yet. The codebook collect is m·k tiny rows; the
    * encoded frame stays lazy until probed. */
  def loadCurrent(spark: SparkSession, root: String, dim: Int,
                  m: Int = 4, k: Int = 8, iters: Int = 4,
                  trainSample: Int = 10000)
      : Option[(Long, Similarity.PqIndex)] =
    epochs(spark, root, dim, m, k, iters, trainSample).view
      .flatMap(id => IndexStore.loadPqIndex(spark, EpochDirs.dir(root, id),
        expectedParams = params(dim, m, k, iters, trainSample)).map(id -> _))
      .headOption

  /** Fold ONE batch of embeddings (`idCol` numeric, `vecCol`
    * array&lt;float&gt; — the [[Similarity.pqBuild]] contract) into the
    * newest epoch and commit the result as `epoch=<batchId>`;
    * bootstrap-trains when no epoch exists. Idempotent under replay: a
    * batch whose epoch is already committed is skipped. Pure batch
    * logic — unit-testable without a stream. */
  def foldBatch(batch: DataFrame, idCol: String, vecCol: String,
                root: String, batchId: Long, dim: Int,
                m: Int = 4, k: Int = 8, iters: Int = 4,
                trainSample: Int = 10000,
                auditDrift: Boolean = false,
                keepEpochs: Int = 2): BatchOutcome = {
    require(keepEpochs >= 2,
      "keepEpochs < 2 leaves no fallback epoch under a torn head")
    val spark = batch.sparkSession
    val pm = params(dim, m, k, iters, trainSample)
    val dir = EpochDirs.dir(root, batchId)
    if (IndexStore.pqIndexMeta(spark, dir, pm).isDefined)
      return Skipped // replayed after a committed save — already applied
    val outcome = Deltas.withMaterialized(batch) { delta =>
      if (delta.isEmpty) EmptyBatch // commit nothing; ids stay sparse
      else {
        def commit(idx: Similarity.PqIndex, extra: Map[String, String]): Unit =
          try IndexStore.savePqIndex(spark, idx, dir, s"batch:$batchId",
            pm ++ extra)
          finally idx.release()
        loadCurrent(spark, root, dim, m, k, iters, trainSample) match {
          case None =>
            commit(Similarity.pqBuild(delta, idCol, vecCol, dim, m, k, iters,
              trainSample), Map("fold" -> "bootstrap"))
            Bootstrapped
          case Some((_, standing)) =>
            // ONE |Δ| encode pass serves BOTH the audit and the append (the
            // pqEncode/pqAppendCoded split — an audited fold used to pay the
            // m-subspace argmax twice; r12 review catch). This fold owns the
            // coded frame; the appended index (persist=false) owns only the
            // standing chain, which the commit frees.
            val coded = Similarity.pqEncode(standing, delta, idCol, vecCol)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              val drifted =
                if (auditDrift)
                  Some(Similarity.pqDriftAuditCoded(standing, coded)
                    .filter(col("drifted")).count())
                else None
              commit(Similarity.pqAppendCoded(standing, coded, persist = false),
                Map("fold" -> "append") ++
                  drifted.map(d => "drifted_codes" -> d.toString))
              Appended(drifted)
            } finally { coded.unpersist(); () }
        }
      }
    }
    if (outcome != EmptyBatch)
      EpochDirs.prune(spark, root,
        epochs(spark, root, dim, m, k, iters, trainSample).take(keepEpochs).toSet)
    outcome
  }

  /** Start the epoch-roll stream: `vectors` (a streaming DataFrame with
    * `idCol`/`vecCol`) → per-batch [[foldBatch]] → committed epoch
    * directories under `root`. AvailableNow (default) drains and stops —
    * the replay/backfill shape; continuous ingest passes
    * `Trigger.ProcessingTime(...)` sized like an ingest epoch. */
  def start(vectors: DataFrame, idCol: String, vecCol: String,
            root: String, checkpointDir: String, dim: Int,
            m: Int = 4, k: Int = 8, iters: Int = 4,
            trainSample: Int = 10000, auditDrift: Boolean = false,
            keepEpochs: Int = 2,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, idCol, vecCol, root, batchId, dim, m, k, iters,
          trainSample, auditDrift, keepEpochs)
        ()
      }
      .start()
}
