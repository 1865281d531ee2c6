package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The QUERY side of the lexical epoch roll: answer a stream of search
  * queries against the NEWEST committed postings epoch, batch by batch —
  * while [[LexEpochStream]] (a separate single-writer stream) keeps
  * rolling the index underneath. Together they close the retrieval
  * family's serve loop: ingest folds epochs, serving probes them, and a
  * mid-stream roll changes answers at the next micro-batch boundary —
  * never mid-batch (each batch pins ONE epoch).
  *
  * Safety under concurrent rolls: [[LexEpochStream.loadCurrent]] only
  * sees epochs with a committed marker, and retention's `keepEpochs`
  * grace window (see the roll's reader contract) guarantees the pinned
  * epoch's files outlive the batch. The per-batch epoch load is
  * zero-job (IndexStore meta peek + lazy parquet); the probe pays only
  * query-term postings work (t37's plan shape).
  *
  * Replay idempotence: [[start]] writes each batch's answers to its own
  * `batch=<id>` directory with overwrite, so a replayed batch rewrites
  * its directory instead of appending duplicates. Answers carry the
  * epoch that produced them — a replay AFTER a roll may legitimately
  * re-answer under the newer epoch, and the recorded `epoch_id` makes
  * that visible instead of silent. */
object LexServeStream {

  /** Answer ONE batch of `(qid LONG, qtext STRING)` queries against the
    * newest committed epoch under `indexRoot`: per-query BM25 top-k,
    * t37's exact arithmetic. Returns `(epochId, answers)` where answers
    * `(qid, rank, doc_id, score_scaled, n_terms)` is EAGERLY
    * locally-checkpointed — blocks computed executor-side before the
    * epoch's frames are released, so the result outlives the epoch (and
    * retention pruning its directory) without ever round-tripping the
    * driver. This is the serving hot path: the earlier collect+
    * parallelize shape shipped k×|batch| rows through the driver every
    * micro-batch (r11 verdict). The caller owns the checkpoint blocks —
    * release with [[graft.operators.Checkpoints.release]] once written
    * (the streaming sink below does). Pure batch logic — unit-testable
    * without a stream. */
  def answerBatch(queries: DataFrame, indexRoot: String, k: Int = 5)
      : (Long, DataFrame) = {
    val spark = queries.sparkSession
    val (epochId, idx) = LexEpochStream.loadCurrent(spark, indexRoot)
      .getOrElse(throw new IllegalStateException(
        s"no committed postings epoch under $indexRoot — bootstrap the " +
          "roll (LexEpochStream) before serving"))
    try {
      val qterms = queries
        .select(col("qid"),
          explode(array_distinct(split(col("qtext"), " "))).as("tok"))
        .filter(col("tok") =!= "")
      val agg = graft.queries.TextQueries
        .bm25ScoresOverIndex(idx, qterms, excludeSelf = false)
      val out = graft.plans.TopK.perKey(agg, Seq("qid"),
          Seq("score_scaled" -> false, "doc_id" -> true), k)
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid")
            .orderBy(col("score_scaled").desc, col("doc_id"))))
        .select(col("qid"), col("rank"), col("doc_id"),
          col("score_scaled"), col("n_terms"))
      (epochId, out.localCheckpoint()) // eager — computed before release
    } finally idx.release()
  }

  /** Start the serving stream: `queries` (a streaming DataFrame of
    * `(qid, qtext)` rows) → per-batch [[answerBatch]] → one
    * `batch=<batchId>` parquet directory each under `outDir`, rows
    * stamped with the answering epoch. */
  def start(queries: DataFrame, indexRoot: String, outDir: String,
            checkpointDir: String, k: Int = 5,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (epochId, answers) = answerBatch(batch, indexRoot, k)
        try
          answers
            .withColumn("batch_id", lit(batchId))
            .withColumn("epoch_id", lit(epochId))
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        finally graft.operators.Checkpoints.release(answers)
      }
      .start()
}
