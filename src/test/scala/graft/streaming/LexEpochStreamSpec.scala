package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.operators.{IndexStore, Postings}

/** [[LexEpochStream]] — streaming maintenance of the durable postings
  * index. Contracts under test: streamed per-batch folds (including a
  * mid-stream document REPLACEMENT) converge to the full rebuild of the
  * edit-applied corpus, replayed batches skip (exactly-once), a torn head
  * falls back to the previous epoch, retention prunes behind the kept
  * window, and shape-mismatched readers see no chain. */
class LexEpochStreamSpec extends SparkSpec {

  private def tfOf(i: Postings.Index): Seq[(Long, String, Long)] =
    i.tf.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
  private def dlOf(i: Postings.Index): Seq[(Long, Long)] =
    i.dl.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("streamed doc micro-batches (with a replacement) fold into epochs " +
       "that converge to the full rebuild; replay skips; torn head re-folds") {
    import sqlImplicits._
    val c0 = Seq((1L, "a b c"), (2L, "b c d"), (3L, "d d e"))
    val c1 = Seq((4L, "e f"), (2L, "b b REPLACED")) // doc 2 edited
    val c2 = Seq((5L, "f g a"), (4L, "e f f AGAIN")) // doc 4 edited
    val finalCorpus = Seq((1L, "a b c"), (2L, "b b REPLACED"),
      (3L, "d d e"), (4L, "e f f AGAIN"), (5L, "f g a"))
    val landing = Files.createTempDirectory("lep_in").toString
    val root = Files.createTempDirectory("lep_idx").toString
    val ckpt = Files.createTempDirectory("lep_ck").toString
    val schema = c0.toDF("doc_id", "text").schema
    Seq(c0, c1, c2).zipWithIndex.foreach { case (c, i) =>
      c.toDF("doc_id", "text").coalesce(1).write.parquet(s"$landing/chunk$i")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$landing/chunk*")
    val q = LexEpochStream.start(stream, root, ckpt)
    q.awaitTermination(180000L)

    // retention: 3 batches, keepEpochs=2 → epochs 2 and 1 stand, 0 pruned
    assert(LexEpochStream.epochs(spark, root) === Seq(2L, 1L))
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(root, "epoch=0")))

    val (id, current) = LexEpochStream.loadCurrent(spark, root)
      .getOrElse(fail("no epoch"))
    assert(id === 2L)
    val rebuilt = Postings.build(finalCorpus.toDF("doc_id", "text"))
    try {
      assert((current.nDocs, current.sumDl) === (rebuilt.nDocs, rebuilt.sumDl))
      assert(tfOf(current) === tfOf(rebuilt))
      assert(dlOf(current) === dlOf(rebuilt))
    } finally { current.release(); rebuilt.release() }

    // replay after commit: epoch already valid → skipped, content untouched
    val marker = new Path(root, "epoch=2/_graft_index.json")
    val before = fs.getFileStatus(marker).getModificationTime
    LexEpochStream.foldBatch(c2.toDF("doc_id", "text"), root, batchId = 2L)
    assert(fs.getFileStatus(marker).getModificationTime === before,
      "replayed batch re-folded")

    // torn head: kill epoch 2's marker → readers fall back to epoch 1,
    // the replayed batch re-folds and re-commits
    fs.delete(marker, false)
    assert(LexEpochStream.loadCurrent(spark, root).map(_._1) === Some(1L))
    LexEpochStream.foldBatch(c2.toDF("doc_id", "text"), root, batchId = 2L)
    val (id2, cur2) = LexEpochStream.loadCurrent(spark, root)
      .getOrElse(fail("no epoch after re-fold"))
    val rebuilt2 = Postings.build(finalCorpus.toDF("doc_id", "text"))
    try {
      assert(id2 === 2L)
      assert(tfOf(cur2) === tfOf(rebuilt2))
      assert((cur2.nDocs, cur2.sumDl) === (rebuilt2.nDocs, rebuilt2.sumDl))
    } finally { cur2.release(); rebuilt2.release() }
  }

  test("bootstrap: first batch builds; empty batches commit nothing; " +
       "shape-mismatched readers see no chain") {
    import sqlImplicits._
    val root = Files.createTempDirectory("lep_boot").toString
    val d = Seq((1L, "h i"), (2L, "i j")).toDF("doc_id", "text")
    LexEpochStream.foldBatch(d.limit(0), root, batchId = 7L)
    assert(LexEpochStream.epochs(spark, root).isEmpty)
    LexEpochStream.foldBatch(d, root, batchId = 0L)
    assert(LexEpochStream.epochs(spark, root) === Seq(0L))
    // a reader expecting a different tokenizer shape must see nothing
    assert(IndexStore.postingsIndexMeta(spark, s"$root/epoch=0",
      Map("tokenizer" -> "bpe")).isEmpty)
    val (_, idx) = LexEpochStream.loadCurrent(spark, root)
      .getOrElse(fail("bootstrap epoch missing"))
    try assert((idx.nDocs, idx.sumDl) === (2L, 4L)) finally idx.release()
  }
}
