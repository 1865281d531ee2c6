package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Adjacency, Checkpoints, IndexStore}

/** [[GraphEpochStream]] — streaming maintenance of the durable graph
  * index. Contracts under test: streamed per-batch folds converge to the
  * full rebuild (q79's identity, batch by batch), replayed batches skip
  * (exactly-once), a torn head falls back to the previous epoch, and
  * retention prunes behind the kept window. */
class GraphEpochStreamSpec extends SparkSpec {

  private def edgesOf(h: Adjacency.Hybrid): Seq[(Long, Long)] =
    h.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("streamed edge micro-batches fold into epoch directories that converge to the full rebuild") {
    import sqlImplicits._
    val c0 = (1L to 20L).map(s => (s, s + 1)).toDF("src", "dst")
    val c1 = ((5L to 8L).map(s => (s, 99L)) ++ Seq((50L, 1L), (50L, 2L))).toDF("src", "dst")
    val c2 = Seq((1L, 500L), (50L, 3L)).toDF("src", "dst")
    val chunks = Seq(c0, c1, c2)
    val landing = Files.createTempDirectory("gep_in").toString
    val root = Files.createTempDirectory("gep_idx").toString
    val ckpt = Files.createTempDirectory("gep_ck").toString
    chunks.zipWithIndex.foreach { case (c, i) =>
      c.coalesce(1).write.parquet(s"$landing/chunk$i")
    }
    val stream = spark.readStream.schema(c0.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$landing/chunk*")
    val q = GraphEpochStream.start(stream, root, ckpt)
    q.awaitTermination(180000L)

    // retention: 3 batches committed, keepEpochs=2 → epochs 2 and 1 stand,
    // epoch 0's directory is gone
    assert(GraphEpochStream.epochs(spark, root, dedup = true,
      Adjacency.DefaultHubLimit) === Seq(2L, 1L))
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(root, "epoch=0")))

    val (id, current) = GraphEpochStream.loadCurrent(spark, root,
      dedup = true, Adjacency.DefaultHubLimit).getOrElse(fail("no epoch"))
    assert(id === 2L)
    val rebuilt = Checkpoints.sweepingOnFailure(spark.sparkContext)(
      Adjacency.build(c0.unionByName(c1).unionByName(c2), dedup = true))
    try {
      assert(edgesOf(current) === edgesOf(rebuilt))
      assert((current.srcCount, current.hubCount) ===
        (rebuilt.srcCount, rebuilt.hubCount))
    } finally { current.release(); rebuilt.release() }

    // replay after commit: the batch's epoch is already valid → skipped,
    // content untouched (exactly-once)
    val before = fs.getFileStatus(new Path(root, "epoch=2/" +
      "_graft_index.json")).getModificationTime
    GraphEpochStream.foldBatch(c2, root, batchId = 2L)
    assert(fs.getFileStatus(new Path(root, "epoch=2/_graft_index.json"))
      .getModificationTime === before, "replayed batch re-folded")

    // torn head: kill epoch 2's commit marker → readers fall back to
    // epoch 1, and the replayed batch re-folds and re-commits
    fs.delete(new Path(root, "epoch=2/_graft_index.json"), false)
    assert(GraphEpochStream.loadCurrent(spark, root, dedup = true,
      Adjacency.DefaultHubLimit).map(_._1) === Some(1L))
    GraphEpochStream.foldBatch(c2, root, batchId = 2L)
    val (id2, cur2) = GraphEpochStream.loadCurrent(spark, root,
      dedup = true, Adjacency.DefaultHubLimit).getOrElse(fail("no epoch"))
    val rebuilt2 = Checkpoints.sweepingOnFailure(spark.sparkContext)(
      Adjacency.build(c0.unionByName(c1).unionByName(c2), dedup = true))
    try {
      assert(id2 === 2L)
      assert(edgesOf(cur2) === edgesOf(rebuilt2))
    } finally { cur2.release(); rebuilt2.release() }
  }

  test("bootstrap: the first batch builds the index; parameter-mismatched epochs are invisible") {
    import sqlImplicits._
    val root = Files.createTempDirectory("gep_boot").toString
    val e = (1L to 5L).map(s => (s, s + 1)).toDF("src", "dst")
    // an empty batch before any epoch exists commits nothing
    GraphEpochStream.foldBatch(e.limit(0), root, batchId = 7L)
    assert(GraphEpochStream.epochs(spark, root, dedup = true,
      Adjacency.DefaultHubLimit).isEmpty)
    GraphEpochStream.foldBatch(e, root, batchId = 0L)
    assert(GraphEpochStream.epochs(spark, root, dedup = true,
      Adjacency.DefaultHubLimit) === Seq(0L))
    // a reader under different build parameters must not see this epoch
    assert(GraphEpochStream.epochs(spark, root, dedup = true, 64L).isEmpty)
    assert(GraphEpochStream.loadCurrent(spark, root, dedup = false,
      Adjacency.DefaultHubLimit).isEmpty)
    val (_, h) = GraphEpochStream.loadCurrent(spark, root, dedup = true,
      Adjacency.DefaultHubLimit).getOrElse(fail("bootstrap epoch missing"))
    try assert(edgesOf(h).size === 5) finally h.release()
  }
}
