package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.operators.Similarity

/** [[VectorEpochStream]] — streaming maintenance of the durable IVF
  * index. Contracts under test: streamed per-batch folds converge to the
  * batch-twin build+append chain (v12's certified identity, batch by
  * batch), replayed batches skip (exactly-once), a torn head falls back
  * and re-folds, retention prunes behind the kept window, and the drift
  * audit retrains over standing ∪ batch when armed. */
class VectorEpochStreamSpec extends SparkSpec {

  private val N_CELLS = 4
  private val TRAIN = 50
  private val ITERS = 2

  private def vecs(ids: Range): DataFrame = {
    import sqlImplicits._
    ids.map(i => (i.toLong,
      Array((i % 7).toFloat + 1f, (i % 3).toFloat + 0.5f))).toDF("vec_id", "emb")
  }

  private def assignedPairs(idx: Similarity.IvfIndex): Set[(Long, Long)] = {
    import org.apache.spark.sql.functions.col
    idx.assigned.select(col("nid").cast("long"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** (qid, rank, nid) triples — the probe's deterministic answer. */
  private def probed(idx: Similarity.IvfIndex, queries: DataFrame): Set[(Long, Int, Long)] =
    Similarity.ivfProbe(idx, queries, "vec_id", "emb", k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("streamed embedding micro-batches fold into epochs that converge to the batch-twin append chain") {
    val c0 = vecs(1 to 60)
    val c1 = vecs(101 to 140)
    val c2 = vecs(201 to 220)
    val landing = Files.createTempDirectory("vep_in").toString
    val root = Files.createTempDirectory("vep_idx").toString
    val ckpt = Files.createTempDirectory("vep_ck").toString
    Seq(c0, c1, c2).zipWithIndex.foreach { case (c, i) =>
      c.coalesce(1).write.parquet(s"$landing/chunk$i")
    }
    val stream = spark.readStream.schema(c0.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$landing/chunk*")
    val q = VectorEpochStream.start(stream, "vec_id", "emb", root, ckpt,
      nCells = N_CELLS, trainSample = TRAIN, iters = ITERS)
    q.awaitTermination(180000L)

    // retention: 3 batches committed, keepEpochs=2 → epochs 2 and 1 stand
    assert(VectorEpochStream.epochs(spark, root, N_CELLS, TRAIN, ITERS)
      === Seq(2L, 1L))
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(root, "epoch=0")))

    val (id, current) = VectorEpochStream.loadCurrent(spark, root,
      N_CELLS, TRAIN, ITERS).getOrElse(fail("no epoch"))
    assert(id === 2L)
    // batch twin: bootstrap-train on c0, append c1 then c2 — the
    // centroids, the per-row assignment, and probe answers must all match
    val twin0 = Similarity.ivfBuild(c0, "vec_id", "emb", N_CELLS, TRAIN, ITERS)
    val twin = Similarity.ivfAppend(
      Similarity.ivfAppend(twin0, c1, "vec_id", "emb"), c2, "vec_id", "emb")
    try {
      assert(current.centroids.map(_.toSeq).toSeq ===
        twin.centroids.map(_.toSeq).toSeq)
      assert(assignedPairs(current) === assignedPairs(twin))
      val queries = vecs(1 to 5).union(vecs(201 to 203))
      assert(probed(current, queries) === probed(twin, queries))
    } finally { current.release(); twin.release() }

    // replay after commit: the batch's epoch is already valid → Skipped,
    // content untouched (exactly-once)
    val marker = new Path(root, "epoch=2/_graft_index.json")
    val before = fs.getFileStatus(marker).getModificationTime
    assert(VectorEpochStream.foldBatch(c2, "vec_id", "emb", root, 2L,
      N_CELLS, TRAIN, ITERS) === BatchOutcome.Skipped)
    assert(fs.getFileStatus(marker).getModificationTime === before,
      "replayed batch re-folded")

    // torn head: kill epoch 2's commit marker → readers fall back to
    // epoch 1, and the replayed batch re-folds and re-commits
    fs.delete(marker, false)
    assert(VectorEpochStream.loadCurrent(spark, root, N_CELLS, TRAIN, ITERS)
      .map(_._1) === Some(1L))
    val refolded = VectorEpochStream.foldBatch(c2, "vec_id", "emb", root, 2L,
      N_CELLS, TRAIN, ITERS)
    assert(refolded === BatchOutcome.Appended(None))
    val (id2, cur2) = VectorEpochStream.loadCurrent(spark, root,
      N_CELLS, TRAIN, ITERS).getOrElse(fail("no epoch"))
    val twinB = Similarity.ivfAppend(
      Similarity.ivfAppend(
        Similarity.ivfBuild(c0, "vec_id", "emb", N_CELLS, TRAIN, ITERS),
        c1, "vec_id", "emb"), c2, "vec_id", "emb")
    try {
      assert(id2 === 2L)
      assert(assignedPairs(cur2) === assignedPairs(twinB))
    } finally { cur2.release(); twinB.release() }
  }

  test("bootstrap outcome; parameter-mismatched epochs are invisible") {
    val root = Files.createTempDirectory("vep_boot").toString
    assert(VectorEpochStream.foldBatch(vecs(1 to 30), "vec_id", "emb", root,
      0L, N_CELLS, TRAIN, ITERS) === BatchOutcome.Bootstrapped)
    assert(VectorEpochStream.epochs(spark, root, N_CELLS, TRAIN, ITERS)
      === Seq(0L))
    // a reader under a different requested model shape must see nothing —
    // even when the bootstrap trained fewer ACTUAL cells than requested
    assert(VectorEpochStream.epochs(spark, root, 8, TRAIN, ITERS).isEmpty)
    assert(VectorEpochStream.loadCurrent(spark, root, N_CELLS, TRAIN + 1,
      ITERS).isEmpty)
    val (_, idx) = VectorEpochStream.loadCurrent(spark, root, N_CELLS,
      TRAIN, ITERS).getOrElse(fail("bootstrap epoch missing"))
    try assert(idx.assigned.count() === 30L) finally idx.release()
  }

  test("an empty micro-batch commits nothing — no bootstrap crash, no content-free epoch rewrite") {
    val root = Files.createTempDirectory("vep_empty").toString
    val none = vecs(1 until 1) // zero rows, right schema
    // empty FIRST batch: must not crash ivfBuild's non-empty requirement
    assert(VectorEpochStream.foldBatch(none, "vec_id", "emb", root, 0L,
      N_CELLS, TRAIN, ITERS) === BatchOutcome.EmptyBatch)
    assert(VectorEpochStream.epochs(spark, root, N_CELLS, TRAIN, ITERS).isEmpty)
    // real bootstrap under a later id, then another empty batch: the
    // standing epoch must stay the newest (no rewrite committed)
    VectorEpochStream.foldBatch(vecs(1 to 30), "vec_id", "emb", root, 1L,
      N_CELLS, TRAIN, ITERS)
    assert(VectorEpochStream.foldBatch(none, "vec_id", "emb", root, 2L,
      N_CELLS, TRAIN, ITERS) === BatchOutcome.EmptyBatch)
    assert(VectorEpochStream.epochs(spark, root, N_CELLS, TRAIN, ITERS)
      === Seq(1L))
  }

  test("armed drift audit retrains over standing ∪ batch; default threshold appends without paying the audit") {
    import sqlImplicits._
    // standing: a tight cluster on the x axis; delta: far mass on y — the
    // delta lands concentrated in one (or zero) standing cells, so at
    // least one cell's batch share deviates >50% relative from its index
    // share and the v19 verdict fires
    val base = (1 to 40).map(i =>
      (i.toLong, Array(10f + (i % 5) * 0.01f, 0f))).toDF("vec_id", "emb")
    val far = (101 to 140).map(i =>
      (i.toLong, Array(0f, 100f + (i % 3) * 0.01f))).toDF("vec_id", "emb")

    val root = Files.createTempDirectory("vep_drift").toString
    assert(VectorEpochStream.foldBatch(base, "vec_id", "emb", root, 0L,
      nCells = 2, trainSample = TRAIN, iters = ITERS)
      === BatchOutcome.Bootstrapped)
    val (_, boot) = VectorEpochStream.loadCurrent(spark, root, 2, TRAIN,
      ITERS).getOrElse(fail("no bootstrap"))
    val bootCentroids = boot.centroids.map(_.toSeq).toSeq
    boot.release()

    val out = VectorEpochStream.foldBatch(far, "vec_id", "emb", root, 1L,
      nCells = 2, trainSample = TRAIN, iters = ITERS, maxDriftedCells = 0)
    out match {
      case BatchOutcome.Retrained(d) => assert(d >= 1L)
      case other => fail(s"expected Retrained, got $other")
    }
    val (_, cur) = VectorEpochStream.loadCurrent(spark, root, 2, TRAIN,
      ITERS).getOrElse(fail("no retrained epoch"))
    try {
      assert(cur.assigned.count() === 80L)
      // retraining saw the far cluster — the model must have moved
      assert(cur.centroids.map(_.toSeq).toSeq !== bootCentroids)
    } finally cur.release()

    // same delta under the default threshold: plain append, audit skipped
    val root2 = Files.createTempDirectory("vep_app").toString
    VectorEpochStream.foldBatch(base, "vec_id", "emb", root2, 0L,
      nCells = 2, trainSample = TRAIN, iters = ITERS)
    assert(VectorEpochStream.foldBatch(far, "vec_id", "emb", root2, 1L,
      nCells = 2, trainSample = TRAIN, iters = ITERS)
      === BatchOutcome.Appended(None))
  }
}
