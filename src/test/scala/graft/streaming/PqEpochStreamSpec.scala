package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.operators.{IndexStore, Similarity}

/** [[PqEpochStream]] — streaming maintenance of the durable PQ index.
  * Contracts: streamed per-batch folds converge to the batch-twin
  * build+append chain (v24's certified identity), replayed batches skip,
  * a torn head falls back and re-folds, retention prunes behind the kept
  * window, parameter-mismatched readers see no chain, and the armed
  * drift audit stamps its count into the epoch meta. */
class PqEpochStreamSpec extends SparkSpec {

  private val DIM = 8
  private val M = 2
  private val K = 4
  private val ITERS = 2
  private val TRAIN = 50

  private def vecs(ids: Range): DataFrame = {
    import sqlImplicits._
    ids.map { i =>
      val v = Array.fill(DIM)(0.01f * ((i * 7) % 5))
      v(i % 4) = 1.0f; v(4 + i % 4) = 1.0f
      (i.toLong, v)
    }.toDF("vec_id", "emb")
  }

  private def codes(idx: Similarity.PqIndex): Set[(Long, Int, Int)] =
    idx.encoded.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet

  test("streamed micro-batches fold into epochs converging to the " +
       "batch-twin build+append chain; retention; torn head; replay skip") {
    val c0 = vecs(1 to 40)
    val c1 = vecs(101 to 120)
    val c2 = vecs(201 to 210)
    val landing = Files.createTempDirectory("pqe_in").toString
    val root = Files.createTempDirectory("pqe_idx").toString
    val ckpt = Files.createTempDirectory("pqe_ck").toString
    Seq(c0, c1, c2).zipWithIndex.foreach { case (c, i) =>
      c.coalesce(1).write.parquet(s"$landing/chunk$i")
    }
    val stream = spark.readStream.schema(c0.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$landing/chunk*")
    val q = PqEpochStream.start(stream, "vec_id", "emb", root, ckpt,
      dim = DIM, m = M, k = K, iters = ITERS, trainSample = TRAIN)
    q.awaitTermination(180000L)

    // retention: 3 batches committed, keepEpochs=2 → epochs 2 and 1 stand
    assert(PqEpochStream.epochs(spark, root, DIM, M, K, ITERS, TRAIN)
      === Seq(2L, 1L))
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(root, "epoch=0")))

    val (id, current) = PqEpochStream.loadCurrent(spark, root,
      DIM, M, K, ITERS, TRAIN).getOrElse(fail("no epoch"))
    assert(id === 2L)
    val twin = Similarity.pqAppend(
      Similarity.pqAppend(
        Similarity.pqBuild(c0, "vec_id", "emb", DIM, M, K, ITERS, TRAIN),
        c1, "vec_id", "emb"),
      c2, "vec_id", "emb")
    try {
      assert(current.codebooks.flatten.flatten.toSeq ===
        twin.codebooks.flatten.flatten.toSeq,
        "codebooks train once at bootstrap and never drift in-stream")
      assert(codes(current) === codes(twin),
        "streamed codes ≡ the build+append chain")
    } finally { current.release(); twin.release() }

    // parameter-mismatched readers see NO chain
    assert(PqEpochStream.epochs(spark, root, DIM, M, K + 1, ITERS, TRAIN)
      .isEmpty)

    // torn head: a directory without committed meta is invisible and a
    // re-fold overwrites it
    val torn = EpochDirs.dir(root, 3L)
    fs.mkdirs(new Path(torn, "encoded"))
    assert(PqEpochStream.epochs(spark, root, DIM, M, K, ITERS, TRAIN)
      === Seq(2L, 1L), "torn epoch invisible")
    assert(PqEpochStream.foldBatch(vecs(301 to 305), "vec_id", "emb", root,
      batchId = 3L, dim = DIM, m = M, k = K, iters = ITERS,
      trainSample = TRAIN) === BatchOutcome.Appended(None))
    assert(PqEpochStream.epochs(spark, root, DIM, M, K, ITERS, TRAIN)
      === Seq(3L, 2L))

    // replay after commit: skip, state unchanged
    assert(PqEpochStream.foldBatch(vecs(301 to 305), "vec_id", "emb", root,
      batchId = 3L, dim = DIM, m = M, k = K, iters = ITERS,
      trainSample = TRAIN) === BatchOutcome.Skipped)

    // empty batches commit nothing
    assert(PqEpochStream.foldBatch(vecs(1 to 0), "vec_id", "emb", root,
      batchId = 4L, dim = DIM, m = M, k = K, iters = ITERS,
      trainSample = TRAIN) === BatchOutcome.EmptyBatch)
    assert(PqEpochStream.epochs(spark, root, DIM, M, K, ITERS, TRAIN)
      === Seq(3L, 2L))
  }

  test("armed drift audit stamps the drifted-code count into the epoch " +
       "meta; unarmed folds pay no audit and stamp nothing") {
    import sqlImplicits._
    val root = Files.createTempDirectory("pqe2_idx").toString
    assert(PqEpochStream.foldBatch(vecs(1 to 40), "vec_id", "emb", root,
      batchId = 0L, dim = DIM, m = M, k = K, iters = ITERS,
      trainSample = TRAIN) === BatchOutcome.Bootstrapped)

    // planted drift: every batch vector on ONE corner
    val planted = (100 until 112).map { i =>
      val v = Array.fill(DIM)(0.0f); v(0) = 1.0f; v(4) = 1.0f
      (i.toLong, v)
    }.toDF("vec_id", "emb")
    val out = PqEpochStream.foldBatch(planted, "vec_id", "emb", root,
      batchId = 1L, dim = DIM, m = M, k = K, iters = ITERS,
      trainSample = TRAIN, auditDrift = true)
    val d = out match {
      case BatchOutcome.Appended(Some(n)) => n
      case other => fail(s"expected audited append, got $other")
    }
    assert(d >= 2L, "single-mode batch drifts its target code per subspace")
    val meta = IndexStore.pqIndexMeta(spark, EpochDirs.dir(root, 1L))
      .getOrElse(fail("epoch 1 missing"))
    assert(meta.get("drifted_codes").contains(d.toString),
      "the verdict rides the commit, where maintenance tooling reads it")
    assert(meta.get("fold").contains("append"))

    // unarmed fold: no drifted_codes key
    assert(PqEpochStream.foldBatch(vecs(200 to 205), "vec_id", "emb", root,
      batchId = 2L, dim = DIM, m = M, k = K, iters = ITERS,
      trainSample = TRAIN) === BatchOutcome.Appended(None))
    val meta2 = IndexStore.pqIndexMeta(spark, EpochDirs.dir(root, 2L))
      .getOrElse(fail("epoch 2 missing"))
    assert(!meta2.contains("drifted_codes"))
  }
}
