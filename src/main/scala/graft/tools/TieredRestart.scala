package graft.tools

import org.apache.spark.sql.functions._

import graft.streaming.{BatchOutcome, VectorTieredStream}

/** Crash-restart at scale for a TIERED index family — the ScaleRestart
  * story (kill, restart, converge) repeated for the vector L0/L1 roll
  * (r13 stretch #8). Deterministic synthetic embeddings at `nVecs`
  * (default 20k ≈ sf0.1×10), staged as `nChunks` id-keyed batches, then:
  *
  *  1. **cold roll** — fold every chunk into a fresh root (bootstrap +
  *     minors + majors), timed per batch;
  *  2. **crash mid-roll** — a second root folds only the first `crashAt`
  *     chunks, then a TORN L0 directory is planted for chunk `crashAt`
  *     (the kill-during-commit shape: files on disk, no valid marker);
  *  3. **restart** — replay ALL chunks against the crashed root: the
  *     committed prefix must skip as listing-only no-ops, the torn epoch
  *     must re-encode deterministically and overwrite, the tail folds
  *     fresh — `restart_sec` is what a resumed driver actually pays;
  *  4. **convergence** — the restarted view's (nid, cell) assignment is
  *     asserted EQUAL to the cold roll's AND to the flat
  *     ivfBuild(chunk 0) + ivfAppend(rest) chain (fold ≡ rebuild at the
  *     durability layer, the q81/v27 identity re-proven after a crash).
  *
  * Usage: sbt "runMain graft.tools.TieredRestart [nVecs] [nChunks] [majorEvery] [crashAt]"
  */
object TieredRestart {
  def main(args: Array[String]): Unit = {
    val nVecs = args.lift(0).map(_.toLong).getOrElse(20000L)
    val nChunks = args.lift(1).map(_.toInt).getOrElse(10)
    val majorEvery = args.lift(2).map(_.toInt).getOrElse(4)
    val crashAt = args.lift(3).map(_.toInt).getOrElse(6)
    require(crashAt > 0 && crashAt < nChunks)
    val dim = 64
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val spin0 = HostCpu.spinScore()
    val work = java.nio.file.Files.createTempDirectory("tiered_restart").toString

    // deterministic synthetic embeddings, staged file-backed per chunk so
    // every roll folds identical inputs
    val gen = spark.range(nVecs).select(
      col("id").as("vec_id"),
      array((0 until dim).map(d =>
        (pmod(xxhash64(col("id"), lit(d)), lit(1000L)).cast("double") / 500.0 - 1.0)
          .cast("float")): _*).as("emb"))
    (0 until nChunks).foreach { i =>
      gen.filter(pmod(col("vec_id"), lit(nChunks.toLong)) === i.toLong)
        .write.mode("overwrite").parquet(s"$work/chunk=$i")
    }
    def chunk(i: Int) = spark.read.parquet(s"$work/chunk=$i")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def fold(root: String, i: Int): BatchOutcome =
      VectorTieredStream.foldBatch(chunk(i), "vec_id", "emb", root,
        i.toLong, majorEvery = majorEvery)

    // 1. cold roll
    val rootA = s"$work/rollA"
    val coldSec = timed((0 until nChunks).foreach(fold(rootA, _)))

    // 2. crash mid-roll: committed prefix + a torn L0 for the next chunk
    val rootB = s"$work/rollB"
    val prefixSec = timed((0 until crashAt).foreach(fold(rootB, _)))
    val torn = new java.io.File(
      s"$rootB/l0/epoch=${graft.streaming.TierIds.dataEpoch(crashAt.toLong)}")
    require(torn.mkdirs())
    java.nio.file.Files.write(torn.toPath.resolve("data.partial"),
      Array[Byte](1, 2, 3))

    // 3. restart: replay everything; committed epochs must skip
    var skipped = 0
    val restartSec = timed((0 until nChunks).foreach { i =>
      if (fold(rootB, i) == BatchOutcome.Skipped) skipped += 1
    })

    // 4. convergence: restarted ≡ cold ≡ flat build+append
    def assignment(root: String): (Long, Seq[(Long, Int)]) = {
      val v = VectorTieredStream.loadCurrent(spark, root)
        .getOrElse(sys.error(s"no tiered view under $root"))
      try {
        val rows = v.index.assigned.select("nid", "cell").collect()
          .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
        (rows.size.toLong, rows)
      } finally v.release()
    }
    val (rowsA, asgA) = assignment(rootA)
    val (rowsB, asgB) = assignment(rootB)
    require(rowsA == nVecs, s"cold roll lost rows: $rowsA != $nVecs")
    require(asgA == asgB, "restarted roll diverged from the cold roll")
    val flat = (1 until nChunks).foldLeft(
      graft.operators.Similarity.ivfBuild(chunk(0), "vec_id", "emb"))(
      (idx, i) => graft.operators.Similarity.ivfAppend(idx, chunk(i),
        "vec_id", "emb"))
    val asgF = try flat.assigned.select("nid", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    finally flat.release()
    require(asgA == asgF, "tiered roll diverged from the flat chain")

    val spin1 = HostCpu.spinScore()
    println(f"""{"metric":"tiered_restart","family":"vector",""" +
      f""""n_vecs":$nVecs,"n_chunks":$nChunks,"major_every":$majorEvery,""" +
      f""""crash_at":$crashAt,"cold_sec":$coldSec%.1f,""" +
      f""""crash_prefix_sec":$prefixSec%.1f,"restart_sec":$restartSec%.1f,""" +
      f""""replay_skipped":$skipped,"rows":$rowsA,""" +
      f""""equal_cold":true,"equal_flat":true,""" +
      f""""spin_before":$spin0,"spin_after":$spin1}""")
    spark.stop()
  }
}
