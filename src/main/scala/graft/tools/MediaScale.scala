package graft.tools

import org.apache.spark.sql.functions._

/** m07's lifecycle at ~20× the 180-image fixture — the [[Q82Scale]] /
  * [[SigScale]] discipline for the MEDIA tier: the claim "a minor pays
  * |Δ| decode + aHash + an O(|Δ|) stage write, and the near-dup probe
  * pays |batch| hashes banded against the merged view — never a standing
  * re-decode" is MEASURED instead of asserted at the fixture size.
  * `nImages` deterministic 64×64 block-pattern PNGs (the m07 formula
  * class; ids ≡ 3 (mod 7) reuse id−3's blocks with one inverted, so
  * planted near-dup pairs keep crossing batch boundaries) stage
  * file-backed as `nBatches` contiguous chunks. Each batch first probes
  * its NEW pairs off the pre-fold ≤2-tier view
  * ([[graft.streaming.MediaTieredStream.Tiered.newPairsFor]] — the
  * serving-path cost), then folds
  * ([[graft.streaming.MediaTieredStream.foldBatch]] — the |Δ| decode
  * minor), each timed separately: if either grows with the standing
  * corpus instead of |Δ|, per-batch seconds climb across the roll.
  * After the roll, ids ≡ 4 (mod 9) (~11%) are tombstoned and
  * [[graft.streaming.MediaTieredStream.compactMajor]] is timed — the
  * maintenance-window cost at this scale on its own row.
  *
  * Usage: runMain graft.tools.MediaScale [nImages] [nBatches] [majorEvery]
  */
object MediaScale {

  /** splitmix block color — the deterministic content formula. */
  private def blockColor(seed: Long, bx: Int, by: Int): Int = {
    var x = seed * 1103515245L + by * 7919L + bx * 104729L + 12345L
    x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL; x ^= (x >>> 33)
    (x & 0xffffff).toInt
  }

  private def png(i: Long): Array[Byte] = {
    val seed = if (i % 7 == 3 && i >= 3) i - 3 else i
    val flip = if (i % 7 == 3) ((i * 31) % 64).toInt else -1
    val im = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val b = (y / 8) * 8 + (x / 8)
        var c = blockColor(seed, x / 8, y / 8)
        if (b == flip) c ^= 0xffffff
        im.setRGB(x, y, c)
        x += 1
      }
      y += 1
    }
    graft.operators.ImageCodec.encodePng(im)
  }

  def main(args: Array[String]): Unit = {
    val nImages = args.lift(0).map(_.toLong).getOrElse(3600L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val majorEvery = args.lift(2).map(_.toInt).getOrElse(5)
    val maxHamming = 6
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val spin0 = HostCpu.spinScore()
    val work = java.nio.file.Files.createTempDirectory("media_scale").toString
    try {
      val perBatch = nImages / nBatches
      (0 until nBatches).foreach { i =>
        val hi = if (i == nBatches - 1) nImages else (i + 1) * perBatch
        spark.range(i * perBatch, hi).map(j => (j, png(j)))
          .toDF("media_id", "media")
          .write.mode("overwrite").parquet(s"$work/chunk=$i")
      }

      val root = s"$work/tiered"
      val rows = (0 until nBatches).map { i =>
        val chunk = spark.read.parquet(s"$work/chunk=$i")
        val deltaRows = chunk.count()
        val s0 = HostCpu.snapshot()
        // probe phase: NEW pairs off the PRE-fold standing tiers (batch 0
        // has no view — its within-batch pairs use the flat kernel); the
        // batch pays ONE decode+hash pass, the standing side none
        val t0 = System.nanoTime()
        val batchHashes = graft.operators.Multimodal.imageHashes(chunk)
        val pre = graft.streaming.MediaTieredStream.loadCurrent(spark, root)
        val nPairs = pre match {
          case Some(view) => view.newPairsFor(batchHashes, maxHamming).count()
          case None => graft.operators.Multimodal
            .imageNearDupPairsFromHashes(batchHashes, maxHamming).count()
        }
        val probeSec = (System.nanoTime() - t0) / 1e9
        // fold phase: the |Δ| decode minor (or the majorEvery-th major)
        val t1 = System.nanoTime()
        val outcome = graft.streaming.MediaTieredStream.foldBatch(
          chunk, root, i.toLong, majorEvery)
        val foldSec = (System.nanoTime() - t1) / 1e9
        val steal = HostCpu.stealPct(s0, HostCpu.snapshot())
        System.err.println(f"[mediascale] batch $i |Δ|=$deltaRows " +
          f"pairs=$nPairs probe=$probeSec%.2f fold=$foldSec%.2f " +
          f"steal=$steal%.1f%% $outcome")
        (i, deltaRows, nPairs, probeSec, foldSec, steal, outcome.toString)
      }

      // converged sanity: every image decoded and hashed exactly once
      val view = graft.streaming.MediaTieredStream.loadCurrent(spark, root)
        .getOrElse(sys.error("scale roll committed nothing"))
      val hashCnt = view.hashes.count()
      require(hashCnt == nImages, s"folded $hashCnt hashes, staged $nImages")
      // every planted pair (i ≡ 3 mod 7 → i−3) found exactly once across
      // the per-batch probes — cross-batch ones included
      val totalPairs = rows.map(_._3).sum
      val expectPairs = (0L until nImages).count(i => i % 7 == 3 && i >= 3)
      require(totalPairs == expectPairs,
        s"accumulated $totalPairs pairs, fixture plants $expectPairs")

      // maintenance window at scale: ~11% tombstoned, physical compaction
      val dead = spark.range(nImages).filter(col("id") % 9 === 4)
        .select(col("id").as("media_id"))
      val deadCnt = dead.count()
      val t2 = System.nanoTime()
      graft.streaming.MediaTieredStream.compactMajor(spark, root, dead,
          "media_id", threshold = 0.05)
        .getOrElse(sys.error("compaction must fire at ~11% dead"))
      val compactSec = (System.nanoTime() - t2) / 1e9
      val clean = graft.streaming.MediaTieredStream.loadCurrent(spark, root)
        .getOrElse(sys.error("no view after compaction"))
      val survivors = clean.hashes.count()
      require(survivors == nImages - deadCnt,
        s"compaction kept $survivors, want ${nImages - deadCnt}")

      val spin1 = HostCpu.spinScore()
      val perBatch2 = rows.map { case (i, d, p, ps, fs, st, oc) =>
        f"""{"batch":$i,"delta_rows":$d,"pairs":$p,"probe_sec":$ps%.2f,""" +
          f""""fold_sec":$fs%.2f,"steal_pct":${math.round(st * 10) / 10.0}%s,""" +
          s""""outcome":${graft.io.Jsons.str(oc)}}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"media_scale","n_images":$nImages,""" +
        s""""n_batches":$nBatches,"major_every":$majorEvery,""" +
        s""""hash_rows":$hashCnt,"total_pairs":$totalPairs,""" +
        s""""expected_pairs":$expectPairs,"dead":$deadCnt,""" +
        f""""compact_sec":$compactSec%.2f,"survivors":$survivors,""" +
        s""""spin_before":$spin0,"spin_after":$spin1,""" +
        s""""per_batch":$perBatch2}""")
    } finally graft.io.TempRoots.delete(work)
    spark.stop()
  }
}
