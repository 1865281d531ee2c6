package graft.tools

import org.apache.spark.sql.functions._

/** d14's lifecycle at ~10× the sf0.1 corpus — the [[Q82Scale]] discipline
  * for the signature tier: the claim "a minor pays |Δ| tokenize + an
  * O(|Δ|) stage write, and the cross-tier probe pays |batch| signatures +
  * touched buckets — never O(standing)" is MEASURED instead of asserted.
  * `nDocs` deterministic synthetic documents (40 unique tokens each; ids
  * ≡ 2 (mod 5) near-dup id−2, so planted pairs keep crossing batch
  * boundaries) stage file-backed as `nBatches` contiguous chunks. Each
  * batch first probes its NEW pairs off the pre-fold ≤2-tier view
  * ([[graft.streaming.SignatureTieredStream.Tiered.newPairsFor]] — the
  * serving-path cost), then folds ([[graft.streaming
  * .SignatureTieredStream.foldBatch]]), each timed separately: if either
  * grows with the standing corpus instead of |Δ|, per-batch seconds climb
  * across the roll. Majors re-aggregate merged buckets by design — their
  * cost lands on their own row via the returned outcome.
  *
  * Usage: runMain graft.tools.SigScale [nDocs] [nBatches] [majorEvery]
  */
object SigScale {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(50000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val majorEvery = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val spin0 = HostCpu.spinScore()
    val work = java.nio.file.Files.createTempDirectory("sig_scale").toString
    // the try spans the WHOLE roll: a mid-roll throw must not strand the
    // staged chunks + tiered root in /tmp (ADVICE r15 — the same
    // TempRoots discipline the d14/t40 queries follow)
    try {

    // 40 unique tokens per doc; ids ≡ 2 (mod 5) reuse id−2's tokens with
    // the last one changed (3-shingle Jaccard ≈ 0.95 — a planted pair)
    val base = when(col("id") % 5 === 2 && col("id") >= 2, col("id") - 2)
      .otherwise(col("id"))
    val toks = (0 until 39).map(t => concat(lit("w"), base, lit(s"_$t")))
    val last = when(col("id") % 5 === 2, concat(lit("alt"), col("id")))
      .otherwise(concat(lit("w"), base, lit("_39")))
    val gen = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", (toks :+ last): _*).as("text"))
    val perBatch = nDocs / nBatches
    (0 until nBatches).foreach { i =>
      // the last chunk takes the division remainder — every doc is staged
      val hi = if (i == nBatches - 1) nDocs else (i + 1) * perBatch
      gen.filter(col("doc_id") >= i * perBatch && col("doc_id") < hi)
        .write.mode("overwrite").parquet(s"$work/chunk=$i")
    }

    val root = s"$work/tiered"
    val rows = (0 until nBatches).map { i =>
      val chunk = spark.read.parquet(s"$work/chunk=$i")
      val deltaRows = chunk.count()
      val s0 = HostCpu.snapshot()
      // probe phase: new pairs off the PRE-fold standing tiers (batch 0
      // has no view — its within-batch pairs use the flat kernel)
      val t0 = System.nanoTime()
      val pre = graft.streaming.SignatureTieredStream.loadCurrent(spark, root)
      val mp = pre match {
        case Some(view) => view.newPairsFor(chunk, "doc_id", "text")
        case None => graft.operators.Dedup.minhashExactPairsManaged(
          chunk, "doc_id", "text")
      }
      val nPairs = try mp.pairs.count()
      finally { mp.release(); pre.foreach(_.release()) }
      val probeSec = (System.nanoTime() - t0) / 1e9
      // fold phase: the O(|Δ|) minor (or the majorEvery-th major)
      val t1 = System.nanoTime()
      val outcome = graft.streaming.SignatureTieredStream.foldBatch(
        chunk, "doc_id", "text", root, i.toLong, majorEvery)
      val foldSec = (System.nanoTime() - t1) / 1e9
      val steal = HostCpu.stealPct(s0, HostCpu.snapshot())
      System.err.println(f"[sigscale] batch $i |Δ|=$deltaRows " +
        f"pairs=$nPairs probe=$probeSec%.2f fold=$foldSec%.2f " +
        f"steal=$steal%.1f%% $outcome")
      (i, deltaRows, nPairs, probeSec, foldSec, steal, outcome.toString)
    }

    // converged sanity: the final view must carry every shingle-bearing
    // doc (all of them — every doc has 38 shingles by construction)
    val view = graft.streaming.SignatureTieredStream.loadCurrent(spark, root)
      .getOrElse(sys.error("scale roll committed nothing"))
    val sigCnt = try view.sigs.count() finally view.release()
    val totalPairs = rows.map(_._3).sum
    // every id ≡ 2 (mod 5) except id 2 < 2?  id 2 pairs with 0 — all in
    val expectPairs = (0L until nDocs).count(i => i % 5 == 2 && i >= 2)
    val spin1 = HostCpu.spinScore()
    val perBatch2 = rows.map { case (i, d, p, ps, fs, st, oc) =>
      f"""{"batch":$i,"delta_rows":$d,"pairs":$p,"probe_sec":$ps%.2f,""" +
        f""""fold_sec":$fs%.2f,"steal_pct":${math.round(st * 10) / 10.0}%s,""" +
        s""""outcome":${graft.io.Jsons.str(oc)}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"sig_scale","n_docs":$nDocs,""" +
      s""""n_batches":$nBatches,"major_every":$majorEvery,""" +
      s""""sig_rows":$sigCnt,"total_pairs":$totalPairs,""" +
      s""""expected_pairs":$expectPairs,""" +
      s""""spin_before":$spin0,"spin_after":$spin1,""" +
      s""""per_batch":$perBatch2}""")
    require(sigCnt == nDocs, s"folded $sigCnt sigs, generated $nDocs")
    require(totalPairs == expectPairs,
      s"accumulated $totalPairs pairs, fixture plants $expectPairs")
    } finally graft.io.TempRoots.delete(work)
    spark.stop()
  }
}
