package graft.tools

import org.apache.spark.sql.functions._

/** q82's lifecycle at ~10× the sf0.1 corpus — the r14-verdict scale
  * probe (#6): the claim "per-batch minor cost is O(|Δ|), not
  * O(standing)" was asserted from plan shape (the incremental join's
  * bucket-pruned standing scan); here it is MEASURED. `nLines`
  * deterministic synthetic order lines (4 lines/order, line ids
  * consecutive within an order) stage file-backed as `nBatches`
  * equal-|Δ| chunks split by `line_id % nBatches` — so EVERY order's
  * lines span batches, the cross-batch reconstruction shape q82
  * certifies. Each chunk folds through the full CopurchaseStream tiered
  * machinery (Δ⋈standing ∪ Δ⋈Δ incremental join, O(|Δ|) L0 commits,
  * majors every `majorEvery`), timed individually: if minors grow with
  * the standing corpus instead of |Δ|, per-batch seconds climb across
  * the roll; flat minor seconds = the 100-TB claim holds. Majors union
  * the merged view by design — their cost is reported on its own row.
  *
  * Usage: runMain graft.tools.Q82Scale [nLines] [nBatches] [majorEvery]
  */
object Q82Scale {
  def main(args: Array[String]): Unit = {
    val nLines = args.lift(0).map(_.toLong).getOrElse(900000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val majorEvery = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val spin0 = HostCpu.spinScore()
    val work = java.nio.file.Files.createTempDirectory("q82_scale").toString
    // the try spans the WHOLE roll: a mid-roll throw must not strand the
    // ~10× staged corpus + tiered root in /tmp (ADVICE r15 — the same
    // TempRoots discipline the q81/q82 queries follow)
    try {

    // 4-line orders; parts hashed so within-order parts are distinct in
    // expectation (collisions are fine — distinct() handles them)
    val gen = spark.range(nLines).select(
      col("id").as("line_id"),
      (col("id") / 4).cast("long").as("l_orderkey"),
      pmod(xxhash64(col("id")), lit(nLines / 3)).as("l_partkey"))
    (0 until nBatches).foreach { i =>
      gen.filter(pmod(col("line_id"), lit(nBatches.toLong)) === i.toLong)
        .select("l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(s"$work/chunk=$i")
    }

    val linesDir = s"$work/lines"
    val indexRoot = s"$work/tiered"
    val rows = (0 until nBatches).map { i =>
      val chunk = spark.read.parquet(s"$work/chunk=$i")
      val deltaRows = chunk.count()
      val s0 = HostCpu.snapshot()
      val t0 = System.nanoTime()
      val outcome = graft.streaming.CopurchaseStream.foldBatchTiered(chunk,
        linesDir, indexRoot, batchId = i.toLong, majorEvery = majorEvery)
      val sec = (System.nanoTime() - t0) / 1e9
      val steal = HostCpu.stealPct(s0, HostCpu.snapshot())
      System.err.println(f"[q82scale] batch $i |Δ|=$deltaRows " +
        f"sec=$sec%.2f steal=$steal%.1f%% $outcome")
      (i, deltaRows, sec, steal, outcome.toString)
    }

    // converged view sanity: the merged edge set must be non-empty and
    // the standing lines must equal the staged corpus
    val view = graft.streaming.GraphTieredStream.loadCurrent(spark, indexRoot)
      .getOrElse(sys.error("scale roll committed nothing"))
    val edgeCnt = try view.mergedEdges.count() finally view.release()
    val spin1 = HostCpu.spinScore()
    val perBatch = rows.map { case (i, d, s, st, oc) =>
      f"""{"batch":$i,"delta_rows":$d,"sec":$s%.2f,""" +
        f""""steal_pct":${math.round(st * 10) / 10.0}%s,""" +
        s""""outcome":${graft.io.Jsons.str(oc)}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"q82_scale","n_lines":$nLines,""" +
      s""""n_batches":$nBatches,"major_every":$majorEvery,""" +
      s""""merged_edges":$edgeCnt,"per_batch":$perBatch,""" +
      f""""total_sec":${rows.map(_._3).sum}%.2f,""" +
      s""""cpu_spin_before":$spin0,"cpu_spin_after":$spin1}""")
    } finally graft.io.TempRoots.delete(work)
    spark.stop()
  }
}
