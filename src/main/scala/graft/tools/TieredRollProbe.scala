package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flat-vs-tiered epoch-commit cost, measured per batch — the number the
  * L0/L1 tier exists to improve. The flat rolls pay an O(|corpus|)
  * durable rewrite EVERY batch; the tiered rolls pay O(|Δ|) minors plus
  * an O(|corpus|) major every `majorEvery` batches. This probe stages a
  * table as N chunks and folds the SAME chunks through both designs,
  * timing each fold and du-ing each committed epoch dir right after its
  * commit (pruning would hide the early ones), then prints ONE JSON line
  * per family:
  *
  *   {"flat_sec":[...], "tiered_sec":[...], "tiered_kind":["bootstrap",
  *    "minor",...], "flat_sec_med":S, "minor_sec_med":S, "major_sec_med":S,
  *    "flat_bytes_med":B, "minor_bytes_med":B, "major_bytes_med":B,
  *    "amortized_flat_sec":S, "amortized_tiered_sec":S}
  *
  * The claim this probe certifies on numbers instead of scaladoc: minor
  * commit bytes ≈ |Δ|/|corpus| of a flat commit, and amortized per-batch
  * tiered cost < flat cost once |corpus| ≫ |Δ| — at sf0.1 the corpus is
  * only N×|Δ|, so the gap here is a lower bound on the 100 TB gap.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.TieredRollProbe [nChunks] [majorEvery]"
  */
object TieredRollProbe {

  private def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nChunks = if (args.length > 0) args(0).toInt else 12
    val majorEvery = if (args.length > 1) args(1).toInt else 4
    val spark = graft.GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("tiered_probe")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else xs.sorted.apply(xs.size / 2)
    def medL(xs: Seq[Long]): Long =
      if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)

    /** Stage `df` as nChunks parquet chunks, returned as per-batch frames
      * (each read back from its own file so both designs fold identical
      * inputs with identical partitioning). Every chunk is read once
      * before either design is timed — the flat side folds first, and
      * without the pre-warm it would pay all the cold first-touch I/O
      * while the tiered side re-read the same files warm. */
    def stage(df: DataFrame, name: String): Seq[DataFrame] = {
      val landing = s"$tmp/${name}_landing"
      df.repartition(nChunks).write.parquet(landing)
      val fs = new Path(landing).getFileSystem(spark.sessionState.newHadoopConf())
      val chunks = fs.listStatus(new Path(landing)).toSeq
        .map(_.getPath.toString).filter(_.matches(".*part-.*parquet$")).sorted
        .map(f => spark.read.schema(df.schema).parquet(f))
      chunks.foreach(_.count()): Unit // page-cache pre-warm, untimed
      chunks
    }

    /** Fold every chunk through `fold` (commit dir is `dirOf(i)`),
      * returning (sec, bytes, kind) per batch. */
    def run(chunks: Seq[DataFrame], fold: (DataFrame, Long) => String,
            dirOf: (String, Long) => String): Seq[(Double, Long, String)] =
      chunks.zipWithIndex.map { case (c, i) =>
        var kind = ""
        val sec = timed { kind = fold(c, i.toLong) }
        val dir = dirOf(kind, i.toLong)
        (sec, dirBytes(spark, dir), kind)
      }

    def familyJson(name: String, flat: Seq[(Double, Long, String)],
                   tiered: Seq[(Double, Long, String)]): String = {
      val minors = tiered.filter(_._3 == "minor")
      val majors = tiered.filter(_._3 == "major")
      f""""$name":{"flat_sec":[${flat.map(t => f"${t._1}%.2f").mkString(",")}],""" +
        f""""tiered_sec":[${tiered.map(t => f"${t._1}%.2f").mkString(",")}],""" +
        s""""tiered_kind":[${tiered.map(t => "\"" + t._3 + "\"").mkString(",")}],""" +
        f""""flat_sec_med":${med(flat.map(_._1))}%.2f,""" +
        f""""minor_sec_med":${med(minors.map(_._1))}%.2f,""" +
        f""""major_sec_med":${med(majors.map(_._1))}%.2f,""" +
        s""""flat_bytes_med":${medL(flat.map(_._2))},""" +
        s""""minor_bytes_med":${medL(minors.map(_._2))},""" +
        s""""major_bytes_med":${medL(majors.map(_._2))},""" +
        f""""amortized_flat_sec":${flat.map(_._1).sum / flat.size}%.2f,""" +
        f""""amortized_tiered_sec":${tiered.map(_._1).sum / tiered.size}%.2f}"""
    }

    /** One label per [[graft.streaming.BatchOutcome]] — empty/skipped
      * batches keep their own labels so they can never masquerade as
      * 0-byte minors in the medians. */
    def kindOf(o: graft.streaming.BatchOutcome): String = o match {
      case graft.streaming.BatchOutcome.Bootstrapped => "bootstrap"
      case graft.streaming.BatchOutcome.Minor => "minor"
      case _: graft.streaming.BatchOutcome.Major => "major"
      case graft.streaming.BatchOutcome.EmptyBatch => "empty"
      case other => other.toString.toLowerCase
    }

    // ---- graph family: 1997 co-purchase edges
    val edges = graft.queries.CoreQueries.copurchasePairs(
      graft.io.Tables.load(spark, sfDir, "lineitem")
        .filter(year(col("l_shipdate")) === 1997)).distinct()
    val eChunks = stage(edges, "edges")
    val gFlat = run(eChunks,
      (c, i) => { graft.streaming.GraphEpochStream.foldBatch(
        c, s"$tmp/g_flat", i); "flat" },
      (_, i) => s"$tmp/g_flat/epoch=$i")
    val gTier = run(eChunks,
      (c, i) => kindOf(graft.streaming.GraphTieredStream.foldBatch(
        c, s"$tmp/g_tier", i, majorEvery)),
      (kind, i) => if (kind == "minor") s"$tmp/g_tier/l0/epoch=$i"
                   else s"$tmp/g_tier/l1/epoch=$i")

    // cross-check: both designs folded every edge exactly once
    val (_, gHyb) = graft.streaming.GraphEpochStream.loadCurrent(spark,
      s"$tmp/g_flat", dedup = true, graft.operators.Adjacency.DefaultHubLimit)
      .getOrElse(sys.error("flat graph roll committed nothing"))
    val flatEdges = try gHyb.edges.count() finally gHyb.release()
    val gView = graft.streaming.GraphTieredStream.loadCurrent(spark, s"$tmp/g_tier")
      .getOrElse(sys.error("tiered graph roll committed nothing"))
    val tierEdges = try gView.mergedEdges.count() finally gView.release()
    require(flatEdges == tierEdges,
      s"flat folded $flatEdges edges, tiered $tierEdges")

    // ---- vector family: the embeddings table
    val vecs = graft.io.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val vChunks = stage(vecs, "vecs")
    val vFlat = run(vChunks,
      (c, i) => { graft.streaming.VectorEpochStream.foldBatch(
        c, "vec_id", "embedding", s"$tmp/v_flat", i, nCells = 16); "flat" },
      (_, i) => s"$tmp/v_flat/epoch=$i")
    val vTier = run(vChunks,
      (c, i) => kindOf(graft.streaming.VectorTieredStream.foldBatch(
        c, "vec_id", "embedding", s"$tmp/v_tier", i, nCells = 16,
        majorEvery = majorEvery)),
      (kind, i) => if (kind == "minor") s"$tmp/v_tier/l0/epoch=$i"
                   else s"$tmp/v_tier/l1/epoch=$i")

    val (_, vIvf) = graft.streaming.VectorEpochStream.loadCurrent(spark,
      s"$tmp/v_flat", nCells = 16)
      .getOrElse(sys.error("flat vector roll committed nothing"))
    val flatVecs = try vIvf.assigned.count() finally vIvf.release()
    val vView = graft.streaming.VectorTieredStream.loadCurrent(spark,
      s"$tmp/v_tier", nCells = 16)
      .getOrElse(sys.error("tiered vector roll committed nothing"))
    val tierVecs = try vView.index.assigned.count() finally vView.release()
    require(flatVecs == tierVecs,
      s"flat folded $flatVecs vectors, tiered $tierVecs")

    println(
      s"""{"metric":"tiered_roll_probe","chunks":$nChunks,""" +
        s""""major_every":$majorEvery,"edges":$flatEdges,"vectors":$flatVecs,""" +
        familyJson("graph", gFlat, gTier) + "," +
        familyJson("vector", vFlat, vTier) + "}")
    spark.stop()
  }
}
