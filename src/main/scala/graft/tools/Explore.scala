package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** One-off empirical probe for oracle-upgrade design (not part of the
  * engine surface): computes corpus-wide exact shingle/token Jaccard pairs
  * and reports, per pair, whether MinHash banding would emit it as a
  * candidate and what its SimHash Hamming distance is. Used to pick
  * completeness-safe parameters for the exact-verified d03/d04 queries.
  */
object Explore {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.local(32)
    import spark.implicits._

    val docs = graft.io.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("id"), col("text"))

    // exact 3-shingle sets + token sets + signatures, one pass
    val k = 128; val shingleW = 3
    val enriched = docs.as[(Long, String)].map { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val shingles = toks.sliding(shingleW).filter(_.length == shingleW)
        .map(_.mkString(" ")).toSet
      val sig = minhashSignatureJvm(text, k, shingleW).getOrElse(Array.empty[Long])
      val sh = simhash64Jvm(text).getOrElse(0L)
      (id, shingles.toSeq, toks.distinct.toSeq, sig.toSeq, sh)
    }.toDF("id", "shingles", "tokset", "sig", "sh")
      .persist()

    val a = enriched.select(col("id").as("id_a"), col("shingles").as("sh_a"),
      col("tokset").as("ts_a"), col("sig").as("sig_a"), col("sh").as("h_a"))
    val b = enriched.select(col("id").as("id_b"), col("shingles").as("sh_b"),
      col("tokset").as("ts_b"), col("sig").as("sig_b"), col("sh").as("h_b"))
    val pairs = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("shj",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("tokj",
        size(array_intersect(col("ts_a"), col("ts_b"))).cast("double") /
          size(array_union(col("ts_a"), col("ts_b"))))
      .filter(col("shj") >= 0.5 || col("tokj") >= 0.7)
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .persist()

    // minhash banding candidate status for (bands, r) configs
    def shared(bands: Int): org.apache.spark.sql.Column = {
      val r = k / bands
      val hits = (0 until bands).map { bnd =>
        (xxhash64(slice(col("sig_a"), bnd * r + 1, r), lit(bnd)) ===
          xxhash64(slice(col("sig_b"), bnd * r + 1, r), lit(bnd))).cast("int")
      }
      hits.reduce(_ + _)
    }
    val scored = pairs
      .withColumn("cand_32x4", shared(32) >= 1)
      .withColumn("cand_16x8", shared(16) >= 1)
      .withColumn("cand_8x16", shared(8) >= 1)
      .select("id_a", "id_b", "shj", "tokj", "hamming",
        "cand_32x4", "cand_16x8", "cand_8x16")
      .collect()

    println(s"== $sfDir: ${scored.length} pairs with shj>=0.5 or tokj>=0.7")
    def bucket(x: Double): String = f"${math.floor(x * 10) / 10}%.1f"
    scored.groupBy(r => bucket(r.getDouble(2))).toSeq.sortBy(_._1).foreach {
      case (bkt, rs) =>
        val miss32 = rs.count(!_.getBoolean(5))
        val miss16 = rs.count(!_.getBoolean(6))
        val miss8 = rs.count(!_.getBoolean(7))
        val maxHam = rs.map(_.getInt(4)).max
        println(f"shj=$bkt n=${rs.length}%5d miss32x4=$miss32%3d " +
          f"miss16x8=$miss16%3d miss8x16=$miss8%3d maxHamming=$maxHam%2d")
    }
    println("-- pairs with tokj >= 0.9: hamming distribution")
    scored.filter(_.getDouble(3) >= 0.9).groupBy(_.getInt(4)).toSeq
      .sortBy(_._1).foreach { case (h, rs) => println(f"hamming=$h%2d n=${rs.length}%5d") }
    println("-- pairs with shj >= 0.8: count " +
      scored.count(_.getDouble(2) >= 0.8))
    println("-- pairs with shj in [0.75,0.85): " +
      scored.count(r => r.getDouble(2) >= 0.75 && r.getDouble(2) < 0.85))
    spark.stop()
  }
}
