package graft.tools

import org.apache.spark.sql.functions._

object D07AutoProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.io.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val mixed = d.withColumn("grp",
      when(col("doc_id") % 10 === 0, lit("small")).otherwise(lit("large")))
      .withColumn("doc_id", col("doc_id").cast("long"))
    val quad = graft.operators.Dedup.containmentPairs(
        mixed, "doc_id", "text", "grp", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val idx = graft.operators.Dedup.containmentPairsIndexed(
        mixed.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", "grp", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val quadLarge = quad.filter(p => p._1 % 10 != 0 && p._2 % 10 != 0)
    val missing = quadLarge -- idx
    val extra = idx -- quadLarge
    println(s"### quadLarge=${quadLarge.size} idx=${idx.size} missing=${missing.size} extra=${extra.size}")
    missing.take(5).foreach { case (a, b, c) =>
      println(s"### missing pair $a $b $c")
      val sa = mixed.filter(col("doc_id") === a).select("text").head.getString(0)
      val sb = mixed.filter(col("doc_id") === b).select("text").head.getString(0)
      val ta = sa.trim.split("\\s+").toSet
      val tb = sb.trim.split("\\s+").toSet
      println(s"###   |A|=${ta.size} |B|=${tb.size} inter=${ta.intersect(tb).size}")
    }
    println("### drops: " + graft.operators.DedupMetrics.snapshot())
    spark.stop()
  }
}
