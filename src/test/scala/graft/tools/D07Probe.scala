package graft.tools

import org.apache.spark.sql.functions._

/** Stage-timing probe for containmentPairsIndexed at sf0.1. */
object D07Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    val dir = "/root/testdata/sf0.1"
    val df = graft.io.Tables.load(spark, dir, "documents")
    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"### $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    // warm
    graft.operators.Dedup.containmentPairsIndexed(
      graft.io.Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", "source", 0.95).count()

    val base = df.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id").cast("long").as("id"), col("source").as("blk"),
        tokenSet(col("text")).as("s"))
    timed("tokenize+count")(base.count())
    val toks = base.select(col("id"), col("blk"), size(col("s")).as("sz"),
      explode(transform(col("s"), w => xxhash64(w))).as("w"))
    timed("toks")(toks.count())
    val freq = toks.groupBy("w").agg(count(lit(1)).as("df"))
    timed("freq")(freq.count())
    val ranked = toks.join(freq, "w")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("df"), col("w"))))
      .withColumn("pfx",
        col("rn") <= floor(lit(0.05) * col("sz")).cast("int") + 1)
    timed("ranked")(ranked.count())
    val buckets = ranked.groupBy("blk", "w")
      .agg(collect_list(struct(col("id"), col("sz"), col("pfx"))).as("ps"))
    timed("buckets")(buckets.count())
    import spark.implicits._
    val cand = buckets.select(col("ps")).as[Seq[(Long, Int, Boolean)]]
      .mapPartitions { bs => bs.flatMap { ps =>
        val arr = ps.toArray
        for { a <- arr.iterator if a._3; b <- arr.iterator
              if b._1 != a._1 && a._2 <= b._2 }
          yield if (a._1 < b._1) (a._1, b._1) else (b._1, a._1)
      }}
      .toDF("id_a", "id_b")
    timed("cand-raw")(cand.count())
    val candD = cand.distinct()
    timed("cand-distinct")(candD.count())
    timed("full")(graft.operators.Dedup.containmentPairsIndexed(
      df, "doc_id", "text", "source", 0.95).count())
    timed("quadratic")(graft.operators.Dedup.containmentPairs(
      df, "doc_id", "text", "source", 0.95).count())
    spark.stop()
  }
}
