package graft.tools

import org.apache.spark.sql.functions._

/** One-off A/B for the ANN ranking stage shape (not engine surface):
  * FEW keys × HUGE groups — 8 queries, each scoring the whole corpus —
  * where a row_number window sorts every query's full candidate set but
  * the bounded-heap TopKPerKey keeps k per (partition, query) below the
  * exchange. This is the stage cosineTopK/ivfProbe/lshCosineTopK/pqTopK
  * route through rankTopK. */
object AnnRankProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toLong).getOrElse(16000000L)
    val queries = 8L
    // emulate the scored frame (qid, nid, sim) directly; the dot products
    // upstream are identical in both formulations and not what's measured
    val scored = spark.range(n).select(
      (col("id") % queries).as("qid"),
      col("id").as("nid"),
      (xxhash64(col("id"), lit(3)).cast("double") / Long.MaxValue).as("sim"))
    scored.write.mode("overwrite").parquet("/tmp/ann_rank_probe")
    val t = spark.read.parquet("/tmp/ann_rank_probe")
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (_ <- 1 to 2) { // second iteration is the warm measurement
      val heap = time(graft.plans.TopK.perKey(t, Seq("qid"),
        Seq("sim" -> false, "nid" -> true), 5).count())
      val win = time(graft.plans.TopK.perKeyWindow(t, Seq("qid"),
        Seq("sim" -> false, "nid" -> true), 5).count())
      println(f"n=$n queries=$queries k=5  heap=$heap%.1f s  window=$win%.1f s")
    }
    spark.stop()
  }
}
