package graft.tools

import org.apache.spark.sql.functions._

/** One-off A/B: custom TopKPerKey exec vs the window row_number
  * formulation on a synthetic fact table (not engine surface). */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val keys = 1000L
    val data = spark.range(n).select(
      (xxhash64(col("id")) % keys).as("key"),
      xxhash64(col("id"), lit(7)).as("score"),
      col("id"))
    data.write.mode("overwrite").parquet("/tmp/topk_probe")
    val t = spark.read.parquet("/tmp/topk_probe")
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (_ <- 1 to 2) { // second iteration is the warm measurement
      val heap = time(graft.plans.TopK.perKey(t, Seq("key"),
        Seq("score" -> false, "id" -> true), 10).count())
      val win = time(graft.plans.TopK.perKeyWindow(t, Seq("key"),
        Seq("score" -> false, "id" -> true), 10).count())
      println(f"n=$n keys=$keys k=10  heap=$heap%.1f s  window=$win%.1f s")
    }
    spark.stop()
  }
}
