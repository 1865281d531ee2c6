package graft.tools

/** Phase/steady-state probe for q65's PageRank job — times the full query
  * repeatedly in one session (flat timings prove the staged rounds leak
  * nothing across calls). Usage: runMain graft.tools.PrProbe [sfDir] [reps] */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries("q65_copurchase_pagerank")
    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"[prprobe] rep $rep ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        s"persistedRdds=${spark.sparkContext.getPersistentRDDs.size}")
    }
    spark.stop()
  }
}
