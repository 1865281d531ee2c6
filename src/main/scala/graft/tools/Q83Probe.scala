package graft.tools

/** Temporary diagnosis: q83 rep-to-rep slowdown. */
object Q83Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries("q83_htn_phenotype")
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rdds = spark.sparkContext.getRDDStorageInfo.length
      val cached = spark.sharedState.cacheManager
      println(f"[q83probe] rep $i: $sec%.2fs persisted_rdds=$rdds " +
        s"cache_empty=${cached.isEmpty}")
    }
    spark.stop()
  }
}
