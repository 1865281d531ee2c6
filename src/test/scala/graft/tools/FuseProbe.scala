package graft.tools

/** One-off A/B: d02's exact-Jaccard pair join with the FuseSetJaccard
  * rewrite on vs off (spark.graft.fuseSetJaccard), 3 timed runs each after
  * a warm-up. Not engine surface. */
object FuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.queries.TextQueries.queries("d02_jaccard_pairs")(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    for (fuse <- Seq("true", "false", "true", "false")) {
      spark.conf.set("spark.graft.fuseSetJaccard", fuse)
      run() // warm
      val ts = Seq.fill(3)(run())
      println(f"fuse=$fuse%-5s min=${ts.min}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
