package graft.tools

/** Smoke + wall-time check of the bench's five prepare entries (the
  * concurrent-build rework): runs each once on a fresh session and
  * prints its span. Usage: runMain graft.tools.PrepSmoke [sfDir] */
object PrepSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"### prep $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    timed("ivf")(graft.queries.VectorQueries.prepareIvfIndex(spark, dir))
    timed("cluster")(graft.queries.TextQueries.prepareClusterIndex(spark, dir))
    timed("signature")(graft.queries.TextQueries.prepareSignatureIndex(spark, dir))
    timed("graph")(graft.queries.CoreQueries.prepareGraphIndex(spark, dir))
    timed("postings")(graft.queries.TextQueries.preparePostingsIndex(spark, dir))
    spark.stop()
  }
}
