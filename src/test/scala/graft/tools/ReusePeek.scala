package graft.tools
object ReusePeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("t15_cms_heavy", "t16_tfidf")) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"$q: ReusedExchange x${"ReusedExchange".r.findAllIn(p).length}, " +
        s"Scan parquet x${"Scan parquet".r.findAllIn(p).length}")
    }
    spark.stop()
  }
}
