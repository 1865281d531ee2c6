package graft.tools
import org.apache.spark.sql.execution.ExplainMode
object PlanPeek5 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries
    for (q <- Seq("q33_unpivot", "q34_distribution", "t15_cms_heavy", "t16_tfidf", "q31_correlated")) {
      val df = all(q)(spark, "/root/testdata/sf0.001")
      val s = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val exchanges = "Exchange".r.findAllIn(s).length
      val scans = "Scan parquet".r.findAllIn(s).length
      val wscg = "WholeStageCodegen".r.findAllIn(s).length
      println(s"=== $q  (Exchange x$exchanges, Scan x$scans, WSCG x$wscg) ===")
      println(s.linesIterator.takeWhile(!_.startsWith("(1) ")).mkString("\n").take(2000))
    }
    spark.stop()
  }
}
