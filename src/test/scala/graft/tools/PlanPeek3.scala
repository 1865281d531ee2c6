package graft.tools
import org.apache.spark.sql.execution.ExplainMode

/** One-off plan inspector for the round-4 queries (not engine surface). */
object PlanPeek3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries
    for (q <- Seq("q25_rolling_window", "q26_pivot", "q27_quantiles",
                  "q28_json", "t12_pii_redact", "t13_segment_dedup")) {
      val df = all(q)(spark, "/root/testdata/sf0.001")
      val s = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val exchanges = "Exchange".r.findAllIn(s).length
      val wsc = "WholeStageCodegen".r.findAllIn(s).length
      println(s"=== $q  (Exchange x$exchanges, WSCG x$wsc) ===")
      println(s.linesIterator.takeWhile(!_.startsWith("(1) ")).mkString("\n").take(1400))
      println()
    }
    spark.stop()
  }
}
