package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Plan audit of the t37 BM25 probe: the postings ⋈ query-terms join and
  * the df/stats joins must be broadcast-shaped (no full-corpus shuffle on
  * the probe path). */
object PlanPeekBm25 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.TextQueries.queries("t37_bm25")(
      spark, "/root/testdata/sf0.001")
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
