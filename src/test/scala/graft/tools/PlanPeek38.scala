package graft.tools

import org.apache.spark.sql.execution.ExplainMode

object PlanPeek38 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.CoreQueries.queries("q38_gaps_islands")(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
