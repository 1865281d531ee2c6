package graft.tools
import org.apache.spark.sql.execution.ExplainMode
object PlanPeek2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val t = graft.htn.OmopFixtures.tables(spark)
    val res = graft.htn.HtnPipeline.run(spark, t, graft.htn.OmopFixtures.codes)
    val plan = res.analytical.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val tree = plan.linesIterator.takeWhile(l => !l.trim.startsWith("(1)")).toSeq
    println(tree.mkString("\n"))
    println("---- exchange lines ----")
    plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Reused")).take(40).foreach(println)
    spark.stop()
  }
}
