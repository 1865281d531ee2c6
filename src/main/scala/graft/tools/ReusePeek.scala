package graft.tools

import org.apache.spark.sql.execution.ExplainMode
import graft.GraftSession

/** Plan-reuse probe: prints exchange/scan/reuse node counts and wall time
  * for one named query — the check VERDICT r8 ran by hand for t25
  * (ReusedExchange x0, 4 scans = the gram subplan computed twice).
  * Usage: runMain graft.tools.ReusePeek <queryName> [sfDir] */
object ReusePeek {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("t25_ngram_novelty")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    val q = graft.SparkEntry.queries(name)
    val df = q(spark, dir)
    val t0 = System.nanoTime()
    val rows = df.collect().length
    val wall = (System.nanoTime() - t0) / 1e9
    // after the action, the AQE plan is final — reuse shows as ReusedExchange
    // / ShuffleQueryStage reuse in the executed plan
    val plan = df.queryExecution.executedPlan.toString
    def n(pat: String) = pat.r.findAllIn(plan).size
    println(plan)
    println(s"== scans=${n("Scan parquet")} exchanges=${n("Exchange")} " +
      s"reusedExchange=${n("ReusedExchange")} " +
      s"shuffleStages=${n("ShuffleQueryStage")}")
    println(f"== rows=$rows wall=$wall%.2f s")
    spark.stop()
  }
}
