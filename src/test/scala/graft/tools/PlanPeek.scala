package graft.tools
import org.apache.spark.sql.execution.ExplainMode
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.CoreQueries.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
    println("=== FORMATTED ===")
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")).take(1800))
    println("=== TRIM ===")
    spark.sql("""SELECT trim(BOTH '"' FROM '"F"') a, btrim('"F"', '"') b, trim('"F"', '"') c""").show()
    spark.stop()
  }
}
