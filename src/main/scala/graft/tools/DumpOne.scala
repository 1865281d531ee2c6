package graft.tools

/** Dump ONE named query's result to parquet (tools/check.py layout) for a
  * targeted local oracle check without running the full Verify sweep.
  * Usage: runMain graft.tools.DumpOne <queryName> <sfDir> <outDir> */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    val sql = graft.SparkEntry.oracleSql(name)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      s"""{"$name": ${graft.io.Jsons.str(sql)}}""")
    spark.stop()
  }
}
