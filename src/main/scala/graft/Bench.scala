package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/parquet-footer paths on the smallest scale
    // factor so the first timed query doesn't absorb session startup.
    // Skipped when the warm-up dir IS the benched dir: persisted signature
    // frames (MinHash/SimHash) are matched by canonicalized plan, so a
    // same-dir warm-up would quietly serve the timed run from cache and
    // understate d03/d04. Failures are logged, not swallowed — a query that
    // breaks at warm-up will mis-measure at timing.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).getCanonicalPath !=
        new java.io.File(sfDir).getCanonicalPath) {
      SparkEntry.queries.foreach { case (name, fn) =>
        try fn(spark, warmDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warm-up failed for $name: $e") }
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
