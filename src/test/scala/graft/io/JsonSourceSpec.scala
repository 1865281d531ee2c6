package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** JSON-lines source breadth check beside parquet/ORC/CSV/JDBC/XLSX: the
  * common ingest format for event feeds and LLM training corpora
  * (one JSON document per line). Two disciplines matter at 100 TB:
  *
  *  - read with an EXPLICIT schema — schema inference is a full extra
  *    pass over the data before the real scan (per the Spark source,
  *    `JsonDataSource.inferSchema` samples/scans the input), and drifting
  *    inferred types break plan reuse across daily shards;
  *  - malformed records must be quarantined (PERMISSIVE +
  *    columnNameOfCorruptRecord), never silently dropped and never fatal
  *    mid-scan, mirroring MalformedInputSpec's parquet/CSV policy.
  */
class JsonSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("quality", DoubleType)))

  test("JSON-lines round-trip preserves values under an explicit schema") {
    val dir = Files.createTempDirectory("json_rt").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "docs.jsonl").getAbsolutePath

    val src = spark.range(500).select(
      col("id").as("doc_id"),
      concat(lit("body "), col("id")).as("text"),
      (col("id") % 10 / 10.0).as("quality"))
    src.write.mode("overwrite").json(path)

    val back = spark.read.schema(schema).json(path)
    assert(back.count() === 500L)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // projection prunes: JSON scans prune at the parser level —
    // requiredSchema in the scan carries only the selected columns
    val q = back.select("doc_id")
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scan.contains("doc_id") && !scan.contains("quality"),
      s"untouched column not pruned from the JSON scan:\n$scan")
  }

  test("malformed lines are quarantined, not dropped or fatal") {
    val dir = Files.createTempDirectory("json_bad").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "part-0.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"doc_id": 1, "text": "ok", "quality": 0.5}""")
    w.println("""{"doc_id": 2, "text": "broken""")
    w.println("""{"doc_id": 3, "text": "fine", "quality": 1.0}""")
    w.close()

    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val df = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(f.getAbsolutePath)
      .cache() // corrupt-record column requires a materialized frame
    try {
      assert(df.count() === 3L, "malformed line dropped")
      val bad = df.filter(col("_corrupt_record").isNotNull)
      assert(bad.count() === 1L)
      assert(bad.head.isNullAt(0)) // corrupt row parses no typed fields
      val good = df.filter(col("_corrupt_record").isNull)
      assert(good.select("doc_id").collect().map(_.getLong(0)).toSet
        === Set(1L, 3L))
    } finally df.unpersist()
  }
}
