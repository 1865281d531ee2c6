package graft.io

import java.nio.file.Files
import graft.SparkSpec
import graft.schema.Schemas

/** Ingestion robustness policy: at 100 TB some rows WILL be malformed.
  * The engine reads CSV in PERMISSIVE mode with a rescue column so bad
  * rows are quarantined, not silently dropped and not run-aborting. */
class MalformedInputSpec extends SparkSpec {

  test("malformed CSV rows are quarantined via _corrupt_record, not fatal") {
    val dir = Files.createTempDirectory("bad_csv")
    Files.writeString(dir.resolve("data.csv"),
      """concept_id
        |123
        |not_a_number
        |456
        |""".stripMargin)
    val schema = Schemas.codelist.add("_corrupt_record", "string")
    val df = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema)
      .csv(dir.toString)
      .cache() // corrupt-record column requires caching before split
    val good = df.filter("_corrupt_record IS NULL")
    val bad = df.filter("_corrupt_record IS NOT NULL")
    assert(good.count() === 2)
    assert(bad.count() === 1)
    assert(bad.head().getAs[String]("_corrupt_record") === "not_a_number")
    df.unpersist()
  }

  test("FAILFAST mode surfaces the bad row as an error (strict pipelines)") {
    val dir = Files.createTempDirectory("bad_csv2")
    Files.writeString(dir.resolve("data.csv"), "concept_id\nxyz\n")
    val thrown = intercept[org.apache.spark.SparkException] {
      spark.read.option("header", "true").option("mode", "FAILFAST")
        .schema(Schemas.codelist).csv(dir.toString).collect()
    }
    assert(thrown.getMessage.contains("MALFORMED_RECORD") ||
      thrown.getCause != null)
  }
}
