package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ORC source/sink round-trip — the columnar-format breadth check beside
  * parquet (every oracle query), CSV (S4), JDBC (S1), and XLSX (S5). ORC
  * is Spark-native (no extra dependency) and the common interchange format
  * for Hive-lineage warehouses; the round-trip must preserve values AND
  * keep the scan predicate-pushdown- and column-pruning-capable, or the
  * 100-TB scan discipline (PlanSpec) silently degrades on ORC inputs. */
class OrcSourceSpec extends SparkSpec {
  import sqlImplicits._

  test("ORC round-trip preserves values; scan pushes filters and prunes columns") {
    val dir = Files.createTempDirectory("orc_rt").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "t.orc").getAbsolutePath

    val src = spark.range(1000).select(
      col("id"),
      (col("id") % 7).as("k"),
      concat(lit("name_"), col("id")).as("name"),
      (col("id") * 1.5).as("v"))
    src.write.mode("overwrite").orc(path)

    val back = spark.read.orc(path)
    // values survive the round-trip exactly
    assert(back.count() === 1000L)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)

    // predicate pushdown + column pruning reach the ORC scan
    val q = back.filter(col("k") === 3).select("id", "k")
    val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    // assert on the pushed filter CONTENT — the "PushedFilters:" label
    // prints even when the list is empty, so a label check is vacuous
    assert("PushedFilters: \\[[^\\]]*(EqualTo|IsNotNull)\\(k".r
             .findFirstIn(scan).isDefined,
      s"filter on k not pushed into the ORC scan:\n$scan")
    assert(!scan.contains("name"), s"untouched column not pruned from ORC scan:\n$scan")
    assert(q.count() === 143L) // 1000/7 -> ids 3,10,...,997
  }
}
