package graft

import graft.io.Tables
import graft.htn.OmopFixtures

/** EP1 parity: the engine's SQL entry point (temp views + spark.sql) gives
  * the same results as the typed DataFrame path (SURVEY §3 EP1). */
class SqlEntrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("testdata views: SQL and DataFrame paths agree") {
    Tables.registerViews(spark, sf)
    val sql = spark.sql(
      """SELECT l_returnflag, count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS q
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val df = {
      import org.apache.spark.sql.functions._
      Tables.load(spark, sf, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("q"))
        .orderBy("l_returnflag").collect()
    }
    assert(sql.toSeq === df.toSeq)
  }

  test("catalog introspection (S2) sees registered tables and schemas") {
    Tables.registerViews(spark, sf)
    val names = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Set("lineitem", "orders", "documents", "embeddings").subsetOf(names))
    assert(spark.table("orders").schema.fieldNames.contains("o_orderdate"))
  }

  test("OMOP views support the reference's SQL shapes (quoted-trim, year filter)") {
    OmopFixtures.tables(spark).registerViews()
    val rows = spark.sql(
      """SELECT PATIENT_LINKAGE, BTRIM(GENDER_SOURCE_VALUE, '"') AS SEX
        |FROM person
        |WHERE PATIENT_LINKAGE IS NOT NULL AND YEAR_OF_BIRTH <= 2005
        |ORDER BY PATIENT_LINKAGE""".stripMargin)
    assert(rows.filter("SEX = 'F'").count() > 0) // quote actually stripped
    val dx = spark.sql(
      """SELECT DISTINCT PATIENT_LINKAGE FROM condition_occurrence
        |WHERE CONDITION_CONCEPT_ID IN (400) AND YEAR(CONDITION_START_DATE) IN (2023)
        |""".stripMargin).collect().map(_.getString(0)).toSet
    assert(dx === Set("PX_CONTROL", "PX_DX_ONLY"))
  }
}
