package graft.operators

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import sqlImplicits._

  private def metricsOf(df: org.apache.spark.sql.DataFrame): Map[(String, String), Double] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

  test("audit computes null/distinct/minmax/dup-key metrics in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("a"), None),
      (2L, None: Option[String], Some(30.5)), // dup key + null
      (4L, Some("b"), Some(-2.0))
    ).toDF("k", "s", "x")
    val m = metricsOf(DataQuality.audit(df,
      nullCols = Seq("s", "x"), distinctCols = Seq("s"),
      numericCols = Seq("x"), keyCols = Seq("k")))
    assert(m(("row_count", "*")) === 4.0)
    assert(m(("null_count", "s")) === 1.0)
    assert(m(("null_count", "x")) === 1.0)
    assert(m(("distinct_count", "s")) === 2.0) // NULL excluded
    assert(m(("min", "x")) === -2.0)
    assert(m(("max", "x")) === 30.5)
    assert(m(("dup_key_rows", "k")) === 1.0)
    assert(m(("null_key_rows", "k")) === 0.0)
  }

  test("NULL-key rows are excluded from dup count and surfaced separately") {
    val df = Seq(
      (Some(1L), "a"), (Some(1L), "b"), // one real dup
      (None: Option[Long], "c"), (None: Option[Long], "d") // NULL keys:
      // NOT two colliding values of one key — a different failure mode
    ).toDF("k", "s")
    val m = metricsOf(DataQuality.audit(df, keyCols = Seq("k")))
    assert(m(("dup_key_rows", "k")) === 1.0)
    assert(m(("null_key_rows", "k")) === 2.0)
    // composite key: a NULL in ANY key column disqualifies the row
    val m2 = metricsOf(DataQuality.audit(
      df.withColumn("k2", org.apache.spark.sql.functions.lit("z")),
      keyCols = Seq("k", "k2")))
    assert(m2(("dup_key_rows", "k,k2")) === 1.0)
    assert(m2(("null_key_rows", "k,k2")) === 2.0)
  }

  test("audit exact=false uses HLL and still returns every slot") {
    val df = (1 to 100).map(i => (i.toLong, s"v${i % 7}")).toDF("k", "s")
    val m = metricsOf(DataQuality.audit(df,
      distinctCols = Seq("s"), keyCols = Seq("k"), exact = false))
    assert(m(("row_count", "*")) === 100.0)
    // HLL is exact at this cardinality with default rsd
    assert(m(("distinct_count", "s")) === 7.0)
    assert(m(("dup_key_rows", "k")) === 0.0)
  }

  test("audit is a single aggregation job over one scan") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val out = DataQuality.audit(df, nullCols = Seq("s"),
      numericCols = Seq("k"), keyCols = Seq("k"))
    // exactly one Aggregate subtree pair (partial+final) over one relation:
    // the optimized plan must contain one LocalRelation/scan reference
    val plan = out.queryExecution.optimizedPlan.toString()
    assert(plan.linesIterator.count(_.contains("LocalRelation")) === 1,
      s"audit must scan its input once:\n$plan")
  }

  test("referentialOrphans counts unmatched and null child keys separately") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(3L), None).toDF("fk")
    val m = metricsOf(DataQuality.referentialOrphans(child, "fk", parent, "pk"))
    assert(m(("orphan_count", "fk")) === 1.0) // the 3L row
    assert(m(("null_key_rows", "fk")) === 1.0)
  }
}
