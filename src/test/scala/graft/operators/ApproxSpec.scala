package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.CoreQueries

class ApproxSpec extends SparkSpec {

  test("q20 emits exact counts plus a sketch-tolerance verdict that holds") {
    val rows = CoreQueries.queries("q20_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_within_5pct"),
        s"${r.getString(0)}: HLL(rsd=0.01) strayed past 5% of " +
          s"exact=${r.getAs[Long]("exact_custs")}")
    }
  }

  test("approx_count_distinct point accuracy: within 10% at the default rsd") {
    val df = graft.io.Tables.load(spark, "/root/testdata/sf0.01", "orders")
      .agg(approx_count_distinct(col("o_custkey")).as("approx"),
           countDistinct(col("o_custkey")).as("exact"))
      .head()
    val approx = df.getLong(0).toDouble
    val exact = df.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.10, // default rsd 5%; allow 2x
      s"approx=$approx exact=$exact")
  }
}
