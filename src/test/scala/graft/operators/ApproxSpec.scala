package graft.operators

import graft.SparkSpec
import graft.queries.CoreQueries

class ApproxSpec extends SparkSpec {

  test("approx_count_distinct lands within 10% of exact (2x the default 5% rsd)") {
    val rows = CoreQueries.queries("q20_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_custs").toDouble
      val exact = r.getAs[Long]("exact_custs").toDouble
      assert(math.abs(approx - exact) / exact < 0.10, // default rsd 5%; allow 2x
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }
}
