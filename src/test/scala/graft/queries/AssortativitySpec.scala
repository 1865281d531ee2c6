package graft.queries

import graft.SparkSpec

/** q80 (degree assortativity) — agreement with a driver-side recompute of
  * the full pipeline (pair-gen, distinct-neighbor degrees, exact integer
  * sums, the symmetric-marginal Pearson reduction) plus the coefficient's
  * analytic range. */
class AssortativitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q80: sums and coefficient match a driver-side recompute; |r| ≤ 1") {
    val out = CoreQueries.queries("q80_degree_assortativity")(spark, sf).collect()
    assert(out.length === 1)
    val r = out(0)

    val ip = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val edges = ip.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).toSeq
      for (a <- parts; b <- parts if a != b) yield (a, b)
    }.toSeq.distinct
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val m = edges.size.toLong
    val sumD = edges.iterator.map(e => deg(e._1)).sum
    val sumDD = edges.iterator.map(e => deg(e._1) * deg(e._2)).sum
    val sumD2 = edges.iterator.map(e => deg(e._1) * deg(e._1)).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((m, sumD, sumDD, sumD2)))

    val expect =
      if (m * sumD2 - sumD * sumD == 0L) 0.0
      else BigDecimal(
        (m.toDouble * sumDD - sumD.toDouble * sumD) /
          (m.toDouble * sumD2 - sumD.toDouble * sumD))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) === expect)
    assert(math.abs(r.getDouble(4)) <= 1.0, "Pearson coefficient range")
  }
}
