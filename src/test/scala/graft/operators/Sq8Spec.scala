package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQ8 scalar-quantized retrieval (v22 / Similarity.sq8TopK) — the
  * approximate-method guarantees the hash-exact oracle can't express:
  * recall against the exact inner-product ranker, the analytic
  * quantization error bound, and the zero-vector edge.
  */
class Sq8Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def e = spark.read.parquet(s"$sf/embeddings.parquet")

  test("sq8TopK: recall@5 vs exact MIPS ≥ 0.8, and every reported score " +
       "is within the analytic SQ8 error bound of the true inner product") {
    val q = e.filter(col("vec_id") < 16)
    val approx = Similarity.sq8TopK(q, "vec_id", "embedding",
      e, "vec_id", "embedding", k = 5).collect()
    val exact = Similarity.mipsTopK(q, "vec_id", "embedding",
      e, "vec_id", "embedding", k = 5).collect()
    val exactSets = exact.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val hits = approx.count(r => exactSets(r.getLong(0)).contains(r.getLong(2)))
    val recall = hits.toDouble / exact.length
    assert(recall >= 0.8, s"recall@5 = $recall")

    // |q_i·s/127 − x_i| ≤ s/254 per component, so for 64-dim vectors
    // |sq8_ip − true_ip| ≤ 64·(ma·mc/254 + mc·ma/254 + ma·mc/254²)
    val vecs = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    approx.foreach { r =>
      val (qi, ni, got) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val (a, b) = (vecs(qi), vecs(ni))
      val trueIp = a.zip(b).map { case (x, y) => x * y }.sum
      val ma = a.map(math.abs).max; val mc = b.map(math.abs).max
      val bound = 64.0 * ma * mc * (2.0 / 254 + 1.0 / (254.0 * 254))
      assert(math.abs(got - trueIp) <= bound,
        s"($qi,$ni): sq8=$got true=$trueIp bound=$bound")
    }
  }

  test("sq8TopK: an all-zero vector quantizes to zero codes and scale 0 — " +
       "scores stay finite and the zero query ranks everything at 0") {
    import sqlImplicits._
    val z = Seq(
      (100L, Array.fill(4)(0.0f)),
      (101L, Array(1.0f, -2.0f, 3.0f, -4.0f)),
      (102L, Array(0.5f, 0.5f, -0.5f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.sq8TopK(z.filter(col("vec_id") === 100L),
      "vec_id", "embedding", z, "vec_id", "embedding", k = 5).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(!r.getDouble(3).isNaN && r.getDouble(3) === 0.0,
        s"zero-query score vs ${r.getLong(2)}")
    }
    // and as a corpus member it is rankable without NaN
    val out2 = Similarity.sq8TopK(z.filter(col("vec_id") === 101L),
      "vec_id", "embedding", z, "vec_id", "embedding", k = 5).collect()
    assert(out2.map(_.getLong(2)).toSet === Set(100L, 102L))
    out2.foreach(r => assert(!r.getDouble(3).isNaN))
  }
}
