package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-5 sketch/scoring queries that the
  * hash-exact oracle cannot express: CMS one-sided error, tf-idf top-k
  * shape. (Exactness vs DuckDB is covered by the Verify/check gate.) */
class SketchQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t15: CMS estimate is one-sided — est_n >= exact_n for every probe") {
    val rows = TextQueries.queries("t15_cms_heavy")(spark, sf)
      .select("tok", "exact_n", "est_n").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS under-estimated ${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // heavy hitters dominate their buckets: the relative error on the
    // top-20 stays within the ε·N CMS bound (w=1024 → tight here)
    val totalTokens = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").count()
    val eps = math.E / TextQueries.cmsWidth
    rows.foreach { r =>
      assert(r.getLong(2) - r.getLong(1) <= (eps * totalTokens).ceil.toLong,
        s"${r.getString(0)} overestimate exceeds eps*N")
    }
  }

  test("t16: exactly top-3 terms per doc, ranked by rarity then term") {
    val out = TextQueries.queries("t16_tfidf")(spark, sf)
      .select("doc_id", "tok", "rarity").collect()
    val byDoc = out.groupBy(_.getLong(0))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(byDoc.size === nDocs)
    byDoc.values.foreach { rs =>
      assert(rs.length <= 3)
      // rows arrive doc-ordered then rarity-desc: verify the ranking is real
      val rarities = rs.map(_.getDouble(2)).toSeq
      assert(rarities === rarities.sorted(Ordering[Double].reverse))
    }
  }
}
