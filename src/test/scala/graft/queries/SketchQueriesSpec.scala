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

  test("t24: chunks tile every token with stride overlap; fingerprints dedup-ready") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = TextQueries.queries("t24_chunk_windows")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet === docs.keySet, "every doc chunks")
    byDoc.foreach { case (d, cs) =>
      val n = docs(d)
      val sorted = cs.sortBy(_._2)
      // chunk indices are dense from 0; starts follow the stride
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong))
      sorted.foreach { case (_, idx, start, nTok, md5) =>
        assert(start === idx * 24)
        assert(nTok === math.min(32, n - start), s"doc $d chunk $idx length")
        assert(md5.length === 32)
      }
      // coverage: last chunk reaches the final token; consecutive full
      // chunks overlap by 32 - 24 = 8 tokens
      val last = sorted.last
      assert(last._3 + last._4 === n, s"doc $d tail uncovered")
    }
  }

  test("t26: kept = total − profile coverage; clean text drops exactly the spans") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val profile = graft.operators.Dedup
      .spanDedupProfile(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val clean = graft.operators.Dedup
      .spanDedupClean(docs, "doc_id", "text", w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    clean.foreach { case (id, nTok, nKept, kept) =>
      val (pTok, pCov) = profile(id)
      assert(nTok === pTok)
      assert(nKept === nTok - pCov, s"doc $id: kept must be total minus covered")
      assert(kept.split(" ").count(_.nonEmpty) === nKept.toInt, s"doc $id text/count")
    }
    // the corpus HAS duplicated spans — the transform must actually cut
    assert(clean.exists(c => c._3 < c._2), "some doc must lose tokens")
  }

  test("t27: leakage safety — no duplicate cluster straddles two splits") {
    val rows = TextQueries.queries("t27_cluster_split")(spark, sf)
      .collect()
    // per-split cluster counts must sum to the total cluster count: a
    // cluster in two splits would be double-counted and break equality
    val nClustersSum = rows.map(_.getLong(2)).sum
    val total = TextQueries.queries("d05_dup_clusters")(spark, sf)
      .select("cluster").distinct().count()
    assert(nClustersSum === total,
      s"cluster split-straddle: per-split sum $nClustersSum vs $total distinct")
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum === nDocs, "every doc lands in a split")
  }

  test("t21: rank 1 is the modal token; per-doc means bounded by the vocab") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val counts = docs.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = counts.size.toLong
    val modal = counts.minBy { case (t, n) => (-n, t) }._1
    val out = TextQueries.queries("t21_token_rarity")(spark, sf)
      .select("doc_id", "n_tokens", "mean_rank", "max_rank").collect()
    out.foreach { r =>
      assert(r.getDouble(2) >= 1.0 && r.getDouble(2) <= vocab.toDouble)
      assert(r.getLong(3) >= 1L && r.getLong(3) <= vocab)
    }
    // a doc consisting only of the modal token would score mean_rank 1;
    // verify the rank table's head directly through the query: any doc
    // containing the modal token must have min-side mass, i.e. its mean
    // can't exceed vocab - (1 - 1/n_tokens) ... simplest sharp check:
    // recompute one doc's mean by hand
    val one = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").head()
    val ranks = counts.toSeq.sortBy { case (t, n) => (-n, t) }
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1L) }.toMap
    val toks = one.getString(1).split(" ").filter(_.nonEmpty)
    val expect = math.rint(
      toks.map(ranks).sum.toDouble / toks.length * 1e4) / 1e4
    val got = out.find(_.getLong(0) == one.getLong(0)).get
    assert(got.getDouble(2) === expect)
    assert(ranks(modal) === 1L)
  }

  test("q40: HLL paths within tolerance; union of disjoint shards ≡ max-merge") {
    val out = CoreQueries.queries("q40_hll_rollup")(spark, sf)
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getBoolean(2), s"direct estimate out of 5% for ${r.getString(0)}")
      assert(r.getBoolean(3), s"merged estimate out of 5% for ${r.getString(0)}")
      assert(r.getBoolean(4), s"paths diverge >2% for ${r.getString(0)}")
    }
    // mergeability in the exact regime: list-mode sketches of small
    // disjoint shards union to the exact total (measured exact at this sf)
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val est = o.groupBy(col("o_orderstatus"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("e"),
        countDistinct(col("o_custkey")).as("x"))
      .collect()
    est.foreach(r => assert(
      math.abs(r.getLong(1) - r.getLong(2)).toDouble / r.getLong(2) <= 0.05))
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

  test("q66: inclusion-exclusion identity holds on the exact columns and " +
       "both sketch verdicts land inside tolerance") {
    val rows = CoreQueries.queries("q66_hll_set_ops")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) === r.getLong(2) + r.getLong(3) - r.getLong(5),
        s"|A∪B| = |A|+|B|−|A∩B| for ${r.getInt(0)}")
      assert(r.getLong(5) > 0, "consecutive order years share customers")
      assert(r.getBoolean(6), s"union estimate off for year ${r.getInt(0)}")
      assert(r.getBoolean(7),
        s"intersection estimate outside its union-conditioned tolerance " +
          s"for year ${r.getInt(0)}")
    }
    // year pairs are consecutive and unique
    val pairs = rows.map(r => (r.getInt(0), r.getInt(1)))
    assert(pairs.forall { case (a, b) => b == a + 1 })
    assert(pairs.map(_._1).distinct.length === pairs.length)
  }
}
