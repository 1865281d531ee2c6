package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9 continuation additions — q65
  * (fixed-point PageRank over the co-purchase graph), t32 (bigram-LM
  * quality scoring), v18 (reciprocal-rank fusion) — beyond what the
  * hash-exact oracle gate proves: agreement with independent driver-side
  * recomputes and the internal consistency of the emitted columns.
  */
class HybridRankSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val Scale = 1000000000L

  test("q65: top-20 agrees with a driver-side fixed-point replay of the " +
       "whole graph") {
    val out = CoreQueries.queries("q65_copurchase_pagerank")(spark, sf).collect()
    assert(out.length === 20)
    // independent replay: edges from the raw table, sequential arithmetic
    val ip = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = ip.groupBy(_._1).values
    val edges = byOrder.flatMap { ps =>
      val parts = ps.map(_._2).toSeq
      for (a <- parts; b <- parts if a != b) yield (a, b)
    }.toSeq.distinct
    val r = graft.operators.BrutePageRank.ranks(edges, 5)
    val expect = r.toSeq.sortBy { case (n, rk) => (-rk, n) }.take(20)
    assert(out.map(x => (x.getLong(0), x.getLong(1))).toSeq === expect)
    // co-purchase edges are symmetric, so nothing in the top-20 dangles
    out.foreach(x => assert(x.getLong(2) > 0L, s"outdeg of node ${x.getLong(0)}"))
  }

  test("t32: doc scores match a driver-side Laplace bigram-LM recompute, " +
       "and every mean probability is in (0, 1]") {
    val out = TextQueries.queries("t32_bigram_lm")(spark, sf).collect()
    assert(out.nonEmpty)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val toks = texts.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty) }
    val vocab = toks.flatMap(_._2).distinct.length.toLong
    val bigrams = toks.flatMap { case (id, ts) =>
      ts.sliding(2).collect { case Array(a, b) => (id, a, b) }
    }
    val c2 = bigrams.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.size.toLong }
    val c1 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val expect = bigrams.groupBy(_._1).map { case (id, bs) =>
      val sum = bs.iterator.map { case (_, a, b) =>
        (c2((a, b)) + 1) * Scale / (c1(a) + vocab)
      }.sum
      id -> (bs.size.toLong, sum)
    }
    out.foreach { r =>
      val id = r.getLong(0)
      val (n, s) = expect(id)
      assert(r.getLong(1) === n, s"n_bigrams of doc $id")
      assert(r.getLong(2) === s, s"sum_scaled of doc $id")
      val meanP = r.getDouble(3)
      assert(meanP > 0.0 && meanP <= 1.0, s"mean_p of doc $id out of range")
    }
    assert(out.length === expect.size, "every doc with >= 1 bigram is scored")
  }

  test("v19: cell counts conserve both populations and the drift verdict " +
       "is exactly the integer cross-multiplication") {
    val out = VectorQueries.queries("v19_centroid_drift")(spark, sf).collect()
    assert(out.nonEmpty)
    val nTot = out.map(_.getLong(1)).sum
    val nBtot = out.map(_.getLong(2)).sum
    assert(nTot === spark.read.parquet(s"$sf/embeddings.parquet").count())
    assert(nBtot === spark.read.parquet(s"$sf/embeddings.parquet")
      .where("label = 3").count(),
      "batch cells are a subset of index cells, so the emitted n_new " +
        "column must sum to the whole batch")
    out.foreach { r =>
      val (nIdx, nNew) = (r.getLong(1), r.getLong(2))
      assert(r.getLong(3) === nIdx * 1000 / nTot, "idx_share_pm")
      assert(r.getLong(4) === nNew * 1000 / nBtot, "new_share_pm")
      assert(r.getBoolean(5) ===
        (2 * math.abs(nNew * nTot - nIdx * nBtot) > nIdx * nBtot),
        s"drift verdict of cell ${r.getLong(0)}")
    }
    assert(out.exists(_.getBoolean(5)) && out.exists(!_.getBoolean(5)),
      "the single-domain batch must flip some cells and not others, or " +
        "the audit demonstrates nothing")
  }

  test("t33: fertility report matches a driver-side recompute") {
    val out = TextQueries.queries("t33_tokenizer_fertility")(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "source", "text").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2)))
    val piece = "[a-z]+|[0-9]+|[^a-z0-9 ]".r
    val expect = docs.groupBy(_._1).map { case (k, rows) =>
      val texts = rows.map(_._2)
      val nt = texts.map(_.split(" ").count(_.nonEmpty).toLong).sum
      val np = texts.map(t => piece.findAllIn(t).size.toLong).sum
      val nb = texts.map(_.getBytes("UTF-8").length.toLong).sum
      k -> (texts.length.toLong, nt, np, nb)
    }
    assert(out.length === expect.size)
    out.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (nd, nt, np, nb) = expect(k)
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
        ((nd, nt, np, nb)), s"counts of $k")
      assert(r.getLong(6) === np * 100 / math.max(nt, 1L), s"fertility of $k")
      assert(r.getLong(7) === nb * 100 / math.max(nt, 1L), s"bytes/tok of $k")
    }
  }

  test("v20: recall is nondecreasing in nProbe and the widest sweep " +
       "point reproduces v09's audit") {
    val out = VectorQueries.queries("v20_nprobe_sweep")(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 4))
    val recalls = out.map(_.getDouble(3)).toSeq
    assert(recalls === recalls.sorted, "more probed cells can't lose recall")
    out.foreach(r => assert(r.getLong(1) === 40L, "8 queries x k=5 pairs"))
    val v09 = VectorQueries.queries("v09_recall_audit")(spark, sf).collect()
    assert(out.last.getLong(2) === v09.map(_.getLong(2)).sum,
      "nProbe=4 sweep hits must equal v09's per-query hits summed")
  }

  test("v18: rrf is recomputable from the emitted leg ranks and each " +
       "query's fused list is a dense rank 1..10") {
    val out = VectorQueries.queries("v18_rrf_fusion")(spark, sf).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 8L).toSet)
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length),
        s"dense fused ranks for query $qid")
      var prev = Double.MaxValue
      sorted.foreach { r =>
        val (rrf, lex, vec) = (r.getDouble(3), r.getInt(4), r.getInt(5))
        val ra = if (lex == 0) 1000 else lex
        val rb = if (vec == 0) 1000 else vec
        val expect = BigDecimal(1.0 / (60 + ra) + 1.0 / (60 + rb))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(rrf === expect, s"rrf of ($qid, ${r.getLong(2)})")
        assert(lex >= 0 && lex <= 50 && vec >= 0 && vec <= 50,
          "leg ranks come from the top-50 cut (0 = absent)")
        assert(lex != 0 || vec != 0, "a fused candidate appears in >= 1 leg")
        assert(rrf <= prev, s"fused list of $qid ordered by rrf desc")
        prev = rrf
      }
    }
  }
}
