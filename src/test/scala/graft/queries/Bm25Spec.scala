package graft.queries

import graft.SparkSpec

/** t37 (BM25 lexical retrieval) — beyond the hash-exact oracle gate:
  * agreement with an independent driver-side recompute of the whole
  * scoring pipeline (same IEEE operation tree, fixed-point floor, exact
  * long sums), and the structural retrieval invariants (dense ranks,
  * score-ordered, every hit shares ≥1 term with its query).
  */
class Bm25Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def recompute(): Map[(Long, Long), (Long, Long, Int)] = {
    // (qid, doc_id) -> (score_scaled, n_terms, rank)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val tf: Map[(Long, String), Long] = texts.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, o) => ((id, t), o.length.toLong) }
    }.toMap
    val dl: Map[Long, Long] = texts.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val nDocs = texts.length.toLong
    val avgdl = dl.values.sum.toDouble / nDocs
    val df: Map[String, Long] = tf.keys.toSeq.groupBy(_._2)
      .map { case (t, ks) => t -> ks.length.toLong }
    val perPair = for {
      (qid, qtext) <- TextQueries.Bm25Queries
      tok <- qtext.split(" ").distinct.toSeq
      (id, _) <- texts if tf.contains((id, tok))
    } yield {
      val t = tf((id, tok)); val d = df(tok); val l = dl(id)
      // the EXACT operation tree of the query and its oracle
      val idf = (nDocs - d + 0.5) / (d + 0.5)
      val c = idf * (t * 2.2) / (t + 1.2 * (0.25 + 0.75 * l / avgdl))
      ((qid, id), math.floor(c * 1e6).toLong)
    }
    val agg = perPair.groupBy(_._1)
      .map { case (k, vs) => k -> ((vs.map(_._2).sum, vs.length.toLong)) }
    agg.groupBy(_._1._1).flatMap { case (_, rows) =>
      rows.toSeq.sortBy { case ((_, id), (s, _)) => (-s, id) }
        .take(5).zipWithIndex
        .map { case ((k, (s, n)), i) => k -> (s, n, i + 1) }
    }
  }

  test("t37: engine result equals a driver-side BM25 recompute " +
       "(scores, matched-term counts, ranks)") {
    val out = TextQueries.queries("t37_bm25")(spark, sf).collect()
    val expect = recompute()
    assert(out.length === expect.size)
    out.foreach { r =>
      val k = (r.getLong(0), r.getLong(2))
      val (s, n, rank) = expect(k)
      assert(r.getLong(3) === s, s"score of $k")
      assert(r.getLong(4) === n, s"n_terms of $k")
      assert(r.getInt(1) === rank, s"rank of $k")
    }
  }

  test("v23: hybrid fusion invariants — rrf reconstructs from the leg " +
       "ranks, self never retrieved, 10 dense rrf-ordered rows per query") {
    val out = VectorQueries.queries("v23_hybrid_bm25")(spark, sf).collect()
    assert(out.groupBy(_.getLong(0)).size === 8)
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to 10), s"q$qid ranks")
      val rrfs = sorted.map(_.getDouble(3)).toSeq
      assert(rrfs === rrfs.sorted.reverse, s"q$qid rrf-ordered")
      rows.foreach { r =>
        assert(r.getLong(2) !== qid, s"q$qid retrieved itself")
        val la = if (r.getInt(4) == 0) 1000 else r.getInt(4)
        val vb = if (r.getInt(5) == 0) 1000 else r.getInt(5)
        val expect = BigDecimal(1.0 / (60 + la) + 1.0 / (60 + vb))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(3) === expect,
          s"rrf of (q$qid, ${r.getLong(2)}) from legs ($la, $vb)")
      }
    }
    // the fusion is genuinely hybrid on this corpus: some candidate is
    // surfaced by both legs, and some by exactly one
    assert(out.exists(r => r.getInt(4) > 0 && r.getInt(5) > 0))
    assert(out.exists(r => r.getInt(4) == 0 ^ r.getInt(5) == 0))
  }

  test("t37: retrieval invariants — dense per-query ranks, score-ordered, " +
       "every hit matches at least one query term") {
    val out = TextQueries.queries("t37_bm25")(spark, sf).collect()
    val qs = TextQueries.Bm25Queries.toMap
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to rows.length),
        s"ranks of query $qid are dense from 1")
      val scores = sorted.map(_.getLong(3)).toSeq
      assert(scores === scores.sorted.reverse, s"query $qid ordered by score")
      val nTerms = qs(qid).split(" ").distinct.length.toLong
      rows.foreach { r =>
        assert(r.getLong(4) >= 1L && r.getLong(4) <= nTerms,
          s"n_terms of (q$qid, doc ${r.getLong(2)}) within [1, $nTerms]")
      }
    }
  }
}
