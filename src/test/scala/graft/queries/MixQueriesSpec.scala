package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9 curation additions — t30 (Gopher
  * rule flags), t31 (mixture/budget reweighting), d12 (SemDeDup
  * dominated-rule keep-list) — that the hash-exact oracle cannot express:
  * flag/verdict consistency, budget conservation, keep-list/pair-set
  * agreement. (Exactness vs DuckDB is covered by the Verify/check gate.)
  */
class MixQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t30: verdict is exactly the conjunction of rule flags, " +
       "and the flags match a driver-side recompute") {
    val out = TextQueries.queries("t30_gopher_rules")(spark, sf).collect()
    assert(out.nonEmpty)
    // recompute the histogram facts per doc from the raw table
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      val toks = docs(id).split(" ").filter(_.nonEmpty)
      val nt = toks.length.toLong
      val nd = toks.distinct.length.toLong
      val top = toks.groupBy(identity).values.map(_.length).max.toLong
      val wc = docs(id).count(_ != ' ').toLong
      assert(r.getLong(1) === nt, s"n_tokens of doc $id")
      assert(r.getLong(2) === top, s"top_tok_n of doc $id")
      assert(r.getBoolean(3) === (wc < 3 * nt || wc > 10 * nt), s"flag_word_len of $id")
      assert(r.getBoolean(4) === (nt < 30 || nt > 1500), s"flag_doc_len of $id")
      assert(r.getBoolean(5) === (5 * top > nt), s"flag_top_share of $id")
      assert(r.getBoolean(6) === (20 * (nt - nd) > 19 * nt), s"flag_dup_frac of $id")
      assert(r.getBoolean(7) ===
        !(r.getBoolean(3) || r.getBoolean(4) || r.getBoolean(5) || r.getBoolean(6)),
        s"keep of doc $id must be the conjunction of its flags")
    }
  }

  test("t31: budget is conserved, rates are capped, sampling never " +
       "exceeds either the source or its target") {
    val out = TextQueries.queries("t31_mixture_weights")(spark, sf).collect()
    val nSrc = out.length
    assert(nSrc >= 2)
    out.foreach { r =>
      val (tokens, target, ratePpm, sampled) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6))
      assert(target === 1000000L / nSrc, "uniform target share")
      assert(ratePpm <= 1000000L, "rate is a probability, capped at 1")
      assert(sampled <= tokens, "cannot sample more than the source holds")
      assert(sampled <= target, "cannot exceed the target allocation")
      // a source smaller than its target is taken whole (rate 1.0)
      if (tokens <= target) assert(ratePpm === 1000000L)
      // epochs_x100 >= 100 exactly for the sources that upsample
      assert((r.getLong(5) >= 100L) === (tokens <= target))
    }
  }

  test("q64: every event lands in exactly width/slide = 2 windows, " +
       "and slide starts are 3h-aligned") {
    val out = CoreQueries.queries("q64_sliding_distinct")(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    assert(out.map(_.getLong(2)).sum === 2 * total)
    out.foreach { r =>
      assert(r.getLong(0) % 10800 === 0, "window start on a slide boundary")
      assert(r.getLong(1) <= r.getLong(2), "distinct users <= events")
    }
  }

  test("d12: keep-list is exactly the complement of v05's dominated side") {
    val pairs = VectorQueries.queries("v05_embedding_dedup")(spark, sf)
      .select("id_a", "id_b").collect()
    val dominated = pairs.map(_.getLong(1)).toSet
    val domCounts = pairs.groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    val out = VectorQueries.queries("d12_semdedup")(spark, sf).collect()
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.length.toLong === nVecs, "one verdict per vector")
    out.foreach { r =>
      val (id, nDup, keep) = (r.getLong(0), r.getLong(2), r.getBoolean(3))
      assert(keep === !dominated.contains(id), s"keep of vec $id")
      assert(nDup === domCounts.getOrElse(id, 0L), s"n_lower_dups of vec $id")
    }
    // the minimum id of every cell is never dominated — the canonical
    // survivor contract shared with d05/d08's min-id clusters
    out.groupBy(_.getInt(1)).values.foreach { cell =>
      val minId = cell.map(_.getLong(0)).min
      assert(cell.find(_.getLong(0) == minId).get.getBoolean(3),
        "cell minimum id must be kept")
    }
  }
}
