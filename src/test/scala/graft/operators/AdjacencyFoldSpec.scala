package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Adjacency.foldEdges]] — incremental maintenance of the hybrid
  * adjacency. The contract under test: fold(standing, Δ) is
  * indistinguishable from build(standing-edges ∪ Δ) — same stored edge
  * multiset, same counts, bit-identical [[Adjacency.Hybrid.expand]] — at
  * |Δ|-proportional cost, and the folded hybrid OWNS its frames (the
  * standing hybrid can be released right after the fold returns). */
class AdjacencyFoldSpec extends SparkSpec {

  private def edgesOf(h: Adjacency.Hybrid): Seq[(Long, Long)] =
    h.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private def expandAll(h: Adjacency.Hybrid, srcs: Seq[Long]): Seq[String] = {
    import sqlImplicits._
    h.expand(srcs.map(s => (s, s * 7L)).toDF("src", "pay"))
      .collect().map(_.toString).sorted.toSeq
  }

  private def buildOn(e: DataFrame, dedup: Boolean,
                      hubLimit: Long = Adjacency.DefaultHubLimit): Adjacency.Hybrid =
    Checkpoints.sweepingOnFailure(spark.sparkContext)(
      Adjacency.build(e, dedup = dedup, hubLimit = hubLimit))

  private def foldOn(standing: Adjacency.Hybrid, delta: DataFrame, dedup: Boolean,
                     hubLimit: Long = Adjacency.DefaultHubLimit): Adjacency.Hybrid =
    Checkpoints.sweepingOnFailure(spark.sparkContext)(
      Adjacency.foldEdges(standing, delta, dedup = dedup, hubLimit = hubLimit))

  test("fold == rebuild: untouched pass-through, touched overlap, new sources") {
    import sqlImplicits._
    // standing: srcs 1..30 with two edges each; delta touches 5..8 (one
    // overlapping dst, one new), adds brand-new srcs 100..102
    val standingE = (1L to 30L).flatMap(s => Seq((s, s + 1), (s, s + 2))).toDF("src", "dst")
    val deltaE = ((5L to 8L).flatMap(s => Seq((s, s + 1), (s, 99L))) ++
      (100L to 102L).map(s => (s, 1L))).toDF("src", "dst")
    val standing = buildOn(standingE, dedup = true)
    val rebuilt = buildOn(standingE.unionByName(deltaE), dedup = true)
    try {
      val folded = foldOn(standing, deltaE, dedup = true)
      try {
        assert(edgesOf(folded) === edgesOf(rebuilt))
        assert((folded.srcCount, folded.hubCount) ===
          (rebuilt.srcCount, rebuilt.hubCount))
        assert(folded.edgeCount === edgesOf(rebuilt).size.toLong)
        val all = (1L to 30L) ++ (100L to 102L)
        assert(expandAll(folded, all) === expandAll(rebuilt, all))
      } finally folded.release()
    } finally { standing.release(); rebuilt.release() }
  }

  test("hub dynamics: touched hub stays hub, array source crosses the limit, untouched hub passes through") {
    import sqlImplicits._
    // hubLimit=4: src 1 (6 dsts) and src 2 (5 dsts) are standing hubs;
    // src 3 (3 dsts) is array. Delta touches hub 1 (+2 dsts) and pushes
    // array src 3 over the limit (+3 dsts); hub 2 untouched.
    val standingE = ((1L to 6L).map(d => (1L, d + 10L)) ++
      (1L to 5L).map(d => (2L, d + 20L)) ++
      (1L to 3L).map(d => (3L, d + 30L)) ++
      Seq((4L, 1L), (5L, 2L))).toDF("src", "dst")
    val deltaE = (Seq((1L, 100L), (1L, 101L)) ++
      (1L to 3L).map(d => (3L, d + 40L))).toDF("src", "dst")
    val standing = buildOn(standingE, dedup = true, hubLimit = 4)
    assert(standing.hubCount === 2L)
    val rebuilt = buildOn(standingE.unionByName(deltaE), dedup = true, hubLimit = 4)
    try {
      val folded = foldOn(standing, deltaE, dedup = true, hubLimit = 4)
      try {
        assert(folded.hubCount === 3L) // 1, 2 and the newly-crossed 3
        assert(rebuilt.hubCount === 3L)
        assert(edgesOf(folded) === edgesOf(rebuilt))
        assert(expandAll(folded, 1L to 5L) === expandAll(rebuilt, 1L to 5L))
        // untouched hub 2's degree row really is the standing frame's
        assert(folded.hubDeg.filter(col("src") === 2L).collect()
          .map(_.getLong(1)).toSeq === Seq(5L))
      } finally folded.release()
    } finally { standing.release(); rebuilt.release() }
  }

  test("routing divergence under raw-multiplicity duplicates is result-invariant") {
    import sqlImplicits._
    // standing src 1 has 6 RAW edges over 3 distinct dsts: raw routing
    // makes it a hub at hubLimit=4 in the standing build, but a fold that
    // touches it recovers the 3 DEDUPED edges + 1 delta = 4 ≤ limit, so
    // the fold re-routes it to the array layout while a full rebuild (7
    // raw) keeps it flat. The documented contract: layouts bound memory,
    // never change results — expand is bit-identical across the divergence.
    val standingE = (Seq.fill(2)(Seq((1L, 11L), (1L, 12L), (1L, 13L))).flatten ++
      Seq((2L, 1L))).toDF("src", "dst")
    val deltaE = Seq((1L, 14L)).toDF("src", "dst")
    val standing = buildOn(standingE, dedup = true, hubLimit = 4)
    assert(standing.hubCount === 1L)
    val rebuilt = buildOn(standingE.unionByName(deltaE), dedup = true, hubLimit = 4)
    try {
      val folded = foldOn(standing, deltaE, dedup = true, hubLimit = 4)
      try {
        assert(rebuilt.hubCount === 1L)
        assert(folded.hubCount === 0L) // tighter routing after dedup
        assert(edgesOf(folded) === edgesOf(rebuilt))
        assert(expandAll(folded, Seq(1L, 2L)) === expandAll(rebuilt, Seq(1L, 2L)))
      } finally folded.release()
    } finally { standing.release(); rebuilt.release() }
  }

  test("weighted fold preserves multiplicity and weights") {
    import sqlImplicits._
    val standingE = Seq((1L, 2L, 5L), (1L, 2L, 5L), (1L, 3L, 7L), (2L, 1L, 1L))
      .toDF("src", "dst", "w")
    val deltaE = Seq((1L, 4L, 9L), (3L, 1L, 2L)).toDF("src", "dst", "w")
    val standing = buildOn(standingE, dedup = false)
    val rebuilt = buildOn(standingE.unionByName(deltaE), dedup = false)
    def wedges(h: Adjacency.Hybrid): Seq[(Long, Long, Long)] =
      h.edges.select("src", "dst", "w").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    try {
      val folded = foldOn(standing, deltaE, dedup = false)
      try {
        assert(wedges(folded) === wedges(rebuilt))
        assert(folded.srcCount === rebuilt.srcCount)
      } finally folded.release()
    } finally { standing.release(); rebuilt.release() }
  }

  test("empty delta folds to the standing content; chained folds compose") {
    import sqlImplicits._
    val e0 = (1L to 10L).map(s => (s, s + 1)).toDF("src", "dst")
    val d1 = Seq((1L, 50L), (11L, 1L)).toDF("src", "dst")
    val d2 = Seq((11L, 2L), (5L, 60L)).toDF("src", "dst")
    val standing = buildOn(e0, dedup = true)
    try {
      val emptyFold = foldOn(standing, d1.limit(0), dedup = true)
      try assert(edgesOf(emptyFold) === edgesOf(standing))
      finally emptyFold.release()

      val f1 = foldOn(standing, d1, dedup = true)
      val f2 = try foldOn(f1, d2, dedup = true) finally f1.release()
      val rebuilt = buildOn(e0.unionByName(d1).unionByName(d2), dedup = true)
      try {
        assert(edgesOf(f2) === edgesOf(rebuilt))
        assert((f2.srcCount, f2.hubCount) === (rebuilt.srcCount, rebuilt.hubCount))
      } finally { f2.release(); rebuilt.release() }
    } finally standing.release()
  }

  test("the folded hybrid survives releasing the standing hybrid") {
    import sqlImplicits._
    val e0 = (1L to 20L).map(s => (s, s + 1)).toDF("src", "dst")
    val d1 = Seq((3L, 99L)).toDF("src", "dst")
    val standing = buildOn(e0, dedup = true)
    val folded = foldOn(standing, d1, dedup = true)
    standing.release() // the fold materialized its frames — must be safe
    try {
      assert(edgesOf(folded).size === 21)
      assert(expandAll(folded, Seq(3L)).nonEmpty)
    } finally folded.release()
  }
}
