package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The hub-safety contract of the iterative graph family: sources whose
  * out-degree exceeds the hub limit are auto-routed through the flat
  * (src, dst) layout — their adjacency arrays are NEVER built — and the
  * routing is INVISIBLE in the results: every operator is bit-identical
  * whether a source went through the array or the flat path, because the
  * round arithmetic is the same integer algebra over either layout. */
class GraphHubSpec extends SparkSpec {
  import sqlImplicits._

  /** Star: hub 1 → spokes 2..n+1, plus back-edges from the first few
    * spokes and a separate tail chain so the graph isn't degenerate. */
  private def star(n: Int): Seq[(Long, Long)] =
    (2 to n + 1).map(i => (1L, i.toLong)) ++
      (2 to 5).map(i => (i.toLong, 1L)) ++
      Seq((n + 2L, n + 3L), (n + 3L, n + 4L), (n + 4L, n + 2L))

  private def collectRanks(mr: PageRank.ManagedRanks): Map[Long, (Long, Long)] = {
    val got = mr.ranks.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    mr.release()
    got
  }

  test("Adjacency.build routes a planted hub flat and never builds its array") {
    val e = star(5000).toDF("src", "dst")
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    val hyb = Adjacency.build(e, dedup = false, hubLimit = 1000L)
    try {
      assert(hyb.hubCount === 1L)
      // the hub source is absent from the array layout entirely
      assert(hyb.arrayAdj.filter(col("src") === 1L).count() === 0L)
      assert(hyb.flat.filter(col("src") =!= 1L).count() === 0L)
      assert(hyb.flat.count() === 5000L)
      assert(hyb.hubDeg.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        === Seq((1L, 5000L)))
      // degree bookkeeping is layout-blind
      assert(hyb.outDegrees.count() === hyb.srcs.count())
      // expand over the hub source yields its full neighborhood as flat rows
      val per = Seq((1L, 7L)).toDF("src", "payload")
      assert(hyb.expand(per).count() === 5000L)
    } finally hyb.release()
  }

  test("Adjacency: shuffle fallback above the broadcast bar is " +
       "bit-identical to the hinted path, and payload collisions refuse") {
    val e = star(5000).toDF("src", "dst")
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    // broadcastRowLimit=0 forces the hub-list semi-join AND expand's
    // hubDeg join onto the shuffle path the >1M-hub regime would take
    val shuffled = Adjacency.build(e, dedup = false, hubLimit = 1000L,
      broadcastRowLimit = 0L)
    val hinted = Adjacency.build(e, dedup = false, hubLimit = 1000L)
    try {
      assert(shuffled.hubCount === 1L && hinted.hubCount === 1L)
      val per = Seq((1L, 7L), (2L, 9L)).toDF("src", "payload")
      def rows(h: Adjacency.Hybrid) = h.expand(per)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(rows(shuffled) === rows(hinted))
      val badPayload = Seq((1L, 7L)).toDF("src", "dst")
      val ex = intercept[IllegalArgumentException](hinted.expand(badPayload))
      assert(ex.getMessage.contains("collide"))
    } finally { shuffled.release(); hinted.release() }
  }

  test("PageRank: flat-routed hub is bit-identical to the array layout") {
    val edges = star(20000).toDF("src", "dst")
    val viaFlat = collectRanks(PageRank.ranks(edges, "src", "dst",
      iters = 3, hubLimit = 100L))
    val viaArray = collectRanks(PageRank.ranks(edges, "src", "dst",
      iters = 3, hubLimit = Long.MaxValue))
    assert(viaFlat === viaArray)
    assert(viaFlat(1L)._2 === 20000L) // hub outdeg survives the routing
  }

  test("PageRank: a planted 1M-degree hub routes flat at the DEFAULT limit " +
       "and stays bit-identical to the forced-array run") {
    // 1M spokes: the degree regime where a single adjacency array row is
    // the scale hazard (at 10^8 it would OOM an executor) — the default
    // hubLimit must route it without being asked
    val n = 1000000L
    val spokes = spark.range(2L, n + 2L)
      .select(lit(1L).as("src"), col("id").as("dst"))
    val back = Seq((2L, 1L), (3L, 1L)).toDF("src", "dst")
    val edges = spokes.unionByName(back)
    val hyb = Adjacency.build(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")), dedup = false,
      hubLimit = Adjacency.DefaultHubLimit)
    val routedFlat = hyb.hubCount
    hyb.release()
    assert(routedFlat === 1L, "default limit must route a 1M-degree source flat")
    val viaDefault = collectRanks(PageRank.ranks(edges, "src", "dst", iters = 2))
    val viaArray = collectRanks(PageRank.ranks(edges, "src", "dst", iters = 2,
      hubLimit = Long.MaxValue))
    assert(viaDefault.size === (n + 1).toInt)
    assert(viaDefault === viaArray)
  }

  test("LabelPropagation: hub routing is bit-identical (incl. dedupEdges)") {
    val base = star(8000)
    val withDups = base ++ base.take(500) // repeats exercise both dedup modes
    for (dedup <- Seq(true, false)) {
      val edges = withDups.toDF("src", "dst")
      val a = LabelPropagation.labels(edges, "src", "dst", iters = 3,
        dedupEdges = dedup, hubLimit = 100L)
      val gotFlat = a.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      a.release()
      val b = LabelPropagation.labels(edges, "src", "dst", iters = 3,
        dedupEdges = dedup, hubLimit = Long.MaxValue)
      val gotArr = b.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      b.release()
      assert(gotFlat === gotArr, s"dedup=$dedup")
    }
  }

  test("BfsHops: rings through a hub frontier are bit-identical") {
    // seed -> hub -> 8000 spokes; one spoke continues to a tail
    val edges = (Seq((100L, 1L)) ++ star(8000) ++ Seq((2L, 9999L)))
      .toDF("src", "dst")
    val seeds = Seq(100L).toDF("seed")
    def run(lim: Long): Map[Long, Int] = {
      val md = BfsHops.hops(edges, "src", "dst", seeds, "seed",
        maxHops = 4, hubLimit = lim)
      val got = md.dists.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      md.release()
      got
    }
    val flatGot = run(100L)
    assert(flatGot === run(Long.MaxValue))
    assert(flatGot(100L) === 0 && flatGot(1L) === 1 && flatGot(2L) === 2 &&
      flatGot(9999L) === 3)
  }

  test("CheapestPaths: weighted hub relaxation is bit-identical") {
    // hub 1 fans out to 6000 spokes at increasing weights; a cheap chain
    // undercuts the direct hub edge for one target
    val fan = (2 to 6001).map(i => (1L, i.toLong, (i % 97 + 1).toLong))
    val chain = Seq((1L, 7000L, 1L), (7000L, 2L, 0L))
    val edges = (fan ++ chain).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("seed")
    def run(lim: Long): Map[Long, Long] = {
      val mc = CheapestPaths.relax(edges, "src", "dst", "w", seeds, "seed",
        rounds = 3, hubLimit = lim)
      val got = mc.costs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      mc.release()
      got
    }
    val flatGot = run(100L)
    assert(flatGot === run(Long.MaxValue))
    assert(flatGot(2L) === 1L) // via the chain (1+0), not the direct fan edge
  }

  test("negative-weight refusal still fires when the hub path carries it") {
    val edges = ((2 to 300).map(i => (1L, i.toLong, 1L)) ++ Seq((1L, 301L, -5L)))
      .toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      CheapestPaths.relax(edges, "src", "dst", "w",
        Seq(1L).toDF("seed"), "seed", rounds = 2, hubLimit = 10L)
    }
    assert(ex.getMessage.contains("negative weight"))
  }

  test("symmetric assertion: a lying caller fails loudly under the check conf") {
    val lying = Seq((1L, 2L)).toDF("src", "dst") // node 2 is dst-only
    spark.conf.set(Adjacency.SymmetryCheckConf, "true")
    try {
      val ex = intercept[IllegalArgumentException] {
        PageRank.ranks(lying, "src", "dst", iters = 1, symmetric = true)
      }
      assert(ex.getMessage.contains("occur only as a dst"))
      val ex2 = intercept[IllegalArgumentException] {
        LabelPropagation.labels(lying, "src", "dst", iters = 1, symmetric = true)
      }
      assert(ex2.getMessage.contains("occur only as a dst"))
      // a truthful caller passes the audit unchanged
      val sym = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
      val mr = PageRank.ranks(sym, "src", "dst", iters = 1, symmetric = true)
      assert(mr.ranks.count() === 2L)
      mr.release()
    } finally spark.conf.unset(Adjacency.SymmetryCheckConf)
  }

  test("a failed audit strands no persisted frames (sweepingOnFailure)") {
    val lying = Seq((1L, 2L)).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    spark.conf.set(Adjacency.SymmetryCheckConf, "true")
    try {
      intercept[IllegalArgumentException] {
        PageRank.ranks(lying, "src", "dst", iters = 1, symmetric = true)
      }
    } finally spark.conf.unset(Adjacency.SymmetryCheckConf)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
  }
}
