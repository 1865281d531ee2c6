package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import sqlImplicits._

  private val Scale = 1000000000L

  private def brute(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    BrutePageRank.ranks(edges, iters)

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val mr = PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters)
    val got = mr.ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    mr.release()
    got
  }

  test("uniform cycle is a fixed point: every rank stays at scale") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(cycle, 5) === Map(1L -> Scale, 2L -> Scale, 3L -> Scale))
  }

  test("dangling node receives but never emits (hand-computed)") {
    // a -> b, b dangling. r1(a)=0.15e9; r1(b)=0.15e9+0.85e9=1e9.
    // r2(a)=0.15e9; r2(b)=0.15e9 + (0.15e9*85)//100 = 277500000.
    val e = Seq((1L, 2L))
    assert(run(e, 2) === Map(1L -> 150000000L, 2L -> 277500000L))
  }

  test("matches brute-force fixed-point replay on seeded random graphs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      assert(run(edges, 4) === brute(edges, 4), s"seed=$seed")
    }
  }

  test("outdeg column reports 0 for dangling nodes") {
    val mr = PageRank.ranks(Seq((1L, 2L), (1L, 3L)).toDF("src", "dst"),
      "src", "dst", iters = 1)
    val deg = mr.ranks.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    mr.release()
    assert(deg === Map(1L -> 2L, 2L -> 0L, 3L -> 0L))
  }

  test("dedupEdges collapses repeats; default keeps multiplicity") {
    // 1->2 twice, 1->3 once. Deduped: outdeg(1)=2, both get r/2.
    // With multiplicity: outdeg(1)=3, node 2 gets 2*(r div 3).
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 3L))
    val mrD = PageRank.ranks(dup.toDF("src", "dst"), "src", "dst",
      iters = 1, dedupEdges = true)
    val gotD = mrD.ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    mrD.release()
    assert(gotD === run(Seq((1L, 2L), (1L, 3L)), 1))
    val mrM = PageRank.ranks(dup.toDF("src", "dst"), "src", "dst", iters = 1)
    val gotM = mrM.ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    mrM.release()
    val third = Scale / 3
    assert(gotM === Map(
      1L -> 150000000L,
      2L -> (150000000L + 2 * third * 85 / 100),
      3L -> (150000000L + third * 85 / 100)))
  }

  test("symmetric contract gives the general path's exact result on a " +
       "symmetrized graph") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 5L), (5L, 3L))
    val mrS = PageRank.ranks(edges.toDF("src", "dst"), "src", "dst",
      iters = 3, symmetric = true)
    val gotS = mrS.ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    mrS.release()
    assert(gotS === run(edges, 3))
  }

  test("personalized: teleport restarts only at the seeds (hand-computed " +
       "cycle) and matches the shared brute replay on random graphs") {
    // cycle 1->2->3->1, seed {1}: r0 = (1e9, 0, 0);
    // r1(1) = 0.15e9 + 0.85*r0(3) = 0.15e9; r1(2) = 0 + 0.85e9; r1(3) = 0
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val seeds1 = Seq(1L).toDF("node")
    val mr = PageRank.personalizedRanks(cycle.toDF("src", "dst"),
      "src", "dst", seeds1, "node", iters = 1)
    val got = mr.ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    mr.release()
    assert(got === Map(1L -> 150000000L, 2L -> 850000000L, 3L -> 0L))
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(150)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter { case (a, b) => a != b }.distinct
      val ss = Set(1L, 2L, 3L)
      val mrp = PageRank.personalizedRanks(edges.toDF("src", "dst"),
        "src", "dst", (ss + 999L).toSeq.toDF("node"), "node", iters = 4)
      val gp = mrp.ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      mrp.release()
      assert(gp === BrutePageRank.personalized(edges, 4, seeds = Some(ss)),
        s"seed=$seed")
      // a seed absent from the graph is ignored, not invented
      assert(!gp.contains(999L))
    }
  }

  test("hub stress: a 20k-degree star (the documented adjacency worst " +
       "case) completes and matches the sequential replay") {
    val n = 20000
    val star = (1 to n).flatMap(i => Seq((0L, i.toLong), (i.toLong, 0L)))
    val mr = PageRank.ranks(star.toDF("src", "dst"), "src", "dst",
      iters = 2, symmetric = true)
    val got = mr.ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    mr.release()
    val expect = BrutePageRank.ranks(star, 2)
    assert(got.size === n + 1)
    assert(got(0L) === expect(0L))
    assert(got(5L) === expect(5L))
    assert(got === expect)
  }

  test("empty edge set yields an empty rank frame") {
    assert(run(Seq.empty[(Long, Long)], 3) === Map.empty[Long, Long])
  }

  test("overflow raises a readable error instead of wrapping negative") {
    // legal scale (1e17 < 2^63/85), but 95 spokes feeding one hub push the
    // inflow sum past 2^63 — it wraps negative and the m<0 guard fires
    val before = spark.sparkContext.getPersistentRDDs.size
    val spokes = (1 to 95).flatMap(i => Seq((i.toLong, 0L), (0L, i.toLong)))
    val e = spokes.toDF("src", "dst")
    val ex = intercept[Exception](
      PageRank.ranks(e, "src", "dst", iters = 1,
        scale = 100000000000000000L))
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    // two hard-error layers, either satisfies the no-silent-wrap contract:
    // the engine's ANSI mode throws on the inflow SUM itself
    // (ARITHMETIC_OVERFLOW); the in-plan guard catches the damping
    // multiply with the domain-specific message
    assert(chain(ex).exists(m => m.contains("PageRank overflow") ||
      m.contains("ARITHMETIC_OVERFLOW")), chain(ex).mkString(" | "))
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "a failed build must not strand persisted frames")
  }

  test("parameter guards reject degenerate configs") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](PageRank.ranks(e, "src", "dst", 0))
    intercept[IllegalArgumentException](PageRank.ranks(e, "src", "dst", 3, scale = 50L))
    intercept[IllegalArgumentException](PageRank.ranks(e, "src", "dst", 3, scale = 101L))
    // a scale whose damping base would wrap driver-side is refused up front
    intercept[IllegalArgumentException](
      PageRank.ranks(e, "src", "dst", 3, scale = 9000000000000000000L))
  }

  test("release drops the persisted leaves (no cached-RDD accumulation)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val mr = PageRank.ranks(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
      "src", "dst", iters = 2)
    mr.ranks.count()
    mr.release()
    assert(sc.getPersistentRDDs.size === before)
  }
}
