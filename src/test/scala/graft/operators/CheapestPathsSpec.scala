package graft.operators

import graft.SparkSpec

class CheapestPathsSpec extends SparkSpec {
  import sqlImplicits._

  /** Sequential FULL-relaxation Bellman-Ford: cost after round i = min
    * path weight over ≤ i edges — the invariant the frontier-optimized
    * operator must preserve. */
  private def brute(edges: Seq[(Long, Long, Long)], seeds: Set[Long],
                    rounds: Int): Map[Long, Long] = {
    var cost = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val cand = edges.flatMap { case (s, d, w) =>
        cost.get(s).map(c => d -> (c + w))
      }.groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).min }
      cost = (cost.keySet ++ cand.keySet).map { n =>
        n -> math.min(cost.getOrElse(n, Long.MaxValue),
          cand.getOrElse(n, Long.MaxValue))
      }.toMap
    }
    cost
  }

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                  rounds: Int): Map[Long, Long] = {
    val mc = CheapestPaths.relax(edges.toDF("src", "dst", "w"),
      "src", "dst", "w", seeds.toDF("node"), "node", rounds)
    val got = mc.costs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    mc.release()
    got
  }

  test("hand-computed: the cheap 3-edge detour beats the expensive " +
       "direct edge once rounds allow it") {
    // 1→4 direct costs 10; 1→2→3→4 costs 3. Round 1 sees 10, round 3
    // converges to 3 — the ≤ i-edges invariant, visible.
    val e = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    assert(run(e, Seq(1L), 1) === Map(1L -> 0L, 4L -> 10L, 2L -> 1L))
    assert(run(e, Seq(1L), 3) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("multi-source: each node takes the cheapest seed") {
    val e = Seq((1L, 2L, 5L), (9L, 2L, 1L), (2L, 3L, 1L))
    assert(run(e, Seq(1L, 9L), 3) ===
      Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("matches the sequential full-relaxation replay on seeded random " +
       "weighted digraphs (frontier optimization is exact)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(250)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong,
        (1 + rnd.nextInt(100)).toLong))
        .filter { case (a, b, _) => a != b }
      val ss = Set(1L, 2L)
      for (r <- Seq(1, 3, 6)) {
        assert(run(edges, ss.toSeq, r) === brute(edges, ss, r),
          s"seed=$seed rounds=$r")
      }
    }
  }

  test("zero-weight edges are legal; negative weights are refused loudly") {
    assert(run(Seq((1L, 2L, 0L)), Seq(1L), 2) === Map(1L -> 0L, 2L -> 0L))
    val before = spark.sparkContext.getPersistentRDDs.size
    val ex = intercept[Exception] {
      run(Seq((1L, 2L, -5L)), Seq(1L), 2)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("negative weight")), chain(ex).mkString(" | "))
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "a failed build must not strand persisted frames")
    // the refusal must not depend on the seeds reaching the adjacency:
    // an EMPTY seed set skips the relaxation loop entirely, but the
    // eager adjacency materialization still fires the guard
    val ex2 = intercept[Exception] {
      run(Seq((1L, 2L, -5L)), Seq.empty[Long], 2)
    }
    assert(chain(ex2).exists(_.contains("negative weight")),
      chain(ex2).mkString(" | "))
    assert(spark.sparkContext.getPersistentRDDs.size === before)
  }

  test("early exit on a quiet frontier equals the full-budget replay") {
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L))
    assert(run(e, Seq(1L), 10) === brute(e, Set(1L), 10))
  }

  test("hub stress: relaxation through a 5k-degree hub matches the " +
       "sequential replay") {
    // spoke 1 -> hub 0 (w=1) -> every spoke (w=1): all other spokes cost
    // 2 through the hub; the duplicate-free closed form checks the replay
    val n = 5000
    val star = (1 to n).flatMap(i => Seq((0L, i.toLong, 1L), (i.toLong, 0L, 1L)))
    val got = run(star, Seq(1L), 3)
    assert(got(1L) === 0L && got(0L) === 1L && got(2L) === 2L)
    assert(got.size === n + 1)
    assert(got === brute(star, Set(1L), 3))
  }

  test("release drops the persisted leaves (no cached-RDD accumulation)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val mc = CheapestPaths.relax(
      Seq((1L, 2L, 3L)).toDF("src", "dst", "w"), "src", "dst", "w",
      Seq(1L).toDF("node"), "node", 3)
    mc.costs.count()
    mc.release()
    assert(sc.getPersistentRDDs.size === before)
  }

  test("parameter guards reject degenerate configs") {
    val e = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val sd = Seq(1L).toDF("node")
    intercept[IllegalArgumentException](
      CheapestPaths.relax(e, "src", "dst", "w", sd, "node", 0))
    intercept[IllegalArgumentException](
      CheapestPaths.relax(e, "src", "dst", "w", sd, "node", 65))
  }
}
