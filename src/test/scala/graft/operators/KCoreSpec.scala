package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import sqlImplicits._

  /** Sequential replay of the peel semantics: round 0 thresholds full
    * degrees, each round recounts inside the previous survivor set. */
  private def brute(edges: Seq[(Long, Long)], k: Int,
                    rounds: Int): Map[Long, Long] = {
    val und = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter { case (a, b) => a != b }.distinct
    def degs(e: Seq[(Long, Long)]): Map[Long, Long] =
      e.flatMap { case (a, b) => Seq(a, b) }.groupBy(identity)
        .map { case (n, xs) => n -> xs.size.toLong }
    var surv = degs(und).filter(_._2 >= k)
    for (_ <- 1 to rounds) {
      val e = und.filter { case (a, b) => surv.contains(a) && surv.contains(b) }
      surv = degs(e).filter(_._2 >= k)
    }
    surv
  }

  private def run(edges: Seq[(Long, Long)], k: Int,
                  rounds: Int): (Map[Long, Long], Boolean) = {
    val mc = KCore.core(edges.toDF("src", "dst"), "src", "dst", k, rounds)
    val got = mc.core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val conv = mc.converged
    mc.release()
    (got, conv)
  }

  test("triangle with a tail: the 2-core is the triangle (hand-computed)") {
    // 1-2-3 triangle, tail 3-4-5. Round 0 drops 5 (deg 1); round 1 drops 4.
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val (got, conv) = run(e, 2, 4)
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(conv)
  }

  test("rounds is a fixed budget: a partial peel matches the replay at " +
       "that budget, not the fixed point") {
    // chain of tails peels one node per round: long path into a clique
    val clique = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 10L))
    val e = clique ++ path
    for (r <- 1 to 5) {
      val (got, _) = run(e, 2, r)
      assert(got === brute(e, 2, r), s"rounds=$r")
    }
    // the full peel (budget past depth) is the true 2-core: the clique
    val (fin, conv) = run(e, 2, 6)
    assert(conv)
    assert(fin.keySet === Set(10L, 11L, 12L, 13L))
  }

  test("matches the sequential replay on seeded random graphs across k") {
    for (seed <- 1 to 3; k <- Seq(2, 3, 4)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(160)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val (got, _) = run(edges, k, 6)
      assert(got === brute(edges, k, 6), s"seed=$seed k=$k")
    }
  }

  test("total collapse converges to the empty core") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val (got, conv) = run(path, 2, 5)
    assert(got === Map.empty[Long, Long])
    assert(conv)
  }

  test("converged=false when the budget stops mid-peel") {
    val clique = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val e = clique ++ Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 10L))
    val (_, conv) = run(e, 2, 2)
    assert(!conv)
  }

  test("skew stress: 5000 degree-1 spokes peel in one round, the clique " +
       "core survives exactly") {
    val spokes = (1 to 5000).map(i => (0L, 10000L + i))
    val clique = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val (got, conv) = run(clique ++ spokes, 3, 6)
    assert(conv)
    // node 0 carries the 5000 spokes but only its 4 clique edges survive
    assert(got === (0L to 4L).map(_ -> 4L).toMap)
  }

  test("release drops the persisted leaves (no cached-RDD accumulation)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val mc = KCore.core(Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"),
      "src", "dst", k = 2, rounds = 3)
    mc.core.count()
    mc.release()
    assert(sc.getPersistentRDDs.size === before)
  }

  test("parameter guards reject degenerate configs") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](KCore.core(e, "src", "dst", 0, 3))
    intercept[IllegalArgumentException](KCore.core(e, "src", "dst", 2, 0))
    intercept[IllegalArgumentException](KCore.core(e, "src", "dst", 2, 65))
  }
}
