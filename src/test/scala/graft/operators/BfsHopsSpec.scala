package graft.operators

import graft.SparkSpec

class BfsHopsSpec extends SparkSpec {
  import sqlImplicits._

  /** Sequential BFS replay: ring-by-ring min-hop distances. */
  private def brute(edges: Seq[(Long, Long)], seeds: Set[Long],
                    maxHops: Int): Map[Long, Int] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    var known = seeds.map(_ -> 0).toMap
    var frontier = seeds
    var d = 0
    while (d < maxHops && frontier.nonEmpty) {
      d += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- known.keySet
      known = known ++ next.map(_ -> d)
      frontier = next
    }
    known
  }

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  maxHops: Int): Map[Long, Int] = {
    val md = BfsHops.hops(edges.toDF("src", "dst"), "src", "dst",
      seeds.toDF("node"), "node", maxHops)
    val got = md.dists.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    md.release()
    got
  }

  test("hand-computed path: rings at the right hops, truncation at budget") {
    // path 1-2-3-4-5 (directed), seed {1}
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(path, Seq(1L), 6) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    assert(run(path, Seq(1L), 2) === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("multi-source: a node takes the distance of its NEAREST seed") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 4L))
    assert(run(path, Seq(1L, 5L), 6) ===
      Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("a seed absent from the graph still reports dist 0 and reaches " +
       "nothing") {
    assert(run(Seq((1L, 2L)), Seq(1L, 99L), 3) ===
      Map(1L -> 0, 99L -> 0, 2L -> 1))
  }

  test("directionality respected: upstream nodes are not reached") {
    val got = run(Seq((1L, 2L), (3L, 2L)), Seq(1L), 4)
    assert(got === Map(1L -> 0, 2L -> 1))
  }

  test("matches the sequential replay on seeded random digraphs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(200)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }.distinct
      val ss = Set(1L, 2L, 3L)
      assert(run(edges, ss.toSeq, 5) === brute(edges, ss, 5), s"seed=$seed")
    }
  }

  test("early exit on an empty frontier equals the full-budget replay") {
    // two disconnected dyads; everything reached by hop 1, budget 10
    val e = Seq((1L, 2L), (3L, 4L))
    assert(run(e, Seq(1L, 3L), 10) === brute(e, Set(1L, 3L), 10))
  }

  test("hub stress: one frontier round fans out to 20k spokes and the " +
       "ring histogram is exact") {
    val n = 20000
    val star = (1 to n).map(i => (0L, i.toLong))
    val got = run(star, Seq(0L), 3)
    assert(got.size === n + 1)
    assert(got(0L) === 0 && got(n.toLong) === 1)
    assert(got.values.count(_ == 1) === n)
  }

  test("release drops the persisted leaves (no cached-RDD accumulation)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val md = BfsHops.hops(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"),
      "src", "dst", Seq(1L).toDF("node"), "node", 4)
    md.dists.count()
    md.release()
    assert(sc.getPersistentRDDs.size === before)
  }

  test("parameter guards reject degenerate configs") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val sd = Seq(1L).toDF("node")
    intercept[IllegalArgumentException](BfsHops.hops(e, "src", "dst", sd, "node", 0))
    intercept[IllegalArgumentException](BfsHops.hops(e, "src", "dst", sd, "node", 65))
  }
}
