package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import sqlImplicits._

  /** Brute per-node triangle counts: enumerate a<b<c triples over the
    * normalized undirected edge set. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = und.toSeq.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      if und((nodes(i), nodes(j)))
      k <- (j + 1) until nodes.size
      if und((nodes(j), nodes(k))) && und((nodes(i), nodes(k)))
    } {
      counts(nodes(i)) += 1; counts(nodes(j)) += 1; counts(nodes(k)) += 1
    }
    counts.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val mt = Triangles.perNode(edges.toDF("src", "dst"), "src", "dst")
    val got = mt.counts.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    mt.release()
    got
  }

  test("K5 clique: every node sits in C(4,2)=6 triangles") {
    val k5 = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)
    assert(run(k5) === (1L to 5L).map(_ -> 6L).toMap)
  }

  test("a star has no triangles; closing one spoke pair creates exactly one") {
    val star = (1L to 6L).map(i => (0L, i))
    assert(run(star) === Map.empty[Long, Long])
    assert(run(star :+ (1L, 2L)) === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("duplicate, reverse, and self edges collapse before counting") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (3L, 3L))
    assert(run(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches the brute triple enumeration on seeded random graphs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(300)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      assert(run(edges) === brute(edges), s"seed=$seed")
    }
  }

  test("hub skew: a high-degree hub over low-degree spokes stays bounded " +
       "by orientation (spoke-side pivots) and counts exactly") {
    // hub 0 connected to 500 spokes; consecutive spokes also chained, so
    // each chain edge closes one triangle through the hub. Orientation
    // pivots at the low-degree spokes, never fanning out of the hub.
    val n = 500
    val spokes = (1 to n).map(i => (0L, i.toLong))
    val chain = (1 until n).map(i => (i.toLong, (i + 1).toLong))
    val got = run(spokes ++ chain)
    assert(got(0L) === (n - 1).toLong)
    assert(got(1L) === 1L && got(n.toLong) === 1L)
    assert(got(2L) === 2L)
  }

  test("release drops the staged result (no cached-RDD accumulation)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val mt = Triangles.perNode(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"), "src", "dst")
    mt.counts.count()
    mt.release()
    assert(sc.getPersistentRDDs.size === before)
  }
}
