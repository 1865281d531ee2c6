package graft.operators

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {
  import sqlImplicits._

  /** Single-threaded replay of the operator's exact semantics: synchronous
    * rounds, (max count, min label) tie-break, keep-previous on no
    * in-edges. */
  private def brute(edges: Seq[(Long, Long)], iters: Int,
                    dedup: Boolean = false): Map[Long, Long] = {
    val e = if (dedup) edges.distinct else edges
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      val votes = e.groupBy(_._2).map { case (d, es) =>
        val counts = es.map(x => lab(x._1)).groupBy(identity)
          .map { case (l, c) => (l, c.size) }
        d -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
      lab = nodes.map(n => n -> votes.getOrElse(n, lab(n))).toMap
    }
    lab
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
                  dedup: Boolean = false): Map[Long, Long] = {
    val ml = LabelPropagation.labels(edges.toDF("src", "dst"), "src", "dst",
      iters, dedupEdges = dedup)
    val got = ml.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ml.release()
    got
  }

  test("two symmetrized cliques joined by a bridge resolve to min-label " +
       "communities (hand-computed)") {
    // clique {1,2,3}, clique {10,11,12}, bridge 3-10. After round 1 every
    // clique node holds its clique's min label (each in-neighbor label
    // occurs once → min wins): 1,2,3 -> 1 except 3's voters {1,2,10} -> 1;
    // 10,11,12 -> 10 except 10's voters {3,11,12} -> 3. Round 2: the
    // bridge keeps pulling, but clique majorities dominate.
    def sym(ps: Seq[(Long, Long)]) = ps.flatMap(p => Seq(p, p.swap))
    val e = sym(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)))
    val got = run(e, 3)
    assert(got === brute(e, 3))
    assert(got(1L) === 1L && got(2L) === 1L)
    assert(got(11L) === got(12L))
  }

  test("tie-break picks the smallest label at equal multiplicity") {
    // 5 <- {7, 9}: one vote each for label 7 and 9 → min label 7 wins
    val e = Seq((7L, 5L), (9L, 5L))
    assert(run(e, 1)(5L) === 7L)
  }

  test("a node with no in-edges keeps its previous label") {
    // directed 1 -> 2: node 1 has no in-votes in any round
    val got = run(Seq((1L, 2L)), 3)
    assert(got(1L) === 1L)
    assert(got(2L) === 1L)
  }

  test("matches the sequential replay on seeded random digraphs, with and " +
       "without dedupEdges") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      assert(run(edges, 4) === brute(edges, 4), s"seed=$seed multiplicity")
      assert(run(edges, 4, dedup = true) === brute(edges, 4, dedup = true),
        s"seed=$seed dedup")
    }
  }

  test("multiplicity counts when dedupEdges is off (repeated edge = " +
       "repeated vote)") {
    // votes on 5: label 7 twice (repeat), label 3 once → 7 wins despite 3<7
    val e = Seq((7L, 5L), (7L, 5L), (3L, 5L))
    assert(run(e, 1)(5L) === 7L)
    assert(run(e, 1, dedup = true)(5L) === 3L)
  }

  test("symmetric contract gives the general path's exact result on a " +
       "symmetrized graph") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (4L, 3L), (3L, 4L))
    val ml = LabelPropagation.labels(e.toDF("src", "dst"), "src", "dst",
      iters = 3, symmetric = true)
    val got = ml.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ml.release()
    assert(got === brute(e, 3))
  }

  test("hub stress: a 20k-degree star (the documented adjacency worst " +
       "case) completes and matches the sequential replay") {
    // symmetrized star: round 1 gives every spoke the hub's label (their
    // only voter) and the hub the min spoke label; round 2 re-floods.
    val n = 20000
    val star = (1 to n).flatMap(i => Seq((0L, i.toLong), (i.toLong, 0L)))
    val got = run(star, 2)
    assert(got.size === n + 1)
    assert(got(1L) === brute(star, 2)(1L))
    assert(got === brute(star, 2))
  }

  test("release drops the persisted leaves (no cached-RDD accumulation)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val ml = LabelPropagation.labels(
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), "src", "dst", iters = 2)
    ml.labels.count()
    ml.release()
    assert(sc.getPersistentRDDs.size === before)
  }

  test("parameter guards reject degenerate configs") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](
      LabelPropagation.labels(e, "src", "dst", 0))
    intercept[IllegalArgumentException](
      LabelPropagation.labels(e, "src", "dst", 65))
  }
}
