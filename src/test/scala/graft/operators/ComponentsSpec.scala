package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import sqlImplicits._

  /** Reference union-find, the ground truth the distributed algorithm must
    * reproduce: every node labeled with its component's minimum id. */
  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain graph collapses to one component rooted at the min") {
    val edges = (1L until 8L).map(i => (i, i + 1))
    assert(run(edges) === (1L to 8L).map(_ -> 1L).toMap)
  }

  test("two components, arbitrary edge orientation, self-loops ignored") {
    val edges = Seq((5L, 2L), (2L, 9L), (7L, 7L), (30L, 10L), (10L, 40L))
    assert(run(edges) === Map(2L -> 2L, 5L -> 2L, 9L -> 2L,
      10L -> 10L, 30L -> 10L, 40L -> 10L))
  }

  test("empty edge set yields empty result") {
    val empty = Seq.empty[(Long, Long)]
    assert(run(empty) === Map.empty[Long, Long])
  }

  test("matches brute-force union-find on seeded random graphs") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 120
      val edges = Seq.fill(140)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(run(edges) === bruteComponents(edges), s"seed=$seed")
    }
  }

  test("dupClusters assigns singletons to themselves and marks canonicals") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((2L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val got = Components.dupClusters(nodes, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set((1L, 1L, true), (2L, 2L, true), (3L, 3L, true),
      (4L, 2L, false), (5L, 2L, false)))
  }

  test("star-shaped component with a late-arriving smaller root") {
    // hub 50 connected to many leaves, then a bridge to node 1: the whole
    // star must relabel to 1 (exercises multiple alternating rounds).
    val star = (51L to 70L).map(v => (50L, v))
    val edges = star :+ (70L, 1L)
    val got = run(edges)
    assert(got.values.toSet === Set(1L))
    assert(got.keySet === (51L to 70L).toSet + 50L + 1L)
  }

  test("keepList: one survivor per cluster, chosen by (quality DESC, id ASC)") {
    import spark.implicits._
    // two clusters {1,2,3} and {10,11}, singletons 20, 21
    val nodes = Seq(
      (1L, 5L), (2L, 9L), (3L, 9L),   // tie on quality 9 → id 2 wins
      (10L, 1L), (11L, 7L),
      (20L, 4L), (21L, 0L)
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Components.keepList(nodes, "doc_id", "quality", pairs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out.size === 7)
    // cluster {1,2,3}: min-id cluster label 1, canonical = 2 (quality tie,
    // smaller id); only 2 keeps
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id)._1 === 1L); assert(out(id)._2 === 2L)
      assert(out(id)._3 === (id == 2L))
    }
    // cluster {10,11}: canonical 11 (higher quality)
    Seq(10L, 11L).foreach { id =>
      assert(out(id)._1 === 10L); assert(out(id)._2 === 11L)
      assert(out(id)._3 === (id == 11L))
    }
    // singletons keep themselves
    Seq(20L, 21L).foreach { id =>
      assert(out(id) === ((id, id, true)))
    }
  }

  test("reliable-checkpoint mode: identical labels, files written then cleaned") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 3L), (40L, 30L))
    val localMode = run(edges)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-c").toFile
    graft.GraftSession.enableReliableCheckpoints(spark, dir.getAbsolutePath)
    try {
      val labels = Components.connectedComponents(edges.toDF("src", "dst"))
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === localMode, "both checkpoint modes must agree exactly")
      // only the CONVERGED round may still hold files — the loop deletes
      // each superseded round as soon as its successor is durable
      assert(CheckpointFiles.rddDirs(dir).nonEmpty,
        "reliable mode must write round checkpoints to the configured dir")
      Components.releaseCheckpoint(labels)
      assert(CheckpointFiles.rddDirs(dir).isEmpty,
        "release must delete the reliable checkpoint files")
    } finally spark.conf.set(Checkpoints.ReliableConf, "false")
  }

  test("releaseCheckpoint frees localCheckpoint blocks that unpersist can't") {
    val sc = spark.sparkContext
    def persistedIds = sc.getPersistentRDDs.keySet
    val before = persistedIds
    val cp = Seq((1L, 2L), (2L, 3L)).toDF("a", "b").localCheckpoint()
    val added = persistedIds -- before
    assert(added.nonEmpty, "localCheckpoint must persist an internal RDD")
    cp.unpersist() // the trap: Dataset.unpersist is a no-op for checkpoints
    assert((persistedIds -- before) === added,
      "precondition: plain unpersist() must NOT free checkpoint blocks")
    Components.releaseCheckpoint(cp)
    assert((persistedIds -- before).isEmpty,
      "releaseCheckpoint must drop the checkpoint's persisted RDD")
  }

  /** Fold ≡ full rebuild: the incremental identity. */
  private def foldVsRebuild(standing: Seq[(Long, Long)],
                            delta: Seq[(Long, Long)]): Unit = {
    val labels0 = Components.connectedComponents(standing.toDF("src", "dst"))
    val folded = Components.foldEdges(labels0, delta.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded === bruteComponents(standing ++ delta),
      s"standing=$standing delta=$delta")
  }

  test("foldEdges: a delta edge merging two standing components relabels " +
       "every member of the larger-label side") {
    foldVsRebuild(Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)),
      Seq((3L, 12L)))
  }

  test("foldEdges: delta introduces brand-new nodes (new-new and new-old edges)") {
    foldVsRebuild(Seq((1L, 2L), (7L, 8L)),
      Seq((100L, 101L), (101L, 2L), (200L, 201L)))
  }

  test("foldEdges: delta edges inside one standing component are no-ops " +
       "(contract to self-loops, zero relabelling)") {
    foldVsRebuild(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq((2L, 4L), (1L, 3L)))
  }

  test("foldEdges: empty delta returns the standing labelling unchanged") {
    foldVsRebuild(Seq((5L, 2L), (30L, 10L)), Seq.empty)
  }

  test("foldEdges: adversarial merge chain — one delta batch strings every " +
       "standing component together through fresh nodes") {
    // standing: 10 disjoint pairs; delta: a chain of NEW nodes welding all
    // of them into one component (the transitively-composed remap case:
    // the contracted CC must converge across the whole chain, not one hop)
    val standing = (0 until 10).map(i => (100L * i + 1, 100L * i + 2))
    val delta = (0 until 9).map(i => (100L * i + 2, 1000L + i)) ++
      (0 until 9).map(i => (1000L + i, 100L * (i + 1) + 1))
    foldVsRebuild(standing, delta)
  }

  test("foldEdges matches full rebuild on seeded random standing/delta splits") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 80
      val all = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val (standing, delta) = all.partition(_ => rnd.nextBoolean())
      foldVsRebuild(standing, delta)
    }
  }
}
