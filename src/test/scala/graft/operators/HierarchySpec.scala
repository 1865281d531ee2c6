package graft.operators

import graft.SparkSpec

class HierarchySpec extends SparkSpec {
  import sqlImplicits._

  test("ancestors enumerates the full closure of a hand-checked tree") {
    //      1
    //     / \
    //    2   3
    //   /|   |
    //  4 5   6
    //  |
    //  7
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 3L), (7L, 4L))
      .toDF("child", "parent")
    val out = Hierarchy.ancestors(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = Set(
      (2L, 1L, 1L), (3L, 1L, 1L), (4L, 2L, 1L), (5L, 2L, 1L), (6L, 3L, 1L),
      (7L, 4L, 1L),
      (4L, 1L, 2L), (5L, 1L, 2L), (6L, 1L, 2L), (7L, 2L, 2L),
      (7L, 1L, 3L))
    assert(out === expected)
  }

  test("a DAG node reaches an ancestor once per distinct path") {
    // diamond: 4 → {2, 3} → 1 — node 4 reaches 1 twice at depth 2 (path
    // multiplicity, the recursive-CTE UNION ALL semantics)
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (4L, 3L)).toDF("c", "p")
    val out = Hierarchy.ancestors(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.count(_ == ((4L, 1L, 2L))) === 2)
  }

  test("dedupPaths: set semantics bound the frontier on diamond DAGs") {
    // two stacked diamonds: 6 → {4,5} → 3 → {1,2} → 0 — wait, build it
    // explicitly: 6→4, 6→5, 4→3, 5→3, 3→1, 3→2, 1→0, 2→0. Node 6 reaches
    // 0 along 4 distinct paths (2×2); UNION ALL semantics emit 4 rows,
    // set semantics exactly 1.
    val edges = Seq((6L, 4L), (6L, 5L), (4L, 3L), (5L, 3L),
      (3L, 1L), (3L, 2L), (1L, 0L), (2L, 0L)).toDF("c", "p")
    val all = Hierarchy.ancestors(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(all.count(_ == ((6L, 0L, 4L))) === 4, "UNION ALL: one per path")
    val dd = Hierarchy.ancestors(edges, dedupPaths = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dd.count(_ == ((6L, 0L, 4L))) === 1, "set semantics: one row")
    assert(dd.distinct.length === dd.length, "no duplicate rows at all")
  }

  test("a cycle fails loudly at the depth cap AND leaks no checkpoints") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("c", "p")
    val ex = intercept[IllegalArgumentException] {
      Hierarchy.ancestors(edges, maxDepth = 8)
    }
    assert(ex.getMessage.contains("maxDepth"))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "the failure path must free every level it checkpointed")
  }

  test("depth exactly equal to maxDepth is legal; one beyond is not") {
    val chain = Seq((2L, 1L), (3L, 2L), (4L, 3L)).toDF("c", "p") // depth 3
    assert(Hierarchy.ancestors(chain, maxDepth = 3).count() === 6)
    intercept[IllegalArgumentException] {
      Hierarchy.ancestors(chain, maxDepth = 2)
    }
  }

  test("empty edge input yields a usable empty result") {
    val out = Hierarchy.ancestors(
      Seq.empty[(Long, Long)].toDF("c", "p"))
    assert(out.count() === 0) // must not throw 'checkpoint block not found'
  }

  test("reliable-checkpoint mode: same closure, files written then cleaned") {
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (4L, 3L), (5L, 4L))
      .toDF("c", "p")
    val localMode = Hierarchy.ancestors(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-h").toFile
    graft.GraftSession.enableReliableCheckpoints(spark, dir.getAbsolutePath)
    try {
      val out = Hierarchy.ancestors(edges)
      val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(got === localMode, "both checkpoint modes must agree exactly")
      assert(CheckpointFiles.rddDirs(dir).nonEmpty,
        "reliable mode must write level checkpoints to the configured dir")
      Components.releaseCheckpoint(out)
      assert(CheckpointFiles.rddDirs(dir).isEmpty,
        "one release call must delete every level's checkpoint files")
    } finally spark.conf.set(Checkpoints.ReliableConf, "false")
  }

  test("releaseCheckpoint on the result frees every level's blocks") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = Hierarchy.ancestors(
      Seq((2L, 1L), (3L, 2L), (4L, 3L)).toDF("c", "p"))
    assert(out.count() === 6)
    assert((sc.getPersistentRDDs.keySet -- before).nonEmpty)
    Components.releaseCheckpoint(out)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "all level checkpoints must be freed by one release call")
  }
}
