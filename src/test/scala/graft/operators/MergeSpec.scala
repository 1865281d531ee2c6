package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch MERGE/upsert semantics (r8 verdict task 6): update, insert,
  * delete, within-batch last-writer-wins, NULL-key null-safety, and the
  * extraction contract with ExactlyOnceSink. */
class MergeSpec extends SparkSpec {
  import sqlImplicits._

  private def state(rows: (java.lang.Long, String, Int)*) =
    rows.toSeq.toDF("k", "v", "ver")

  test("upsert: matched keys replaced whole, unseen keys inserted, rest retained") {
    val target = state((1L, "a1", 1), (2L, "b1", 1), (3L, "c1", 1))
    val updates = state((2L, "b2", 2), (4L, "d1", 1))
    val got = Merge.upsert(target, updates, Seq("k"))
      .collect().map(r => (r.get(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((1L, "a1", 1), (2L, "b2", 2), (3L, "c1", 1), (4L, "d1", 1)))
  }

  test("upsert resolves many update rows per key by orderBy (desc, tiebreak)") {
    val target = state((1L, "a1", 1))
    val updates = Seq(
      (1L, "mid", 5), (1L, "latest", 9), (1L, "stale", 2),
      (2L, "tie-lo", 7), (2L, "tie-hi", 7) // equal ver: tiebreak on v
    ).toDF("k", "v", "ver")
    val got = Merge.upsert(target, updates, Seq("k"), orderBy = Seq("ver", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "latest"), (2L, "tie-lo"))) // 'tie-lo' > 'tie-hi' lexically
  }

  test("upsert matches NULL keys null-safely: one NULL row, upserted not accumulated") {
    val target = state((null, "n1", 1), (1L, "a1", 1))
    val updates = state((null, "n2", 2))
    val got = Merge.upsert(target, updates, Seq("k"))
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(got == Set((None, "n2"), (Some(1L), "a1")))
  }

  test("merge: a key whose latest intent is a tombstone deletes; earlier upserts lose") {
    val target = state((1L, "a1", 1), (2L, "b1", 1), (3L, "c1", 1))
    val updates = Seq(
      (1L, "a2", 2, false), (1L, "gone", 3, true),  // latest intent: delete
      (2L, "b-del", 2, true), (2L, "b2", 3, false), // latest intent: upsert
      (4L, "d1", 1, false)
    ).toDF("k", "v", "ver", "del")
    val got = Merge.merge(target, updates, Seq("k"),
        orderBy = Seq("ver"), deleteCol = "del")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "b2"), (3L, "c1"), (4L, "d1")))
  }

  test("upsert of an empty update batch is the identity") {
    val target = state((1L, "a1", 1))
    val got = Merge.upsert(target, target.limit(0), Seq("k"))
      .collect().map(_.toSeq).toSet
    assert(got == target.collect().map(_.toSeq).toSet)
  }

  test("repeated idempotent re-application converges (the sink's retry shape)") {
    val target = state((1L, "a1", 1), (2L, "b1", 1))
    val updates = state((2L, "b2", 2), (3L, "c1", 1))
    val once = Merge.upsert(target, updates, Seq("k"))
    val twice = Merge.upsert(once, updates, Seq("k"))
    assert(twice.collect().map(_.toSeq).toSet == once.collect().map(_.toSeq).toSet)
  }
}
