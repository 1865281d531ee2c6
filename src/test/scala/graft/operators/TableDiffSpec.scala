package graft.operators

import graft.SparkSpec

class TableDiffSpec extends SparkSpec {
  import sqlImplicits._

  test("diff classifies added/removed/changed/unchanged, null-safely") {
    val prev = Seq(
      (1L, Some("a"), Some(10)), // only in old → removed
      (2L, Some("b"), None),     // identical incl. null → unchanged
      (3L, Some("c"), Some(30)), // value change → changed
      (4L, Some("d"), Some(40))  // value → null is a CHANGE, not a match
    ).toDF("k", "v1", "v2")
    val next = Seq(
      (2L, Some("b"), None),
      (3L, Some("c"), Some(31)),
      (4L, None: Option[String], Some(40)),
      (5L, Some("e"), Some(50))  // only in new → added
    ).toDF("k", "v1", "v2")
    val out = TableDiff.diff(prev, next, Seq("k"), Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(out === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "changed", 5L -> "added"))
  }

  test("diff exposes old/new values for changed rows") {
    val prev = Seq((1L, 10)).toDF("k", "v")
    val next = Seq((1L, 11)).toDF("k", "v")
    val r = TableDiff.diff(prev, next, Seq("k"), Seq("v")).head()
    assert(r.getAs[Int]("v_old") === 10)
    assert(r.getAs[Int]("v_new") === 11)
    assert(r.getAs[String]("status") === "changed")
  }
}
