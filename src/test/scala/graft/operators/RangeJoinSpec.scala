package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import sqlImplicits._

  test("banded range join equals the naive cross-join formulation") {
    val points = (0L to 100L by 7).map(p => (p, s"p$p")).toDF("x", "pid")
    val intervals = Seq(
      (0L, 10L, "a"), (5L, 40L, "b"), (40L, 41L, "c"),
      (90L, 200L, "d"), (50L, 50L, "empty"), (60L, 64L, "boundary")
    ).toDF("s", "e", "iid")

    val naive = points.crossJoin(intervals)
      .filter($"x" >= $"s" && $"x" < $"e")
      .select("pid", "iid").collect().map(_.toSeq).toSet

    for (width <- Seq(1L, 3L, 10L, 64L, 1000L)) {
      val banded = RangeJoin.pointInInterval(points, intervals, "x", "s", "e", width)
        .select("pid", "iid").collect().map(_.toSeq).toSet
      assert(banded === naive, s"bucketWidth=$width")
    }
  }

  test("exclusive end: a point on the interval end does not match") {
    val points = Seq((10L, "p")).toDF("x", "pid")
    val intervals = Seq((0L, 10L, "i")).toDF("s", "e", "iid")
    assert(RangeJoin.pointInInterval(points, intervals, "x", "s", "e", 4).count() === 0)
  }
}
