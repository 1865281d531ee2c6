package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("intervalOverlap equals the naive inequality join on seeded random " +
       "intervals, each pair exactly once") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val a = Seq.tabulate(60) { i =>
        val s0 = rnd.nextInt(300).toLong; (i.toLong, s0, s0 + 1 + rnd.nextInt(40))
      }.toDF("a_id", "a_s", "a_e")
      val b = Seq.tabulate(80) { i =>
        val s0 = rnd.nextInt(300).toLong; (i.toLong, s0, s0 + 1 + rnd.nextInt(40))
      }.toDF("b_id", "b_s", "b_e")
      val got = RangeJoin.intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e", 16)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val brute = a.crossJoin(b)
        .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.sorted.toSeq === brute.sorted.toSeq, s"seed=$seed")
      assert(got.length === got.distinct.length,
        s"seed=$seed: multi-bucket pairs must emit exactly once")
    }
  }

  test("intervalOverlap: touching half-open intervals do not overlap; " +
       "empty intervals match nothing; disjoint columns enforced") {
    val a = Seq((1L, 0L, 10L), (2L, 50L, 50L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((1L, 10L, 20L), (2L, 40L, 60L)).toDF("b_id", "b_s", "b_e")
    val got = RangeJoin.intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e", 8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // [0,10) vs [10,20) touch: no overlap; [50,50) is empty: no match
    assert(got.toSeq === Seq.empty)
    intercept[IllegalArgumentException](
      RangeJoin.intervalOverlap(a, a, "a_s", "a_e", "a_s", "a_e", 8))
  }

  test("fractional columns are refused: integral banding would bucket " +
       "them wrong and silently drop matches") {
    val fa = Seq((1L, 5.0, 10.5)).toDF("a_id", "a_s", "a_e")
    val fb = Seq((1L, 10.2, 30.0)).toDF("b_id", "b_s", "b_e")
    intercept[IllegalArgumentException](
      RangeJoin.intervalOverlap(fa, fb, "a_s", "a_e", "b_s", "b_e", 10))
    val pts = Seq(10.2).toDF("x")
    val ivs = Seq((5L, 20L, "i")).toDF("s", "e", "iid")
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(pts, ivs, "x", "s", "e", 10))
  }
}
