package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import sqlImplicits._

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private val data = Seq(
    ("a", 10.25), ("a", 1.50), ("a", 3.10),
    ("b", 100.00), ("b", 0.05),
    ("c", 7.77))

  test("build on splits + merge equals one-shot build (incl. min/max)") {
    val df = data.toDF("k", "x")
    val (s1, s2) = (df.filter($"x" < 5), df.filter($"x" >= 5))
    val oneShot = IncrementalAgg.build(df, Seq("k"),
      sums = Seq("x" -> 2), minMax = Seq("x"))
    val merged = IncrementalAgg.merge(
      IncrementalAgg.build(s1, Seq("k"), sums = Seq("x" -> 2), minMax = Seq("x")),
      IncrementalAgg.build(s2, Seq("k"), sums = Seq("x" -> 2), minMax = Seq("x")))
    assert(rows(merged) === rows(oneShot))
  }

  test("retract round-trip: (build(all) retract build(part)) = build(rest)") {
    val df = data.toDF("k", "x")
    val part = df.filter($"x" > 50) // the two b=100.00 / none... just b's 100
    val rest = df.filter($"x" <= 50)
    val all = IncrementalAgg.build(df, Seq("k"), sums = Seq("x" -> 2))
    val deleted = IncrementalAgg.build(part, Seq("k"), sums = Seq("x" -> 2))
    val got = IncrementalAgg.retract(all, deleted)
    assert(rows(got) === rows(IncrementalAgg.build(rest, Seq("k"), sums = Seq("x" -> 2))))
  }

  test("retract drops a fully-retracted key") {
    val df = data.toDF("k", "x")
    val all = IncrementalAgg.build(df, Seq("k"), sums = Seq("x" -> 2))
    val deleted = IncrementalAgg.build(df.filter($"k" === "c"), Seq("k"), sums = Seq("x" -> 2))
    val got = IncrementalAgg.retract(all, deleted)
    assert(got.filter($"k" === "c").isEmpty)
    assert(got.count() === 2)
  }

  test("retract refuses min/max state on either side") {
    val df = data.toDF("k", "x")
    val withMm = IncrementalAgg.build(df, Seq("k"), minMax = Seq("x"))
    val plain = IncrementalAgg.build(df, Seq("k"))
    val e1 = intercept[IllegalArgumentException] {
      IncrementalAgg.retract(withMm, plain)
    }
    assert(e1.getMessage.contains("state carries"))
    val e2 = intercept[IllegalArgumentException] {
      IncrementalAgg.retract(plain, withMm)
    }
    assert(e2.getMessage.contains("deletedState carries"))
  }

  test("over-retraction (cnt_rows < 0) fails the job loudly, not silently") {
    val df = data.toDF("k", "x")
    val once = IncrementalAgg.build(df.filter($"k" === "a"), Seq("k"), sums = Seq("x" -> 2))
    val twice = IncrementalAgg.merge(once, once) // retracting 2x what was built
    val all = IncrementalAgg.build(df, Seq("k"), sums = Seq("x" -> 2))
    val e = intercept[Exception] {
      IncrementalAgg.retract(all, twice).collect()
    }
    assert(e.getMessage.contains("cnt_rows went negative"))
  }

  test("finish decodes fixed-point sums and renames cnt_rows") {
    val df = Seq(("a", 1.25), ("a", 2.50)).toDF("k", "x")
    val out = IncrementalAgg.finish(
      IncrementalAgg.build(df, Seq("k"), sums = Seq("x" -> 2), minMax = Seq("x")))
    assert(out.columns.toSeq === Seq("k", "n", "sum_x", "min_x", "max_x"))
    val r = out.head()
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Double]("sum_x") === 3.75)
    assert(r.getAs[Double]("min_x") === 1.25)
    assert(r.getAs[Double]("max_x") === 2.50)
  }

  test("explicit-keys merge protects a metric-prefixed natural key") {
    // a key column literally named sum_type: inference would aggregate it;
    // the declared-keys overload groups by it correctly
    val state = Seq(("x", "k1", 2L), ("x", "k1", 3L), ("y", "k2", 5L))
      .toDF("sum_type", "other_key", "cnt_rows")
    val merged = IncrementalAgg.merge(Seq("sum_type", "other_key"), state)
    assert(rows(merged) === Set(Seq("x", "k1", 5L), Seq("y", "k2", 5L)))
  }

  test("merge refuses undeclared non-metric columns instead of guessing") {
    val state = Seq(("a", "junk", 1L)).toDF("k", "mystery", "cnt_rows")
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.merge(Seq("k"), state)
    }
    assert(e.getMessage.contains("mystery"))
  }
}
