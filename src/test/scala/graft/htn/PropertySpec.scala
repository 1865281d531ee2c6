package graft.htn

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup

/** Property-style invariants (SURVEY §5.2.1) over seeded random samples —
  * deterministic across runs (fixed seed), multiple trials per property.
  * Spark jobs are expensive per example, so trials are few and inputs
  * small; the point is the invariant, not the sample count. */
class PropertySpec extends SparkSpec {
  import sqlImplicits._

  private def trials[A](n: Int)(mk: scala.util.Random => A)(check: A => Unit): Unit = {
    val rng = new scala.util.Random(42)
    (1 to n).foreach(_ => check(mk(rng)))
  }

  private def rowSample(rng: scala.util.Random): Seq[(Long, Int, String)] =
    Seq.fill(30)((rng.nextInt(6).toLong + 1, rng.nextInt(100),
      rng.alphanumeric.take(4).mkString))

  test("keepFirst is idempotent and keeps exactly one row per key") {
    trials(5)(rowSample) { rows =>
      val df = rows.toDF("k", "v", "s")
      val once = Dedup.keepFirst(df, Seq(col("k")), Seq(col("v"), col("s")))
      val twice = Dedup.keepFirst(once, Seq(col("k")), Seq(col("v"), col("s")))
      assert(once.count() === rows.map(_._1).distinct.size)
      assert(once.collect().toSet === twice.collect().toSet)
    }
  }

  test("keepFirst winner is invariant to input row order") {
    trials(5)(rowSample) { rows =>
      val a = Dedup.keepFirst(rows.toDF("k", "v", "s"),
        Seq(col("k")), Seq(col("v"), col("s"))).collect().toSet
      val b = Dedup.keepFirst(rows.reverse.toDF("k", "v", "s"),
        Seq(col("k")), Seq(col("v"), col("s"))).collect().toSet
      assert(a === b)
    }
  }

  test("exclusion: excluded keys never appear; all others survive") {
    trials(5)(rng => (rowSample(rng), Seq.fill(rng.nextInt(5))(rng.nextInt(6).toLong + 1))) {
      case (rows, excl) =>
        val cohort = rows.toDF("PATIENT_LINKAGE", "v", "s")
        val keys = excl.toDF("PATIENT_LINKAGE")
        val out = Exclusions.exclude(cohort, keys).collect().map(_.getLong(0)).toSet
        assert(out.intersect(excl.toSet).isEmpty)
        assert(out === rows.map(_._1).toSet.diff(excl.toSet))
    }
  }

  test("same-day average is invariant to reading order") {
    trials(5)(rng => Seq.fill(6)(80.0 + rng.nextInt(1200) / 10.0)) { vs =>
      def avgOf(of: Seq[Double]) = {
        val df = of.map(v => ("p1", java.sql.Date.valueOf("2023-01-01"), v))
          .toDF("PATIENT_LINKAGE", "MEASUREMENT_DATE", "SBP")
        BloodPressure.sameDayAvg(df, "SBP").collect().head.getDouble(2)
      }
      assert(avgOf(vs) === avgOf(vs.reverse))
    }
  }

  test("phenotype is monotone: adding DX can only raise hypertension flags") {
    val base = Seq(
      ("p1", 0, 0, Some(0), Some(0)), ("p2", 0, 0, None, None),
      ("p3", 0, 0, Some(1), Some(1))
    ).toDF("PATIENT_LINKAGE", "DX", "MEDS", "HTN140_90", "HTN130_80")
    def phen(df: org.apache.spark.sql.DataFrame) = df.withColumn("h",
      when(col("DX") === 1 || col("MEDS") === 1 ||
           coalesce(col("HTN140_90"), lit(0)) === 1, 1).otherwise(0))
      .collect().map(r => r.getString(0) -> r.getAs[Int]("h")).toMap
    val without = phen(base)
    val withDx = phen(base.withColumn("DX", lit(1)))
    assert(without.forall { case (k, v) => withDx(k) >= v })
    assert(withDx.values.forall(_ == 1))
  }
}
