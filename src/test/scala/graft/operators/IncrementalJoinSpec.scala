package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IncrementalJoinSpec extends SparkSpec {
  import sqlImplicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("|"))

  test("maintained view equals the recomputed join on seeded random " +
       "splits with multi-row fanout on both sides") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val a = Seq.tabulate(80)(i => (rnd.nextInt(20).toLong, i.toLong))
        .toDF("k", "av")
      val b = Seq.tabulate(120)(i => (rnd.nextInt(20).toLong, i.toLong))
        .toDF("k", "bv")
      // event-time-style split: NOT aligned with the join key, so all
      // three delta terms carry rows
      val (aOld, dA) = (a.filter(col("av") < 40), a.filter(col("av") >= 40))
      val (bOld, dB) = (b.filter(col("bv") < 60), b.filter(col("bv") >= 60))
      val maintained = IncrementalJoin.insertOnlyInner(
        aOld.join(bOld, Seq("k")), aOld, bOld, dA, dB, Seq("k"))
      assert(rows(maintained) === rows(a.join(b, Seq("k"))), s"seed=$seed")
      // each delta term is genuinely non-empty in this construction
      assert(dA.join(bOld, Seq("k")).count() > 0)
      assert(aOld.join(dB, Seq("k")).count() > 0)
      assert(dA.join(dB, Seq("k")).count() > 0)
    }
  }

  test("empty deltas are the identity refresh") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "av")
    val b = Seq((1L, 10L), (1L, 11L)).toDF("k", "bv")
    val view = a.join(b, Seq("k"))
    val maintained = IncrementalJoin.insertOnlyInner(
      view, a, b, a.limit(0), b.limit(0), Seq("k"))
    assert(rows(maintained) === rows(view))
  }

  test("composite keys and key validation") {
    val a = Seq((1L, 1L, "x")).toDF("k1", "k2", "av")
    val b = Seq((1L, 1L, 5L), (1L, 2L, 6L)).toDF("k1", "k2", "bv")
    val m = IncrementalJoin.insertOnlyInner(
      a.join(b, Seq("k1", "k2")), a, b, a.limit(0), b.limit(0),
      Seq("k1", "k2"))
    assert(m.count() === 1)
    intercept[IllegalArgumentException](
      IncrementalJoin.insertOnlyInner(a, a, b, a, b, Nil))
  }
}
