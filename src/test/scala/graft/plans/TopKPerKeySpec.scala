package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {
  import sqlImplicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("matches the window row_number formulation exactly (total order)") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(5000)(
      (rnd.nextInt(40).toLong, rnd.nextInt(1000), rnd.nextInt(100000).toLong))
      .toDF("key", "score", "id")
    for (k <- Seq(1, 3, 10)) {
      val native = TopK.perKey(data, Seq("key"),
        Seq("score" -> false, "id" -> true), k)
      val window = TopK.perKeyWindow(data, Seq("key"),
        Seq("score" -> false, "id" -> true), k)
      assert(canon(native) === canon(window), s"k=$k")
    }
  }

  test("keys with fewer than k rows keep all rows") {
    val data = Seq((1L, 5), (1L, 3), (2L, 9)).toDF("key", "score")
    val got = canon(TopK.perKey(data, Seq("key"), Seq("score" -> false), 10))
    assert(got === canon(data))
  }

  test("plans through TopKPerKeyExec with a single hash shuffle on the key") {
    val data = spark.range(1000)
      .select((col("id") % 7).as("key"), col("id").as("score"))
    val df = TopK.perKey(data, Seq("key"), Seq("score" -> false), 5)
    val p = df.queryExecution.executedPlan.toString
    // partial pass below the single hash exchange, final pass above it
    assert(p.contains("TopKPerKeyPartial"), p.take(600))
    assert(p.linesIterator.indexWhere(_.contains("TopKPerKeyPartial")) >
      p.linesIterator.indexWhere(l => l.contains("TopKPerKey") && !l.contains("Partial")),
      p.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(800))
    assert(!p.toLowerCase.contains("window"), "must not fall back to a window sort")
    assert(df.count() === 35)
  }

  test("double keys normalize: -0.0 and 0.0 are ONE key, like the window form") {
    val data = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (1.5, 4L))
      .toDF("key", "score")
    val native = canon(TopK.perKey(data, Seq("key"), Seq("score" -> false), 2))
    val window = canon(TopK.perKeyWindow(data, Seq("key"), Seq("score" -> false), 2))
    assert(native === window)
    assert(native.count(_.last.asInstanceOf[Long] != 4L) === 2) // top-2 of the zero key
  }

  test("partial pass flushes under a tiny memory bound without changing results") {
    // force a flush every ~7 retained rows AND (separately) every ~2 KiB —
    // the partial pass emits segment winners repeatedly; the final pass must
    // still produce exactly the window formulation's answer (round-4 advice:
    // the heap map must not grow with distinct-key cardinality)
    val rnd = new scala.util.Random(23)
    // near-unique keys: the degenerate case for a per-key heap map
    val data = Seq.fill(4000)(
      (rnd.nextInt(3000).toLong, rnd.nextInt(500), rnd.nextInt(100000).toLong))
      .toDF("key", "score", "id")
    for ((conf, v) <- Seq("spark.graft.topk.partialFlushRows" -> "7",
                          "spark.graft.topk.partialFlushBytes" -> "4096")) {
      spark.conf.set("spark.graft.topk.partialFlushRows",
        if (conf.endsWith("Rows")) v else Long.MaxValue.toString)
      spark.conf.set("spark.graft.topk.partialFlushBytes",
        if (conf.endsWith("Bytes")) v else Long.MaxValue.toString)
      try {
        val native = canon(TopK.perKey(data, Seq("key"),
          Seq("score" -> false, "id" -> true), 3))
        val window = canon(TopK.perKeyWindow(data, Seq("key"),
          Seq("score" -> false, "id" -> true), 3))
        assert(native === window, s"under $conf=$v")
      } finally {
        spark.conf.unset("spark.graft.topk.partialFlushRows")
        spark.conf.unset("spark.graft.topk.partialFlushBytes")
      }
    }
  }

  test("final pass streams sorted groups: O(k) memory, output key-ordered") {
    val data = spark.range(10000)
      .select((col("id") % 50).as("key"), (col("id") * 37 % 1000).as("score"))
    val df = TopK.perKey(data, Seq("key"), Seq("score" -> false), 4)
    val p = df.queryExecution.executedPlan.toString
    // the final exec requires (key ++ order) sorting: a spill-capable Sort
    // sits above the exchange, over the ≤ k×keys partial survivors only
    assert(p.contains("Sort "), p.take(900))
    assert(df.count() === 200)
  }

  test("composes downstream: aggregate over the top-k result is correct") {
    val data = Seq((1L, 10, "a"), (1L, 20, "b"), (1L, 30, "c"),
                   (2L, 5, "d"), (2L, 50, "e"))
      .toDF("key", "score", "tag")
    val top2Sum = TopK.perKey(data, Seq("key"), Seq("score" -> false), 2)
      .groupBy("key").agg(sum(col("score")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top2Sum === Map(1L -> 50L, 2L -> 55L))
  }
}
