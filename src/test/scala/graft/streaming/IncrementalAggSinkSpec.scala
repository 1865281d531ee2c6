package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.IncrementalAgg

class IncrementalAggSinkSpec extends SparkSpec {
  import sqlImplicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("aggsink").toString

  private def stateOf(sink: IncrementalAggSink): Set[Seq[Any]] =
    sink.read(spark).collect().map(_.toSeq).toSet

  private def oneShot(df: DataFrame, keys: Seq[String],
                      sums: Seq[(String, Int)], minMax: Seq[String] = Nil): Set[Seq[Any]] =
    IncrementalAgg.finish(IncrementalAgg.build(df, keys, sums, minMax))
      .collect().map(_.toSeq).toSet

  private val b1 = Seq(("a", 10.25), ("a", 1.50), ("b", 3.00))
  private val b2 = Seq(("b", 0.75), ("c", 99.99))
  private val b3 = Seq(("a", 2.00), ("c", 0.01))

  test("micro-batches fold to the one-shot aggregate (incl. min/max)") {
    val sink = IncrementalAggSink(tmp(), Seq("k"),
      sums = Seq("x" -> 2), minMax = Seq("x"), nBuckets = 4, appId = "t1")
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      assert(sink.applyBatch(b.toDF("k", "x"), i.toLong))
    }
    assert(stateOf(sink) ===
      oneShot((b1 ++ b2 ++ b3).toDF("k", "x"), Seq("k"), Seq("x" -> 2), Seq("x")))
  }

  test("post-commit replay of a batchId is skipped whole") {
    val sink = IncrementalAggSink(tmp(), Seq("k"),
      sums = Seq("x" -> 2), nBuckets = 4, appId = "t2")
    assert(sink.applyBatch(b1.toDF("k", "x"), 0L))
    val before = stateOf(sink)
    assert(!sink.applyBatch(b1.toDF("k", "x"), 0L), "replay must be skipped")
    assert(stateOf(sink) === before, "replay must not double-count")
  }

  test("pre-commit crash re-apply: marker-carrying buckets are not re-merged") {
    val root = tmp()
    val sink = IncrementalAggSink(root, Seq("k"),
      sums = Seq("x" -> 2), nBuckets = 4, appId = "t3")
    assert(sink.applyBatch(b1.toDF("k", "x"), 0L))
    assert(sink.applyBatch(b2.toDF("k", "x"), 1L))
    val before = stateOf(sink)
    // simulate: every bucket swapped (markers on disk), but the driver died
    // before the global ledger marker — delete it and re-deliver batch 1
    val commits = new Path(root, "_commits")
    val f = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.delete(new Path(commits, "t3-1"), false))
    assert(sink.applyBatch(b2.toDF("k", "x"), 1L),
      "unledgered batch re-applies (and re-marks the ledger)")
    assert(stateOf(sink) === before,
      "per-bucket markers must prevent double-merge on re-apply")
    assert(sink.committed(spark, 1L))
  }

  test("CDC deletes retract; fully-retracted keys leave the state") {
    val sink = IncrementalAggSink(tmp(), Seq("k"),
      sums = Seq("x" -> 2), deleteCol = Some("del"), nBuckets = 4, appId = "t4")
    assert(sink.applyBatch(
      Seq(("a", 10.0, false), ("a", 2.0, false), ("b", 5.0, false))
        .toDF("k", "x", "del"), 0L))
    // retract one of a's rows and ALL of b
    assert(sink.applyBatch(
      Seq(("a", 2.0, true), ("b", 5.0, true), ("c", 7.0, false))
        .toDF("k", "x", "del"), 1L))
    assert(stateOf(sink) ===
      oneShot(Seq(("a", 10.0), ("c", 7.0)).toDF("k", "x"), Seq("k"), Seq("x" -> 2)))
  }

  test("retracting EVERYTHING reads back as empty state, not a schema error") {
    val sink = IncrementalAggSink(tmp(), Seq("k"),
      sums = Seq("x" -> 2), deleteCol = Some("del"), nBuckets = 2, appId = "t4b")
    assert(sink.applyBatch(
      Seq(("a", 1.0, false), ("b", 2.0, false)).toDF("k", "x", "del"), 0L))
    assert(sink.applyBatch(
      Seq(("a", 1.0, true), ("b", 2.0, true)).toDF("k", "x", "del"), 1L))
    assert(sink.read(spark).collect().isEmpty,
      "marker-only buckets must read as empty")
    // and the state keeps working: a later batch re-populates
    assert(sink.applyBatch(Seq(("c", 9.0, false)).toDF("k", "x", "del"), 2L))
    assert(stateOf(sink) ===
      oneShot(Seq(("c", 9.0)).toDF("k", "x"), Seq("k"), Seq("x" -> 2)))
  }

  test("deleteCol + minMax is refused at construction") {
    val e = intercept[IllegalArgumentException] {
      IncrementalAggSink(tmp(), Seq("k"),
        sums = Seq("x" -> 2), minMax = Seq("x"), deleteCol = Some("del"))
    }
    assert(e.getMessage.contains("retract"))
  }

  test("foreachBatch wiring: a real stream folds through the sink") {
    val sink = IncrementalAggSink(tmp(), Seq("k"),
      sums = Seq("x" -> 2), nBuckets = 4, appId = "t6")
    val mem = MemoryStream[(String, Double)]
    val q = sink.start(mem.toDF().toDF("k", "x"), tmp())
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      assert(stateOf(sink) ===
        oneShot((b1 ++ b2).toDF("k", "x"), Seq("k"), Seq("x" -> 2)))
    } finally q.stop()
  }
}
