package graft.streaming

import java.sql.Timestamp
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class ExactlyOnceSinkSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def contents(sink: ExactlyOnceSink): Map[Long, (String, Double)] =
    sink.read(spark).select("user_id", "status", "score").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("replayed batchId is skipped whole; upsert keeps one row per key") {
    val sink = ExactlyOnceSink(tmp("eos_replay"), keys = Seq("user_id"), nBuckets = 8)
    val b0 = Seq((1L, "new", 1.0), (2L, "new", 2.0))
      .toDF("user_id", "status", "score")
    val b1 = Seq((2L, "upd", 2.5), (3L, "new", 3.0))
      .toDF("user_id", "status", "score")
    assert(sink.upsertBatch(b0, 0L))
    assert(sink.upsertBatch(b1, 1L))
    val afterBoth = contents(sink)
    assert(afterBoth === Map(1L -> ("new", 1.0), 2L -> ("upd", 2.5),
                             3L -> ("new", 3.0)), "batch 1 must win on key 2")
    // redelivery AFTER the commit marker landed: detected, skipped whole
    assert(!sink.upsertBatch(b1, 1L), "replay of a committed batch must report skip")
    assert(contents(sink) === afterBoth, "replay must not change the target")
    assert(sink.read(spark).count() === 3, "no duplicate rows on replay")
  }

  test("retry in the window BEFORE the marker landed re-applies idempotently") {
    val root = tmp("eos_crash")
    val sink = ExactlyOnceSink(root, keys = Seq("user_id"), nBuckets = 8)
    val b0 = Seq((1L, "new", 1.0), (2L, "new", 2.0))
      .toDF("user_id", "status", "score")
    assert(sink.upsertBatch(b0, 0L))
    val committed = contents(sink)
    // simulate "crashed after the data swap, before the marker": drop the
    // ledger entry — Spark would redeliver batch 0 with the same rows
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new Path(s"$root/_commits/default-0"), false))
    assert(sink.upsertBatch(b0, 0L), "unmarked batch must re-apply")
    assert(contents(sink) === committed, "re-apply must converge, not duplicate")
    assert(sink.read(spark).count() === 2)
  }

  test("a parked bucket from a mid-swap crash is healed before the next batch") {
    val root = tmp("eos_park")
    val sink = ExactlyOnceSink(root, keys = Seq("user_id"), nBuckets = 4)
    val b0 = (1L to 12L).map(i => (i, "new", i.toDouble))
      .toDF("user_id", "status", "score")
    assert(sink.upsertBatch(b0, 0L))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buckets = fs.listStatus(new Path(s"$root/state"))
      .filter(_.getPath.getName.startsWith("_bucket=")).map(_.getPath)
    assert(buckets.length > 1, "12 keys over 4 buckets must spread")
    // window 1: live bucket gone, data parked under ._old
    val victim = buckets.head
    assert(fs.rename(victim, victim.suffix("._old")))
    val b1 = Seq((100L, "new", 100.0)).toDF("user_id", "status", "score")
    assert(sink.upsertBatch(b1, 1L))
    assert(!fs.exists(victim.suffix("._old")), "parked bucket must be healed")
    val got = contents(sink)
    assert(got.size === 13, s"no key lost to the crash, got ${got.size}")
    assert((1L to 12L).forall(got.contains) && got.contains(100L))
  }

  test("within-batch duplicates resolve to the max-orderBy row") {
    val sink = ExactlyOnceSink(tmp("eos_order"), keys = Seq("user_id"),
      nBuckets = 4, orderBy = Some("seen"))
    val b0 = Seq(
      (1L, "first", 1.0, ts("2024-01-01 00:00:00")),
      (1L, "last", 9.0, ts("2024-01-01 00:02:00")),
      (1L, "mid", 5.0, ts("2024-01-01 00:01:00"))
    ).toDF("user_id", "status", "score", "seen")
    assert(sink.upsertBatch(b0, 0L))
    val rows = sink.read(spark).select("user_id", "status", "score").collect()
    assert(rows.length === 1)
    assert(rows(0).getString(1) === "last" && rows(0).getDouble(2) === 9.0)
  }

  test("ledger is appId-scoped: a fresh checkpoint lineage is not mistaken for replay") {
    // a stream restarted from a NEW checkpoint restarts batchIds at 0 —
    // under a new appId its batch 0 must apply, not be skipped as a
    // replay of the old lineage's batch 0
    val root = tmp("eos_appid")
    val a = ExactlyOnceSink(root, keys = Seq("user_id"), nBuckets = 4, appId = "run1")
    assert(a.upsertBatch(Seq((1L, "old", 1.0)).toDF("user_id", "status", "score"), 0L))
    val b = ExactlyOnceSink(root, keys = Seq("user_id"), nBuckets = 4, appId = "run2")
    assert(b.upsertBatch(Seq((1L, "new", 2.0)).toDF("user_id", "status", "score"), 0L),
      "same batchId under a new appId is NEW data, not a replay")
    assert(contents(b) === Map(1L -> ("new", 2.0)))
    // and within one appId the skip still holds
    assert(!b.upsertBatch(Seq((1L, "x", 3.0)).toDF("user_id", "status", "score"), 0L))
    assert(contents(b) === Map(1L -> ("new", 2.0)))
  }

  test("NULL upsert keys upsert null-safely instead of accumulating") {
    val sink = ExactlyOnceSink(tmp("eos_null"), keys = Seq("user_id"), nBuckets = 4)
    val b0 = Seq((Some(1L), "a", 1.0), (None, "n0", 5.0))
      .toDF("user_id", "status", "score")
    val b1 = Seq((None: Option[Long], "n1", 6.0)).toDF("user_id", "status", "score")
    assert(sink.upsertBatch(b0, 0L))
    assert(sink.upsertBatch(b1, 1L))
    val rows = sink.read(spark).select("user_id", "status").collect()
      .map(r => Option(r.getAs[java.lang.Long](0)).map(_.longValue) -> r.getString(1))
      .toMap
    assert(rows === Map(Some(1L) -> "a", None -> "n1"),
      "the NULL key is ONE key: batch 1 replaces batch 0's row")
    assert(sink.read(spark).count() === 2)
  }

  test("read() never sees a parked ._old bucket (no mid-crash duplicates)") {
    val root = tmp("eos_read_park")
    val sink = ExactlyOnceSink(root, keys = Seq("user_id"), nBuckets = 4)
    val b0 = (1L to 12L).map(i => (i, "new", i.toDouble))
      .toDF("user_id", "status", "score")
    assert(sink.upsertBatch(b0, 0L))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucket = fs.listStatus(new Path(s"$root/state"))
      .filter(_.getPath.getName.startsWith("_bucket=")).head.getPath
    // window 2 of a crashed swap: live bucket AND its parked copy coexist
    org.apache.hadoop.fs.FileUtil.copy(fs, bucket, fs,
      bucket.suffix("._old"), false, spark.sparkContext.hadoopConfiguration)
    assert(sink.read(spark).count() === 12, "parked copy must not double rows")
  }

  test("foreachBatch wiring: a real stream upserts through the sink") {
    val sink = ExactlyOnceSink(tmp("eos_stream"), keys = Seq("user_id"), nBuckets = 8)
    val mem = MemoryStream[(Long, String, Double)]
    val q = sink.start(mem.toDF().toDF("user_id", "status", "score"),
      checkpointDir = tmp("eos_stream_ckpt"))
    mem.addData((1L, "new", 1.0), (2L, "new", 2.0))
    q.processAllAvailable()
    assert(contents(sink) === Map(1L -> ("new", 1.0), 2L -> ("new", 2.0)))
    mem.addData((2L, "upd", 2.5))
    q.processAllAvailable()
    q.stop()
    assert(contents(sink) === Map(1L -> ("new", 1.0), 2L -> ("upd", 2.5)),
      "second micro-batch upserts, never appends a duplicate")
  }
}
