package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

class GapAnomalySpec extends SparkSpec {
  import sqlImplicits._

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def at(s: Long) = new Timestamp(base + s * 1000L)

  /** Sequential replay of the batch (q73) semantics over (key, sec, id)
    * rows, via the SAME verdict kernel the stream uses. */
  private def brute(rows: Seq[(String, Long, Long)], frameLen: Int = 11)
      : Map[Long, (Long, Long, Long, Int, Boolean)] =
    rows.groupBy(_._1).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var gaps = List.empty[Long]
      sorted.zip(sorted.drop(1)).map { case (prev, cur) =>
        val gap = (cur._2 - prev._2) * 1000000L
        gaps = (gaps :+ gap).takeRight(frameLen)
        val (med, mad, n, anom) = GapAnomaly.verdict(gaps)
        cur._3 -> ((gap, med, mad, n, anom))
      }
    }

  private def collectSink(name: String): Map[Long, (Long, Long, Long, Int, Boolean)] =
    spark.table(name)
      .select("event_id", "gap", "med", "mad", "n", "is_anom").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4),
          r.getBoolean(5)))).toMap

  test("hand-computed burst: steady 10s cadence, then a 100s stall flags " +
       "(median stays 10s, MAD 0) — and nothing flags during warm-up") {
    val mem = MemoryStream[(String, Timestamp, Long)]
    val q = GapAnomaly.detect(
        mem.toDF().toDF("event_type", "ts", "event_id"), delay = "10 seconds")
      .writeStream.format("memory").queryName("gap_sink1")
      .outputMode(OutputMode.Append()).start()
    val events = Seq(0L, 10L, 20L, 30L, 40L, 50L, 150L).zipWithIndex
      .map { case (s, i) => ("purchase", at(s), i.toLong) }
    mem.addData(events.map(e => (e._1, e._2, e._3)): _*)
    q.processAllAvailable()
    // watermark needs to pass 150s for the stall verdict
    mem.addData(("purchase", at(400), 99L))
    q.processAllAvailable()
    val got = collectSink("gap_sink1")
    q.stop()
    // event 5 (t=50): five 10s gaps → n=5, med=10s, mad=0, 10 > 10 false
    assert(got(5L) === ((10000000L, 10000000L, 0L, 5, false)))
    // event 6 (t=150): gap 100s, frame med still 10s, mad 0 → anomaly
    assert(got(6L) === ((100000000L, 10000000L, 0L, 6, true)))
    // warm-up: events 1-4 carry verdicts with n < 5 → never anomalous
    assert((1L to 4L).forall(i => !got(i)._5))
    assert(!got.contains(0L), "the first event has no gap and emits nothing")
  }

  test("out-of-order arrival within the watermark gives the exact batch " +
       "verdicts (event-time order, not arrival order)") {
    val rows = Seq[(String, Long, Long)](
      ("a", 0L, 0L), ("a", 7L, 1L), ("a", 9L, 2L), ("a", 23L, 3L),
      ("a", 31L, 4L), ("a", 44L, 5L), ("a", 52L, 6L), ("a", 130L, 7L),
      ("b", 5L, 10L), ("b", 6L, 11L), ("b", 35L, 12L), ("b", 36L, 13L),
      ("b", 41L, 14L), ("b", 77L, 15L))
    val mem = MemoryStream[(String, Timestamp, Long)]
    val q = GapAnomaly.detect(
        mem.toDF().toDF("event_type", "ts", "event_id"), delay = "30 seconds")
      .writeStream.format("memory").queryName("gap_sink2")
      .outputMode(OutputMode.Append()).start()
    // scramble arrival: interleave keys, reverse chunks, split triggers —
    // every row still arrives within the 30s watermark of the running max
    val scrambled = rows.sortBy(e => (e._2, e._3)).grouped(4).toSeq
    scrambled.foreach { chunk =>
      mem.addData(chunk.reverse.map(e => (e._1, at(e._2), e._3)): _*)
      q.processAllAvailable()
    }
    mem.addData(("a", at(500), 98L), ("b", at(500), 99L))
    q.processAllAvailable()
    val got = collectSink("gap_sink2")
    q.stop()
    // compare the rows the stream emitted for the original ids
    val ids = rows.map(_._3).toSet -- Set(0L, 10L) // first event per key: no gap
    assert(ids.forall(i => got(i) === brute(rows)(i)),
      ids.map(i => s"$i: got ${got.get(i)} want ${brute(rows)(i)}").mkString("\n"))
  }

  test("an equal-timestamp sibling arriving after the watermark reaches " +
       "that instant is still ordered by (ts, event_id), not by arrival") {
    // events at t=0 (id 0) and t=100 (id 5); sentinel at t=110 puts the
    // watermark EXACTLY at 100. Under a <= drain boundary id 5 would
    // process now; the strict boundary holds it, so the sibling (t=100,
    // id 3) arriving in the next trigger is still sequenced before it.
    val mem = MemoryStream[(String, Timestamp, Long)]
    val q = GapAnomaly.detect(
        mem.toDF().toDF("event_type", "ts", "event_id"), delay = "10 seconds")
      .writeStream.format("memory").queryName("gap_sink4")
      .outputMode(OutputMode.Append()).start()
    mem.addData(("a", at(0), 0L), ("a", at(100), 5L))
    q.processAllAvailable()
    mem.addData(("a", at(110), 90L)) // watermark -> exactly 100
    q.processAllAvailable()
    mem.addData(("a", at(100), 3L)) // equal-ts sibling, lower id
    q.processAllAvailable()
    mem.addData(("a", at(500), 99L)) // flush everything
    q.processAllAvailable()
    val got = collectSink("gap_sink4")
    q.stop()
    if (got.contains(3L)) {
      // engine admitted the ts==watermark sibling: verdicts must match
      // the batch total order (id 3 before id 5 → gaps 100s then 0s)
      assert(got(3L)._1 === 100000000L, s"got ${got(3L)}")
      assert(got(5L)._1 === 0L, s"got ${got(5L)}")
    } else {
      // engine dropped it as late: id 5's gap is then 100s from id 0 —
      // the batch replay over the ADMITTED rows, still order-consistent
      assert(got(5L)._1 === 100000000L, s"got ${got(5L)}")
    }
  }

  test("held events drain by event-time timeout when only the OTHER key " +
       "advances the watermark") {
    val mem = MemoryStream[(String, Timestamp, Long)]
    val q = GapAnomaly.detect(
        mem.toDF().toDF("event_type", "ts", "event_id"), delay = "10 seconds")
      .writeStream.format("memory").queryName("gap_sink3")
      .outputMode(OutputMode.Append()).start()
    mem.addData(("b", at(0), 1L), ("b", at(20), 2L))
    q.processAllAvailable()
    assert(!collectSink("gap_sink3").contains(2L),
      "verdict must wait for the watermark")
    // advance the global watermark via key a only
    mem.addData(("a", at(300), 50L))
    q.processAllAvailable()
    val got = collectSink("gap_sink3")
    q.stop()
    assert(got(2L) === ((20000000L, 20000000L, 0L, 1, false)),
      "key b's held event must drain through the event-time timeout")
  }
}
