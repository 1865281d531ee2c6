package graft.streaming

import java.sql.Date
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import BpPhenotypeStream._

class BpPhenotypeStreamSpec extends SparkSpec {
  import sqlImplicits._

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("incremental flag matches batch semantics across micro-batches") {
    val mem = MemoryStream[BpReading]
    val q = updates(mem.toDS())
      .writeStream.format("memory").queryName("bp_phenotype")
      .outputMode(OutputMode.Update()).start()
    def latest(): Map[String, PhenotypeUpdate] = {
      q.processAllAvailable()
      // batchId-free memory sink: last update per patient wins
      spark.table("bp_phenotype").as[PhenotypeUpdate].collect()
        .groupBy(_.patientId).map { case (k, v) => k -> v.last }
    }

    // day 1 high → not yet hypertensive, not controlled
    mem.addData(BpReading("p1", Date.valueOf("2023-03-01"), 150, 95))
    var s = latest()
    assert(s("p1") === PhenotypeUpdate("p1", 1, htn140 = false, controlled140 = false))

    // same day again (duplicate day must NOT double-count)
    mem.addData(BpReading("p1", Date.valueOf("2023-03-01"), 155, 96))
    s = latest()
    assert(s("p1").distinctHighDays === 1)

    // second distinct high day → flagged
    mem.addData(BpReading("p1", Date.valueOf("2023-05-01"), 145, 92))
    s = latest()
    assert(s("p1") === PhenotypeUpdate("p1", 2, htn140 = true, controlled140 = false))

    // later normal reading → still flagged, now controlled
    mem.addData(BpReading("p1", Date.valueOf("2023-08-01"), 120, 70))
    s = latest()
    assert(s("p1") === PhenotypeUpdate("p1", 2, htn140 = true, controlled140 = true))

    // independent normal patient
    mem.addData(BpReading("p2", Date.valueOf("2023-06-01"), 118, 75))
    s = latest()
    assert(s("p2") === PhenotypeUpdate("p2", 0, htn140 = false, controlled140 = true))
    q.stop()
  }

  test("state stays bounded: day stamps never exceed the flag threshold") {
    val mem = MemoryStream[BpReading]
    val q = updates(mem.toDS())
      .writeStream.format("memory").queryName("bp_bounded")
      .outputMode(OutputMode.Update()).start()
    // 10 distinct high days — state must cap at minDays (2)
    (1 to 10).foreach { d =>
      mem.addData(BpReading("p9", Date.valueOf(f"2023-04-$d%02d"), 160, 100))
    }
    q.processAllAvailable()
    val rows = spark.table("bp_bounded").as[PhenotypeUpdate].collect()
    assert(rows.last.distinctHighDays === 2) // capped, still correct flag
    assert(rows.last.htn140)
    q.stop()
  }

  test("TTL variant evicts idle state: a reappearing patient starts fresh") {
    val mem = MemoryStream[BpReading]
    // TTL must comfortably exceed per-step test latency (batch + poll time),
    // or state expires between legitimate steps and the count never reaches 2
    val q = updatesWithTtl(mem.toDS(), idleTtl = "8 seconds")
      .writeStream.format("memory").queryName("bp_ttl")
      .outputMode(OutputMode.Update()).start()
    // NOTE: processAllAvailable() must not be used here. With
    // ProcessingTimeTimeout, FlatMapGroupsWithStateExec.shouldRunAnotherBatch
    // is always true, so the engine constructs micro-batches continuously to
    // check timeouts and never signals noNewData - processAllAvailable would
    // block forever. Poll the sink instead (the continuous batches also mean
    // timeouts fire promptly without an external nudge).
    def rowsFor(pid: String): Seq[PhenotypeUpdate] =
      spark.table("bp_ttl").as[PhenotypeUpdate].collect().filter(_.patientId == pid).toSeq
    def waitFor(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for: $what")
    }
    // two distinct high days -> flagged
    mem.addData(BpReading("p1", Date.valueOf("2023-03-01"), 150, 95))
    waitFor("first update")(rowsFor("p1").nonEmpty)
    mem.addData(BpReading("p1", Date.valueOf("2023-04-01"), 151, 96))
    waitFor("second distinct day")(rowsFor("p1").lastOption.exists(_.distinctHighDays == 2))
    // idle past the TTL: the engine's timeout batch removes p1's state
    // (the handler sees hasTimedOut and emits nothing - eviction becomes
    // observable when the patient reappears)
    Thread.sleep(10000)
    mem.addData(BpReading("p1", Date.valueOf("2023-06-01"), 152, 97))
    waitFor("post-expiry rebuild") {
      val s = rowsFor("p1").lastOption
      s.exists(u => u.distinctHighDays == 1 && !u.htn140)
    }
    q.stop()
  }
}
