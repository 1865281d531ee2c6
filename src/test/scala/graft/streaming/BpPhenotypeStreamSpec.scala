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
}
