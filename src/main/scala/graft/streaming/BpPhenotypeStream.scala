package graft.streaming

import java.sql.Date
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.htn.HtnConfig

/** Incremental hypertension phenotype over a stream of cleaned BP readings
  * (SURVEY §7.4): the streaming twin of BloodPressure.highBpFlag +
  * controlFlag, maintaining O(1) state per patient.
  *
  * State design for scale — the full batch semantics need the set of
  * distinct high-BP days, but the flag only needs "≥ minDays distinct
  * days", so the state stores at most `minDays` day stamps plus the
  * latest reading: bounded regardless of how many readings arrive. This
  * is the pattern that keeps a 100 TB/day measurement stream's state store
  * at (patients × ~40 bytes).
  */
object BpPhenotypeStream {

  final case class BpReading(patientId: String, date: Date, sbp: Double, dbp: Double)

  /** Bounded per-patient state: distinct high days seen (capped at the
    * flag threshold) + latest reading by date. */
  final case class BpState(
      highDayStamps: Seq[Int],   // distinct epoch-days with high BP, ≤ minDays kept
      latestDay: Int, latestSbp: Double, latestDbp: Double)

  final case class PhenotypeUpdate(
      patientId: String, distinctHighDays: Int,
      htn140: Boolean, controlled140: Boolean)

  /** Fold a micro-batch of readings into the bounded per-patient state. */
  private def fold(st0: BpState, batch: Iterator[BpReading],
                   minDays: Int, sHigh: Double, dHigh: Double): BpState = {
    var st = st0
    batch.foreach { r =>
      val day = (r.date.getTime / 86400000L).toInt
      if ((r.sbp >= sHigh || r.dbp >= dHigh) &&
          st.highDayStamps.size < minDays &&
          !st.highDayStamps.contains(day)) {
        st = st.copy(highDayStamps = st.highDayStamps :+ day)
      }
      // latest reading by day; same-day later arrival overwrites
      // (upstream same-day averaging makes this deterministic)
      if (day >= st.latestDay) {
        st = st.copy(latestDay = day, latestSbp = r.sbp, latestDbp = r.dbp)
      }
    }
    st
  }

  private def toUpdate(pid: String, st: BpState,
                       minDays: Int, sHigh: Double, dHigh: Double): PhenotypeUpdate =
    PhenotypeUpdate(
      pid,
      st.highDayStamps.size,
      htn140 = st.highDayStamps.size >= minDays,
      controlled140 = st.latestDay != Int.MinValue &&
        st.latestSbp < sHigh && st.latestDbp < dHigh)

  /** No-timeout variant: state lives for the lifetime of the query. Right
    * when the patient universe is closed and modest (a registry); for an
    * unbounded key space use [[updatesWithTtl]] — this one's state grows
    * with every key ever seen. */
  def updates(readings: Dataset[BpReading],
              cfg: HtnConfig = HtnConfig()): Dataset[PhenotypeUpdate] = {
    import readings.sparkSession.implicits._
    val minDays = cfg.minHighBpDays
    val (sHigh, dHigh) = (cfg.sbpHigh, cfg.dbpHigh)
    readings
      .groupByKey(_.patientId)
      .flatMapGroupsWithState[BpState, PhenotypeUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (pid: String, batch: Iterator[BpReading], state: GroupState[BpState]) =>
          val st = fold(state.getOption.getOrElse(BpState(Nil, Int.MinValue, 0, 0)),
            batch, minDays, sHigh, dHigh)
          state.update(st)
          Iterator.single(toUpdate(pid, st, minDays, sHigh, dHigh))
      }
  }

  /** TTL variant for unbounded key spaces: a patient idle for `idleTtl` of
    * processing time has their state removed (ProcessingTimeTimeout), so
    * the state store is bounded by ACTIVE patients, not every key ever
    * seen — the right default for an open-ended stream. A patient who
    * reappears after expiry restarts from empty state (the flag rebuilds
    * from subsequent readings only); deployments that must survive expiry
    * checkpoint the emitted updates to an external store keyed by patient. */
  def updatesWithTtl(readings: Dataset[BpReading],
                     cfg: HtnConfig = HtnConfig(),
                     idleTtl: String = "30 minutes"): Dataset[PhenotypeUpdate] = {
    import readings.sparkSession.implicits._
    val minDays = cfg.minHighBpDays
    val (sHigh, dHigh) = (cfg.sbpHigh, cfg.dbpHigh)
    readings
      .groupByKey(_.patientId)
      .flatMapGroupsWithState[BpState, PhenotypeUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.ProcessingTimeTimeout) {
        (pid: String, batch: Iterator[BpReading], state: GroupState[BpState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = fold(state.getOption.getOrElse(BpState(Nil, Int.MinValue, 0, 0)),
              batch, minDays, sHigh, dHigh)
            state.update(st)
            state.setTimeoutDuration(idleTtl)
            Iterator.single(toUpdate(pid, st, minDays, sHigh, dHigh))
          }
      }
  }
}
