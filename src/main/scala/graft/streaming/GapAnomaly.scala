package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}

/** Streaming twin of q73's rolling-median / MAD gap anomaly detector —
  * the monitoring shape that actually runs as a stream in production:
  * flag an event when its inter-arrival gap blows past the ROBUST
  * baseline of the last 11 gaps (median + 3·MAD, integer arithmetic, the
  * batch query's exact semantics).
  *
  * Why not a windowed aggregate: the per-event verdict needs the gap to
  * the PREVIOUS event and an order-statistic (median) over a row-count
  * frame — neither is expressible in Structured Streaming's window
  * aggregates. It is keyed sequential state, so it rides
  * `flatMapGroupsWithState`.
  *
  * Correct-under-reordering (the [[EventStreams.streamingAsOf]]
  * discipline): gaps are only well-defined over the event-time ORDER, so
  * events are HELD in state and processed once the watermark passes their
  * event time — at that point everything at-or-before them has arrived or
  * is watermark-dropped (the documented trade; q73 stays the exact
  * batch backfill). Emission latency = the watermark delay. Within a
  * drained batch events process in (ts, event_id) order — the batch
  * query's total order, so stream and batch verdicts are identical on
  * identical data (pinned in GapAnomalySpec).
  *
  * State per key is BOUNDED: the last processed event (for the next gap),
  * at most `frameLen` gaps (the rolling frame), and the watermark-horizon
  * pending buffer; held events drain by event-time timeout even if the
  * key goes quiet. Keyspace here is `event_type` — dimension-bounded.
  */
object GapAnomaly {

  final case class GapEvent(event_type: String, ts: java.sql.Timestamp,
                            event_id: Long)
  final case class GapPending(tsUs: Long, eventId: Long)
  final case class GapAnomState(lastUs: Long, lastId: Long, haveLast: Boolean,
                                gaps: List[Long], pending: List[GapPending])
  final case class GapVerdict(event_type: String, event_id: Long,
                              ts: java.sql.Timestamp, gap: Long,
                              med: Long, mad: Long, n: Int, is_anom: Boolean)

  private def tsUs(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000
  private def usTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L).toInt * 1000); t
  }

  /** The shared verdict kernel — also the spec's batch replay, so stream
    * and reference literally share the arithmetic. `gaps` is the frame
    * INCLUDING the current gap, newest last. Lower median: sorted index
    * (n+1)/2, 1-based — q73's element_at arithmetic. */
  private[streaming] def verdict(gaps: List[Long]): (Long, Long, Int, Boolean) = {
    val sorted = gaps.sorted
    val n = sorted.size
    val med = sorted((n + 1) / 2 - 1)
    val madSorted = sorted.map(g => math.abs(g - med)).sorted
    val mad = madSorted((n + 1) / 2 - 1)
    val gap = gaps.last
    (med, mad, n, n >= minFrame && gap > med + 3 * mad)
  }

  /** q73's warm-up guard: no verdict before 5 gaps are in frame. */
  private val minFrame = 5

  /** @param events streaming frame with (event_type, ts, event_id)
    * @param delay watermark delay — also the emission latency
    * @param frameLen rolling frame length in gaps (q73 uses 11: the
    *        current gap + 10 preceding) */
  def detect(events: DataFrame, delay: String = "10 minutes",
             frameLen: Int = 11): Dataset[GapVerdict] = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type").cast("string").as("event_type"),
        col("ts"), col("event_id").cast("long").as("event_id"))
      .as[GapEvent]
      .withWatermark("ts", delay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[GapAnomState, GapVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[GapEvent], state: GroupState[GapAnomState]) =>
          val st0 = state.getOption
            .getOrElse(GapAnomState(0L, 0L, haveLast = false, Nil, Nil))
          val pending = st0.pending ++
            rows.map(e => GapPending(tsUs(e.ts), e.event_id))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // STRICTLY below the watermark: Spark only drops rows with
          // ts < watermark, so an equal-timestamp sibling (same ts,
          // different event_id) can still arrive after the watermark
          // reaches ts — draining at == would process out of the
          // (ts, event_id) total order and diverge from the batch replay
          val (drain, hold) = pending.partition(_.tsUs < wmUs)
          var lastUs = st0.lastUs; var lastId = st0.lastId
          var haveLast = st0.haveLast; var gaps = st0.gaps
          val out = drain.sortBy(p => (p.tsUs, p.eventId)).flatMap { p =>
            val v = if (haveLast) {
              val gap = p.tsUs - lastUs
              gaps = (gaps :+ gap).takeRight(frameLen)
              val (med, mad, n, anom) = verdict(gaps)
              Some(GapVerdict(key, p.eventId, usTs(p.tsUs), gap,
                med, mad, n, anom))
            } else None
            lastUs = p.tsUs; lastId = p.eventId; haveLast = true
            v
          }
          state.update(GapAnomState(lastUs, lastId, haveLast, gaps,
            hold.toList))
          // held events must drain even if this key never sees another
          // row — the streamingAsOf timeout discipline
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(hold.map(_.tsUs).min / 1000L + 1L)
          out.iterator
      }
  }
}
