package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** A standing epoch handle for the serving streams: keep the loaded (and
  * cache-persisted) index pinned ACROSS micro-batches, swapping only when
  * a newer epoch has committed.
  *
  * Why: the per-batch serve floor was dominated by re-loading the newest
  * epoch every batch — a fresh persist of the index frames that the first
  * probe re-materializes from parquet, then unpersists at batch end
  * (BENCH_r12 serve sections: 0.5–1.7 s/batch fixed cost). The epochs the
  * roll commits change on ROLL cadence (minutes), not QUERY cadence, so a
  * serving stream re-paying the load per batch is pure waste. The pin
  * replaces the reload with a staleness check: the epoch stream's
  * committed-id listing (`epochs(...).headOption` — marker peek, zero
  * Spark jobs), reusing the standing frames on a hit.
  *
  * Freshness contract is UNCHANGED from the load-per-batch shape: [[get]]
  * runs at each batch start, so every batch answers under the newest
  * epoch committed at its own start — a mid-stream roll changes answers
  * at the next batch boundary, never mid-batch. The retention grace
  * window (`keepEpochs`) therefore still only needs to cover ONE batch:
  * the pinned epoch is re-validated before each use, and its persisted
  * frames (MEMORY_AND_DISK — spill, not eviction) carry the data even
  * after the swapped-out epoch's files are pruned.
  *
  * Thread safety: `foreachBatch` bodies of one query are serial, but
  * [[close]] can race a terminating stream — both are synchronized and
  * close is idempotent. */
final class EpochPin[I](newestId: () => Option[Long],
                        load: () => Option[(Long, I)],
                        releaseIdx: I => Unit) extends AutoCloseable {
  private var cur: Option[(Long, I)] = None
  private var closed = false

  /** The pinned `(epochId, index)`: the standing handle when it is still
    * the newest committed epoch, else release-and-swap to the newest.
    * Throws when no epoch has committed (the serve bootstrap contract). */
  def get(): (Long, I) = synchronized {
    require(!closed, "epoch pin already closed")
    val newest = newestId()
    cur match {
      case Some(p @ (id, _)) if newest.contains(id) => p
      case prev =>
        prev.foreach(p => releaseIdx(p._2))
        cur = None // a throwing load must not leave a dangling handle
        cur = load()
        cur.getOrElse(throw new IllegalStateException(
          "no committed epoch to pin — bootstrap the roll before serving"))
    }
  }

  override def close(): Unit = synchronized {
    cur.foreach(p => releaseIdx(p._2))
    cur = None
    closed = true
  }
}

object EpochPin {

  /** Run `startQuery` with `pin`'s lifetime bound to the query's: the pin
    * closes when the query terminates (however it ends). The terminated
    * listener registers BEFORE the query starts, so even an instantly-
    * finishing `AvailableNow` run cannot slip its event past registration;
    * a start failure closes the pin on the spot. */
  def bound[I](spark: SparkSession, pin: EpochPin[I])
              (startQuery: => StreamingQuery): StreamingQuery = {
    val qid = new java.util.concurrent.atomic.AtomicReference[java.util.UUID]()
    val seen = java.util.concurrent.ConcurrentHashMap
      .newKeySet[java.util.UUID]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
        seen.add(e.id)
        if (e.id == qid.get()) {
          pin.close()
          spark.streams.removeListener(this)
        }
      }
    }
    spark.streams.addListener(listener)
    val q =
      try startQuery
      catch { case t: Throwable =>
        spark.streams.removeListener(listener)
        pin.close()
        throw t
      }
    qid.set(q.id)
    // the event may have landed between start and the id becoming visible
    if (seen.contains(q.id)) {
      pin.close()
      spark.streams.removeListener(listener)
    }
    q
  }
}
