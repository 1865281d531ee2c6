package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Process-wide hit/miss counters for the session-scoped index caches
  * (IVF / PQ / cluster-labels / MinHash-signature).
  *
  * Why (r8 verdict): two consecutive driver benches diverged from committed
  * medians specifically on the dedup/index family, and the bench artifact
  * could not say whether the designed path (probe a prebuilt index) was
  * actually taken or silently re-paid per query. Every cache lookup now
  * counts a hit or a miss; `Bench` dumps the snapshot into `bench.json`,
  * so "index was rebuilt N times" vs "index served from cache" is a fact
  * in the artifact, not a guess. Counters are cumulative per JVM — Bench
  * resets them after warm-up so the reported numbers cover the timed run.
  */
object IndexStats {
  private val counters = new ConcurrentHashMap[String, AtomicLong]()

  def inc(name: String): Unit =
    counters.computeIfAbsent(name, _ => new AtomicLong()).incrementAndGet()

  /** Record one lookup against cache `kind` ("ivf", "signature", ...). */
  def lookup(kind: String, hit: Boolean): Unit =
    inc(s"$kind.${if (hit) "hit" else "miss"}")

  def snapshot(): Map[String, Long] = {
    val it = counters.entrySet().iterator()
    val b = Map.newBuilder[String, Long]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.get() }
    b.result()
  }

  def reset(): Unit = counters.clear()
}
