package graft.tools

/** Host-level CPU accounting from /proc/stat — specifically STEAL time,
  * the contention loadavg cannot see. This box is a guest VM on a shared
  * host: when the host oversubscribes, the guest's runnable threads lose
  * whole scheduling slices ("stolen" ticks) while its own loadavg stays
  * low — identical work was measured at 138 vs 881 task-seconds across
  * reps in one session (D03LeakProbe, r9), a 6× swing with zero code or
  * data change. Cumulative steal on this box has historically equalled
  * cumulative USER time, so benches MUST record the steal share of their
  * own window: a timing taken at 30% steal is not comparable to one taken
  * at 2%, and artifacts that carry their steal% defend themselves the way
  * loadavg fields defended rounds 2–5 against guest-side contamination.
  */
object HostCpu {

  /** Snapshot of (busy, steal, total) jiffies across all CPUs; None when
    * /proc/stat is unreadable (non-Linux). */
  def snapshot(): Option[(Long, Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        val steal = if (f.length > 7) f(7) else 0L
        val idle = f(3) + (if (f.length > 4) f(4) else 0L)
        Some((f.sum - idle - steal, steal, f.sum))
      } finally src.close()
    } catch { case _: Throwable => None }

  /** Percent of all CPU capacity stolen by the host between two
    * snapshots; -1.0 when unknown. */
  def stealPct(before: Option[(Long, Long, Long)],
               after: Option[(Long, Long, Long)]): Double =
    (before, after) match {
      case (Some((_, s0, t0)), Some((_, s1, t1))) if t1 > t0 =>
        100.0 * (s1 - s0) / (t1 - t0)
      case _ => -1.0
    }

  /** Convenience: run `body`, return (result, stealPct of the window). */
  def measuring[A](body: => A): (A, Double) = {
    val b = snapshot()
    val r = body
    (r, stealPct(b, snapshot()))
  }
}
