package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Checkpoint-mode selection for the engine's iterative operators
  * ([[Components]], [[Hierarchy]]) — the fault-tolerance contract of a
  * multi-hour run on a real cluster.
  *
  * `localCheckpoint()` (the default) truncates lineage by persisting blocks
  * on the executors that computed them. That is the right call for local
  * mode and short jobs — zero filesystem traffic — but those blocks "cannot
  * be recomputed after unpersisting": lose ONE executor mid-run and the
  * whole iterative job dies unrecoverably. A 100-TB connected-components
  * run over hours WILL lose executors.
  *
  * Reliable mode writes each round to the session's checkpoint directory
  * (HDFS/S3 on a cluster) via `Dataset.checkpoint()` instead: a lost
  * executor re-reads the round from the fault-tolerant store and the job
  * continues — the same restart-from-the-middle property the reference
  * pipeline gets from its stage tables
  * (ref: 2_data_importing_cleaning.R:39-40, 3_blood_pressure.R:44-55).
  *
  * Opt in with [[graft.GraftSession.enableReliableCheckpoints]] (sets the
  * Spark checkpoint dir AND the [[ReliableConf]] runtime flag); every
  * operator that iterates picks the mode per-call through [[stage]], and
  * [[release]] cleans whichever artifact was produced — executor blocks
  * for local, `rdd-*` directories for reliable (Spark's own cleaner only
  * removes them at context shutdown, and only with
  * `spark.cleaner.referenceTracking.cleanCheckpoints` — an hours-long run
  * must reclaim round N's files as soon as round N+1 is durable, or it
  * holds O(rounds × |E|) of the cluster store).
  */
object Checkpoints {

  /** Runtime conf flag (`spark.conf.set(...)`-able mid-session): when
    * `true`, [[stage]] uses reliable `Dataset.checkpoint()`; requires
    * `SparkContext.setCheckpointDir` to have been called. */
  val ReliableConf = "spark.graft.checkpoint.reliable"

  /** Is reliable mode on for this frame's session? */
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(ReliableConf).exists(_.trim.equalsIgnoreCase("true"))

  /** Materialize a round of an iterative computation with lineage
    * truncated: reliable `checkpoint()` when configured (survives executor
    * loss), `localCheckpoint()` otherwise (fastest, not fault-tolerant).
    * Eager in both modes — callers rely on the returned frame being
    * computed so the PREVIOUS round can be [[release]]d immediately. */
  def stage(df: DataFrame): DataFrame =
    if (reliable(df)) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConf=true but no checkpoint dir — call " +
          "GraftSession.enableReliableCheckpoints(spark, dir) or SparkContext.setCheckpointDir")
      df.checkpoint()
    } else df.localCheckpoint()

  /** Free a checkpointed frame's storage NOW, whichever mode produced it.
    *
    * `Dataset.unpersist` only reaches CacheManager-registered plans (those
    * from `.persist()`/`.cache()`); a checkpoint's artifacts hang off the
    * internal RDD inside the plan's `LogicalRDD` leaf, which otherwise only
    * GC + ContextCleaner reclaim — "release" through `unpersist()` silently
    * frees nothing. This digs every `LogicalRDD` out of the analyzed plan
    * and, per RDD: drops its persisted blocks (localCheckpoint), and
    * deletes its `rdd-*` checkpoint directory from the checkpoint store
    * (reliable). Works on the checkpointed frame itself AND on any frame
    * whose plan still references one — pass an operator's RESULT and every
    * level/round it retained is freed in one call. */
  def release(df: DataFrame): Unit = releaseExcept(df)

  /** [[release]], but any `LogicalRDD` leaf that also appears in one of
    * `keep` is left alone — for plans that compose per-call checkpoint
    * chains OVER a long-lived cached frame (d13's fold stages away from
    * the delta-CC remap checkpoint while the standing label index it
    * joined must keep serving other queries). Matching is by RDD id, so
    * any frame whose plan references the kept checkpoint protects it. */
  def releaseExcept(df: DataFrame, keep: DataFrame*): Unit = {
    val keepIds: Set[Int] = keep.flatMap(_.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }).toSet
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD
          if !keepIds.contains(lr.rdd.id) => lr.rdd
    }.foreach { rdd =>
      rdd.unpersist(false)
      rdd.getCheckpointFile.foreach { f =>
        val p = new Path(f)
        p.getFileSystem(rdd.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
  }

  // One thread per session may hold a lowered-conf window at a time:
  // interleaved set/restore from two threads would restore a STALE value
  // and leave the session permanently mis-configured. Same-thread nesting
  // is fine (inner window restores to the outer's value in LIFO order).
  private val shuffleWindowOwner =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.sql.SparkSession, Thread]()

  /** Run `f` with `spark.sql.shuffle.partitions` temporarily LOWERED to
    * fit a measured row volume, then restore it — the iterative graph
    * operators' answer to the measured per-round floor: on tiny per-round
    * frames the cost is pure task-count overhead (probed at sf0.1: a
    * k-core round is 0.68 s at 32 shuffle partitions and 0.34 s at 8,
    * with AQE size-first coalescing NOT recovering it — join-stage
    * symmetry keeps the map sides wide). The override only ever lowers:
    * `n >= session conf` is a no-op, so a 10k-partition cluster session
    * keeps its parallelism on a 100-TB graph and a small scoped graph
    * stops paying 32-task scheduling per stage.
    *
    * Concurrency contract (enforced, not just documented): only the
    * thread that OPENED a session's window mutates the conf; a second
    * thread arriving while a window is open runs `f` WITHOUT lowering —
    * correctness is unaffected (the override is purely a task-count
    * optimization) and the conf can never be restored to a stale value by
    * interleaved windows. Residual (inherent to session-scoped conf): a
    * concurrent query planned inside someone else's window may still SEE
    * the lowered value — performance-only. */
  def withShufflePartitions[A](spark: org.apache.spark.sql.SparkSession,
                               n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val me = Thread.currentThread()
    val owner = shuffleWindowOwner.putIfAbsent(spark, me)
    if (owner != null && (owner ne me)) f // contended: skip the optimization
    else {
      val opened = owner == null
      try {
        val prev = spark.conf.get(key)
        if (n >= prev.toInt) f
        else {
          spark.conf.set(key, n.toString)
          try f finally spark.conf.set(key, prev)
        }
      } finally if (opened) shuffleWindowOwner.remove(spark, me)
    }
  }

  /** Partition count for a measured per-round row volume: one partition
    * per ~500k rows, floor 4 (keep a few cores busy), capped by the
    * session conf inside [[withShufflePartitions]] itself. Clamped to
    * Int range BEFORE the narrowing cast — an extreme row count must
    * degrade to the no-op path, never wrap negative into the conf. */
  def partitionsForRows(rows: Long, rowsPerPartition: Long = 500000L): Int =
    math.min(Int.MaxValue.toLong,
      math.max(4L, (rows + rowsPerPartition - 1) / rowsPerPartition)).toInt

  private val sweepLog = org.slf4j.LoggerFactory.getLogger("graft.operators.Checkpoints")

  // Per-context overlap ledger for sweepingOnFailure: `active` counts
  // in-flight builds, `started` counts entries ever — together they
  // detect overlap in EITHER direction (a builder already running at our
  // entry, or one that entered during our window, even if it exited
  // before our failure). The per-thread twins subtract SAME-THREAD
  // nesting (an operator building inside another operator's build is one
  // logical build — its RDDs belong to the outer window, and both sweeps
  // fire on the shared failure path), so only genuinely concurrent
  // threads read as overlap.
  private final class BuildLedger {
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val started = new java.util.concurrent.atomic.AtomicLong(0L)
    val myDepth = new ThreadLocal[Integer] {
      override def initialValue(): Integer = 0
    }
    val myStarted = new ThreadLocal[java.lang.Long] {
      override def initialValue(): java.lang.Long = 0L
    }
  }
  private val buildLedgers =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, BuildLedger]()

  /** Failure-path sweep for eager iterative builds (the ONE shared copy of
    * what PageRank/LabelPropagation/KCore/BfsHops/CheapestPaths/Triangles
    * each previously inlined): staging is eager, so an error mid-build —
    * e.g. an overflow guard firing — must not strand the frames this call
    * persisted/staged, including a FAILED round's half-created checkpoint
    * RDD, which stays registered even though its job never finished and
    * which no DataFrame handle can reach. On Throwable, every RDD
    * registered since entry is unpersisted.
    *
    * Concurrency contract (enforced): RDD registrations carry no owner, so
    * a sweep cannot distinguish this build's frames from a concurrent
    * builder's. The ledger detects ANY overlapping build in the same
    * context (running at entry, or entered during the window); on failure
    * under overlap the sweep is SKIPPED with a WARN — a leaked frame is
    * recoverable (session teardown / explicit release), unpersisting a
    * live sibling's rounds mid-run is not. Single-builder sessions (every
    * current caller) sweep exactly as before. */
  def sweepingOnFailure[A](sc: org.apache.spark.SparkContext)(build: => A): A = {
    val ledger = buildLedgers.computeIfAbsent(sc, _ => new BuildLedger)
    // overlap = activity NOT attributable to this thread's own nesting
    val overlapAtEntry = ledger.active.get() - ledger.myDepth.get() > 0
    val globalSnapshot = ledger.started.incrementAndGet()
    ledger.myStarted.set(ledger.myStarted.get() + 1L)
    val mySnapshot = ledger.myStarted.get()
    ledger.active.incrementAndGet()
    ledger.myDepth.set(ledger.myDepth.get() + 1)
    val preexisting = sc.getPersistentRDDs.keySet
    try build catch {
      case t: Throwable =>
        val othersActive = ledger.active.get() - ledger.myDepth.get() > 0
        val othersStartedSince = (ledger.started.get() - globalSnapshot) >
          (ledger.myStarted.get() - mySnapshot)
        val overlapped = overlapAtEntry || othersActive || othersStartedSince
        if (overlapped) {
          sweepLog.warn("sweepingOnFailure: overlapping builds detected in " +
            "this context — skipping the failure sweep (cannot attribute " +
            "newly registered RDDs to this build); release leaked frames " +
            "via the operators' handles or session teardown")
        } else {
          sc.getPersistentRDDs.foreach { case (id, rdd) =>
            if (!preexisting.contains(id)) {
              try rdd.unpersist(blocking = true) catch { case _: Exception => () }
            }
          }
        }
        throw t
    } finally {
      ledger.active.decrementAndGet()
      ledger.myDepth.set(ledger.myDepth.get() - 1)
    }
  }
}
