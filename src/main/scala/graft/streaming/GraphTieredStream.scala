package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Adjacency, Checkpoints, IndexStore}

/** TIERED (L0/L1) epoch commits for the graph family — the LSM answer to
  * the one scale cost [[GraphEpochStream]] documents honestly: there,
  * EVERY batch pays an O(|V|) full-index parquet rewrite for durability,
  * so at 100 TB the recurring rewrite, not the fold, dominates. Here a
  * batch commits only its DELTA:
  *
  *  - **L0 (minor)**: the batch's normalized edges land as their own
  *    committed epoch under `root/l0/epoch=<batchId>` — an O(|Δ|) write.
  *  - **L1 (major)**: every `majorEvery`-th commit folds the standing L1
  *    plus all live L0 deltas into a full [[Adjacency.Hybrid]] index under
  *    `root/l1/epoch=<batchId>` ([[IndexStore.saveGraphIndex]]), then
  *    prunes the L0s it absorbed. Amortized per-batch rewrite cost drops
  *    from O(|V|) to O(|V| / majorEvery + |Δ|).
  *
  * Readers merge ≤ 2 tiers ([[loadCurrent]] → [[Tiered]]): the newest
  * committed L1 plus the live L0 deltas above it. Point reads
  * ([[Tiered.neighbors]]) stay query-proportional — probe the L1 hybrid
  * AND the (small) delta union, dedup per query; full-graph consumers
  * (PageRank and friends) call [[Tiered.mergedHybrid]], which pays the
  * one build a major compaction would.
  *
  * Degree-exactness: a ranking that reads [[Adjacency.Hybrid.outDegrees]]
  * off the L1 tier alone is stale by at most `majorEvery − 1` deltas
  * (standard LSM trade); [[Tiered.mergedOutDegrees]] restores exactness
  * mid-window at |Δ|-proportional cost (the serving path uses it), and
  * [[Tiered.mergedHybrid]] remains the full-build escape hatch for
  * whole-graph consumers.
  *
  * RETRACTION (round 16 — the last family asymmetry): edges can be
  * REMOVED without a full rebuild, the same two-stage story as the
  * vector/PQ/IVFADC/media/signature tiers. Query-time: the `…Excluding`
  * reads on [[Tiered]] anti-join a caller-held tombstone edge set — a
  * GDPR-style "drop this user's co-purchase edges" is served immediately,
  * at dead-set-proportional extra cost per read. Maintenance-window:
  * [[compactMajor]] physically rebuilds the index over the survivor
  * edges into a NEW L1 generation, after which plain reads are clean and
  * the tombstone set can be retired. Tombstones are EDGE-level (src, dst)
  * pairs — the retraction primitive; node-level retraction derives its
  * edge set from a neighbors read first. Because compaction is an
  * out-of-band writer, graph data epochs moved to the strided id scheme
  * ([[TierIds.dataEpoch]]) like the other maintenance families, and every
  * fold stamps/requires the stride layout marker (legacy raw-id roots
  * refuse loudly instead of silently double-applying replays).
  *
  * CRASH MATRIX (the [[GraphEpochStream]] guarantees, preserved per tier —
  * each epoch's IndexStore meta is its commit marker):
  *  - crash mid-L0-write → no marker → replay rewrites the torn dir with
  *    identical content;
  *  - crash mid-L1-compaction → no marker → the standing L1 and EVERY L0
  *    it was folding are still live (pruning runs only after commit) →
  *    replay recompacts and overwrites;
  *  - crash after either commit, before the stream checkpoint → the
  *    replayed batch finds its epoch committed in one of the tiers and
  *    SKIPS — the delta is never applied twice;
  *  - retention: L1 keeps 2 generations; a major prunes only L0s ≤ the
  *    PREVIOUS L1's id, so a reader pinned to generation N−1 (its L1 +
  *    its L0s) survives one subsequent major — the keepEpochs=2 grace
  *    window, tier-shaped.
  *
  * Prototype scope: unweighted edges (the [[GraphEpochStream]] (src, dst)
  * contract); `dedup` must be true — cross-tier duplicate collapse is what
  * the per-query dedup and the major fold implement, a multiplicity-
  * preserving tiering needs per-edge counts in L0 and is out of scope. */
object GraphTieredStream {

  private def l0Root(root: String) = s"$root/l0"
  private def l1Root(root: String) = s"$root/l1"

  private def params(hubLimit: Long): Map[String, String] =
    Map("dedup" -> "true", "hub_limit" -> hubLimit.toString)

  private def l0Params(hubLimit: Long): Map[String, String] =
    params(hubLimit) + ("tier" -> "l0_edges")

  /** Committed L1 epoch ids, newest first. Listing + marker peek only. */
  def l1Epochs(spark: SparkSession, root: String, hubLimit: Long): Seq[Long] =
    EpochDirs.rawIds(spark, l1Root(root))
      .filter(id => IndexStore.graphIndexMeta(spark,
        EpochDirs.dir(l1Root(root), id), params(hubLimit)).isDefined)
      .sorted(Ordering[Long].reverse)

  /** Committed L0 epoch ids, newest first. */
  def l0Epochs(spark: SparkSession, root: String, hubLimit: Long): Seq[Long] =
    EpochDirs.rawIds(spark, l0Root(root))
      .filter(id => IndexStore.stageMeta(spark,
        EpochDirs.dir(l0Root(root), id), l0Params(hubLimit)).isDefined)
      .sorted(Ordering[Long].reverse)

  /** The ≤-2-tier reader view: newest committed L1 (possibly absent —
    * pre-first-major streams serve from deltas alone) plus the live L0
    * deltas ABOVE it, unioned lazily. `release()` frees the L1 handle. */
  final case class Tiered(
      epochId: Long,
      l1: Option[Adjacency.Hybrid],
      delta: DataFrame,
      release: () => Unit) {

    /** Query-proportional point read: distinct neighbors of each `per`
      * row's `src` across both tiers, as (qid…payload, dst). The L1 side
      * is the hybrid's join-then-explode; the delta side is a plain
      * equi-join on the (≤ majorEvery batches of) delta rows. Distinct
      * AFTER the union collapses cross-tier duplicate edges — per query,
      * never over the corpus. */
    def neighbors(per: DataFrame): DataFrame = {
      val payload = per.columns.filter(_ != "src").toSeq.map(col)
      val outCols = payload :+ col("dst")
      val l1Side = l1.map(_.expand(per).select(outCols: _*))
      val deltaSide = delta.join(per, Seq("src")).select(outCols: _*)
      l1Side.fold(deltaSide)(_.unionByName(deltaSide)).distinct()
    }

    /** The merged edge set (src, dst), deduped across tiers — the L1
      * edges pay one explode (the [[Adjacency.Hybrid.edges]] contract). */
    def mergedEdges: DataFrame = rawEdges.distinct()

    /** [[mergedEdges]] WITHOUT the cross-tier distinct — the major/compact
      * path feeds this straight into `Adjacency.build(dedup = true)`,
      * whose collect_set / flat-distinct collapses duplicates anyway; a
      * pre-distinct there was a full extra shuffle of the merged corpus.
      * (L1 edges are already deduped by the build contract; duplicates
      * can only come from delta rows re-deriving a stored edge.) */
    private[graft] def rawEdges: DataFrame = {
      val d = delta.select(col("src"), col("dst"))
      l1.map(_.edges.select(col("src"), col("dst")).unionByName(d))
        .getOrElse(d)
    }

    /** EXACT cross-tier out-degrees at |Δ| cost — upgrades the
      * degree-staleness trade documented above without paying
      * [[mergedHybrid]]'s full build: the L1 degrees are adjusted by the
      * delta edges NOT already present in L1 (cross-tier duplicates must
      * not double-count). The L1-membership probe is one-hop and
      * delta-proportional: only the DELTA's srcs are expanded (work
      * bounded by their total L1 degree), never the corpus; the
      * adjustment and new-src frames are |Δ|-sized (AQE broadcasts them
      * at runtime when small — no forced hint, see below). The
      * tiered serve path ranks with this, so tiered-served answers equal
      * flat-served answers exactly. */
    def mergedOutDegrees: DataFrame = {
      val d = delta.select(col("src"), col("dst")).distinct()
      l1 match {
        case None =>
          d.groupBy("src").agg(count(lit(1)).as("outdeg"))
        case Some(hyb) =>
          val srcs = d.select("src").distinct()
          val existing = hyb.expand(srcs.withColumn("qid", col("src")))
            .select(col("qid").as("src"), col("dst"))
          val add = d.join(existing, Seq("src", "dst"), "left_anti")
            .groupBy("src").agg(count(lit(1)).as("add"))
          // srcs with ≥1 L1 out-edge have ≥1 expand row, so this small
          // frame IS the delta-srcs ∩ L1-degree-table membership set.
          // No forced broadcast on either delta-derived frame: |Δ_src| is
          // bounded only by the majorEvery window, and this plan runs per
          // serve micro-batch — a measured-count guard (the Adjacency
          // convention) would cost a count job per batch, so the runtime
          // decision is left to AQE, which broadcasts small sides without
          // a driver-OOM risk on a fat delta window (review finding).
          val srcsInL1 = existing.select("src").distinct()
          hyb.outDegrees.select(col("src"), col("outdeg"))
            .join(add, Seq("src"), "left")
            .select(col("src"),
              (col("outdeg") + coalesce(col("add"), lit(0L))).as("outdeg"))
            .unionByName(add.join(srcsInL1, Seq("src"), "left_anti")
              .select(col("src"), col("add").as("outdeg")))
      }
    }

    /** Full-adjacency view for whole-graph consumers: pays the build a
      * major compaction would (use at L1 cadence, not per query). Caller
      * releases the returned hybrid; this [[Tiered]] stays usable. */
    def mergedHybrid(hubLimit: Long = Adjacency.DefaultHubLimit): Adjacency.Hybrid =
      Checkpoints.sweepingOnFailure(delta.sparkSession.sparkContext)(
        Adjacency.build(mergedEdges, dedup = true, hubLimit = hubLimit))

    // ---- tombstoned-edge exclusion reads (query-time retraction) ----
    // `dead` is a (src, dst) edge tombstone frame held by the caller (the
    // ivfProbeExcluding pattern at the graph layer). No forced broadcast
    // on it: tombstone sets are usually tiny and AQE broadcasts them at
    // runtime, but a bulk GDPR sweep may not be — the mergedOutDegrees
    // review convention.

    /** [[neighbors]] with a tombstone edge set excluded — the point-read
      * retraction path. The anti-join keys on the PRE-projection
      * (src, dst), so only the queried sources' dead edges ever join;
      * cost stays query-proportional plus the dead-set join. */
    def neighborsExcluding(per: DataFrame, dead: DataFrame): DataFrame = {
      val payload = per.columns.filter(_ != "src").toSeq.map(col)
      val outCols = payload :+ col("dst")
      // "__src" survives expand as payload, keeping the src key next to
      // each produced dst so the edge-level anti-join has both halves
      val keyed = per.withColumn("__src", col("src"))
      val l1Side = l1.map(_.expand(keyed).select((col("__src") +: outCols): _*))
      val deltaSide = delta.join(keyed, Seq("src"))
        .select((col("__src") +: outCols): _*)
      l1Side.fold(deltaSide)(_.unionByName(deltaSide))
        .join(dead.select(col("src").as("__src"), col("dst")).distinct(),
          Seq("__src", "dst"), "left_anti")
        .select(outCols: _*).distinct()
    }

    /** [[mergedEdges]] minus the tombstone set — the survivor edge
      * multiset a physical compaction would store. */
    def mergedEdgesExcluding(dead: DataFrame): DataFrame =
      mergedEdges.join(
        dead.select(col("src"), col("dst")).distinct(),
        Seq("src", "dst"), "left_anti")

    /** EXACT out-degrees over the survivor edge set at |dead|-proportional
      * extra cost (never a full re-count): only the tombstoned SOURCES'
      * stored edges are recovered (the semi-join sits below the L1
      * explode, the [[mergedOutDegrees]] discipline), a tombstone naming
      * an edge that is not actually stored subtracts nothing, and sources
      * whose every edge died vanish from the output — degrees equal
      * `mergedEdgesExcluding(dead).groupBy(src).count()` exactly. */
    def mergedOutDegreesExcluding(dead: DataFrame): DataFrame = {
      val dd = dead.select(col("src"), col("dst")).distinct()
      val srcs = dd.select("src").distinct()
      val l1Side = l1.map(h => h.expand(srcs.withColumn("qid", col("src")))
        .select(col("qid").as("src"), col("dst")))
      val dSide = delta.join(srcs, Seq("src")).select(col("src"), col("dst"))
      val stored = l1Side.fold(dSide)(_.unionByName(dSide)).distinct()
      val rm = dd.join(stored, Seq("src", "dst"), "left_semi")
        .groupBy("src").agg(count(lit(1)).as("__rm"))
      mergedOutDegrees.join(rm, Seq("src"), "left")
        .select(col("src"),
          (col("outdeg") - coalesce(col("__rm"), lit(0L))).as("outdeg"))
        .filter(col("outdeg") > 0)
    }

    /** Full-adjacency view over the survivor edges — what [[compactMajor]]
      * commits durably, available to a whole-graph consumer that cannot
      * wait for the maintenance window. Caller releases. */
    def mergedHybridExcluding(dead: DataFrame,
        hubLimit: Long = Adjacency.DefaultHubLimit): Adjacency.Hybrid =
      Checkpoints.sweepingOnFailure(delta.sparkSession.sparkContext)(
        Adjacency.build(mergedEdgesExcluding(dead), dedup = true,
          hubLimit = hubLimit))
  }

  /** The id [[loadCurrent]] would return — the serving pin's zero-job
    * staleness check (listing + marker peeks only). `None` before any
    * commit (either tier counts — the graph tier serves from deltas
    * alone pre-first-major). */
  def currentEpochId(spark: SparkSession, root: String,
                     hubLimit: Long = Adjacency.DefaultHubLimit): Option[Long] = {
    val l1Id = l1Epochs(spark, root, hubLimit).headOption
    val ids = l1Id.toSeq ++
      l0Epochs(spark, root, hubLimit).filter(id => l1Id.forall(id > _))
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Load the newest committed tiered view; `None` before any commit.
    * Zero Spark jobs until a frame is consumed. */
  def loadCurrent(spark: SparkSession, root: String,
                  hubLimit: Long = Adjacency.DefaultHubLimit): Option[Tiered] = {
    val l1Id = l1Epochs(spark, root, hubLimit).headOption
    val liveL0 = l0Epochs(spark, root, hubLimit)
      .filter(id => l1Id.forall(id > _)).sorted
    loadView(spark, root, hubLimit, l1Id, liveL0)
  }

  /** The view over an ALREADY-LISTED (l1Id, liveL0) pair — shared by
    * [[loadCurrent]] and the major path of [[foldBatch]] so a major never
    * re-lists the tiers it just enumerated (per-epoch meta reads double
    * on an object store otherwise). */
  private def loadView(spark: SparkSession, root: String, hubLimit: Long,
                       l1Id: Option[Long], liveL0: Seq[Long],
                       strict: Boolean = false): Option[Tiered] = {
    if (l1Id.isEmpty && liveL0.isEmpty) return None
    val l1 = l1Id.flatMap(id => IndexStore.loadGraphIndex(spark,
      EpochDirs.dir(l1Root(root), id), expectedParams = params(hubLimit)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("dst",
          org.apache.spark.sql.types.LongType))))
    // strict = fold/major path: a listed committed L0 that fails to load
    // would be silently absent from the new L1 (durable data loss) —
    // fail loudly there; readers tolerate the race.
    val delta = liveL0.sorted
      .flatMap { id =>
        val st = IndexStore.loadStage(spark,
          EpochDirs.dir(l0Root(root), id), None, l0Params(hubLimit))
        if (strict && st.isEmpty)
          sys.error(s"committed L0 epoch=$id vanished mid-major")
        st
      }
      .foldLeft(empty)(_ unionByName _)
    Some(Tiered((l1Id.toSeq ++ liveL0).max, l1, delta,
      () => l1.foreach(_.release())))
  }

  /** Fold ONE batch of `(src, dst)` edges: an O(|Δ|) L0 commit, except
    * every `majorEvery`-th live delta triggers the L1 major compaction.
    * Idempotent under replay (either tier's committed marker skips).
    * Pure batch logic — unit-testable without a stream. */
  def foldBatch(edges: DataFrame, root: String, batchId: Long,
                majorEvery: Int = 8,
                hubLimit: Long = Adjacency.DefaultHubLimit): BatchOutcome = {
    require(majorEvery >= 2, s"majorEvery must be >= 2, got $majorEvery")
    val spark = edges.sparkSession
    // data epochs live at batchId × MaintenanceSlots so an out-of-band
    // compaction (standing-epoch + 1) can never take the NEXT batch's id
    // and turn its replay check into silent data loss
    TierIds.ensureStrideLayout(spark, root) // refuse pre-stride legacy roots
    val epochId = TierIds.dataEpoch(batchId)
    val l0Dir = EpochDirs.dir(l0Root(root), epochId)
    val l1Dir = EpochDirs.dir(l1Root(root), epochId)
    if (IndexStore.stageMeta(spark, l0Dir, l0Params(hubLimit)).isDefined ||
        IndexStore.graphIndexMeta(spark, l1Dir, params(hubLimit)).isDefined)
      return BatchOutcome.Skipped // replayed after a committed save
    val norm = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct() // within-batch dedup; cross-tier dedup is the read/major's
    Deltas.withMaterialized(norm) { delta =>
      if (delta.isEmpty) BatchOutcome.EmptyBatch // no content-free epochs
      else foldNonEmpty(spark, delta, root, epochId, majorEvery, hubLimit,
        l0Dir, l1Dir)
    }
  }

  private def foldNonEmpty(spark: SparkSession, norm: DataFrame,
                           root: String, epochId: Long, majorEvery: Int,
                           hubLimit: Long, l0Dir: String, l1Dir: String)
      : BatchOutcome = {
    val prevL1 = l1Epochs(spark, root, hubLimit).headOption
    val liveL0 = l0Epochs(spark, root, hubLimit)
      .filter(id => prevL1.forall(id > _))
    import graft.io.JobLabels.labeled
    if (liveL0.size + 1 < majorEvery) {
      // MINOR: delta-sized durable commit (the whole point of the tier)
      labeled(spark.sparkContext, s"graph-tier e$epochId: minor-save")(
        IndexStore.saveStage(spark, norm, l0Dir, s"epoch:$epochId",
          l0Params(hubLimit)))
      BatchOutcome.Minor
    } else {
      // MAJOR: fold standing L1 + live deltas + this batch into a full
      // index; prune absorbed L0s (grace: only those ≤ the PREVIOUS L1)
      // and old L1 generations after the commit. The merged union feeds
      // the build RAW (no pre-distinct): with dedup=true the build's own
      // collect_set / flat-distinct collapses cross-tier duplicates, so a
      // distinct here was a full extra shuffle of the merged corpus per
      // major for nothing (hub routing is by raw multiplicity by
      // contract — conservative, result-identical).
      val view = loadView(spark, root, hubLimit, prevL1, liveL0,
        strict = true)
      val allEdges = view.map(v => v.rawEdges.unionByName(norm))
        .getOrElse(norm)
      val built =
        try labeled(spark.sparkContext, s"graph-tier e$epochId: major-build")(
          Checkpoints.sweepingOnFailure(spark.sparkContext)(
            Adjacency.build(allEdges, dedup = true, hubLimit = hubLimit)))
        finally view.foreach(_.release())
      try labeled(spark.sparkContext, s"graph-tier e$epochId: major-save")(
        IndexStore.saveGraphIndex(spark, built, l1Dir,
          s"epoch:$epochId", params(hubLimit)))
      finally built.release()
      EpochDirs.prune(spark, l1Root(root),
        l1Epochs(spark, root, hubLimit).take(2).toSet)
      prevL1.foreach { prev =>
        // L0s ≤ the previous L1 are two generations old — no grace left
        val keep = l0Epochs(spark, root, hubLimit).filter(_ > prev).toSet
        EpochDirs.prune(spark, l0Root(root), keep + epochId)
      }
      BatchOutcome.Major(liveL0.size)
    }
  }

  /** Maintenance-window PHYSICAL edge retraction through the major path —
    * the media/signature [[MediaTieredStream.compactMajor]] shape at the
    * graph layer: one scan decides (total + dead edges counted together
    * against the broadcast tombstone pair set over the merged ≤2-tier
    * view), and at dead share ≥ `threshold` the survivor edges are
    * anti-joined out ONCE, rebuilt into a full [[Adjacency.Hybrid]]
    * (exactly the build a data major pays — compaction is a major, not a
    * new cost class), and committed as a NEW L1 generation at
    * `epochId + 1` (a maintenance slot — can never collide with the next
    * streaming batch's strided id). Live L0s are absorbed: after the
    * commit the new L1 sits above every data epoch, so plain reads are
    * clean of the dead edges with no tombstone anti-join, and the
    * previous generation's L0s keep the data major's one-generation
    * reader grace. `None` below threshold, when no tombstoned edge is
    * actually stored, AND on a minors-only root (no standing L1
    * generation yet — compaction is an L1 rewrite; before the first data
    * major there is nothing to rewrite, and a caller needing dead edges
    * gone that early reads through [[Tiered.mergedEdgesExcluding]]).
    * Single writer, idempotent under re-run (a second call with the same
    * tombstones finds no stored dead edge and returns None). */
  def compactMajor(spark: SparkSession, root: String, tombstones: DataFrame,
                   threshold: Double = 0.0,
                   hubLimit: Long = Adjacency.DefaultHubLimit): Option[Long] =
    l1Epochs(spark, root, hubLimit).headOption.flatMap { prevL1 =>
      val liveL0 = l0Epochs(spark, root, hubLimit).filter(_ > prevL1)
      val view = loadView(spark, root, hubLimit, Some(prevL1), liveL0,
        strict = true)
        .getOrElse(sys.error(s"standing L1 epoch=$prevL1 vanished mid-compact"))
      try {
        val dead = broadcast(tombstones
          .select(col("src").cast("long").as("src"),
            col("dst").cast("long").as("dst")).distinct())
        val counts = graft.io.JobLabels.labeled(spark.sparkContext,
          "graph-tier compact: dead-share") {
          view.mergedEdges
            .join(dead.withColumn("__dead", lit(1)), Seq("src", "dst"), "left")
            .agg(count(lit(1)).as("total"), sum("__dead").as("dead"))
            .collect()(0)
        }
        val total = counts.getLong(0)
        val deadN = if (counts.isNullAt(1)) 0L else counts.getLong(1)
        if (deadN == 0 || total == 0 || deadN.toDouble / total < threshold)
          None
        else {
          // survivors feed the build RAW (rawEdges, not mergedEdges): the
          // anti-join drops every copy of a dead pair and the dedup=true
          // build collapses the rest — the pre-distinct was an extra
          // corpus-wide shuffle (same argument as the data major)
          val built = graft.io.JobLabels.labeled(spark.sparkContext,
            "graph-tier compact: rebuild")(
            Checkpoints.sweepingOnFailure(spark.sparkContext)(
              Adjacency.build(
                view.rawEdges.join(dead, Seq("src", "dst"), "left_anti"),
                dedup = true, hubLimit = hubLimit)))
          val newId = view.epochId + 1
          try IndexStore.saveGraphIndex(spark, built,
            EpochDirs.dir(l1Root(root), newId), s"compact after=$prevL1",
            params(hubLimit))
          finally built.release()
          EpochDirs.prune(spark, l1Root(root),
            l1Epochs(spark, root, hubLimit).take(2).toSet)
          EpochDirs.prune(spark, l0Root(root),
            l0Epochs(spark, root, hubLimit).filter(_ > prevL1).toSet)
          Some(newId)
        }
      } finally view.release()
    }

  /** Start the tiered roll: `edges` (a streaming `(src, dst)` frame) →
    * per-batch [[foldBatch]] → committed L0/L1 epochs under `root`.
    * `maintenance` opts into scheduled in-stream compaction after data
    * majors — the graph policy's tombstone supplier yields (src, dst)
    * EDGE pairs and `tombId` is ignored ([[MaintenancePolicy]]). */
  def start(edges: DataFrame, root: String, checkpointDir: String,
            majorEvery: Int = 8,
            hubLimit: Long = Adjacency.DefaultHubLimit,
            maintenance: Option[MaintenancePolicy] = None,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    var majorsSeen = 0L // instance cadence only; safety is the ops' own
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, root, batchId, majorEvery, hubLimit) match {
          case BatchOutcome.Major(_) =>
            majorsSeen += 1
            maintenance.filter(_.due(majorsSeen)).foreach { p =>
              p.tombstones.foreach(ts => compactMajor(batch.sparkSession,
                root, ts(), p.threshold, hubLimit))
            }
          case _ => ()
        }
        ()
      }
      .start()
  }
}
