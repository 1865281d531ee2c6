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
    def mergedEdges: DataFrame = {
      val d = delta.select(col("src"), col("dst"))
      l1.map(_.edges.select(col("src"), col("dst")).unionByName(d))
        .getOrElse(d).distinct()
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
    val l0Dir = EpochDirs.dir(l0Root(root), batchId)
    val l1Dir = EpochDirs.dir(l1Root(root), batchId)
    if (IndexStore.stageMeta(spark, l0Dir, l0Params(hubLimit)).isDefined ||
        IndexStore.graphIndexMeta(spark, l1Dir, params(hubLimit)).isDefined)
      return BatchOutcome.Skipped // replayed after a committed save
    val norm = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct() // within-batch dedup; cross-tier dedup is the read/major's
    Deltas.withMaterialized(norm) { delta =>
      if (delta.isEmpty) BatchOutcome.EmptyBatch // no content-free epochs
      else foldNonEmpty(spark, delta, root, batchId, majorEvery, hubLimit,
        l0Dir, l1Dir)
    }
  }

  private def foldNonEmpty(spark: SparkSession, norm: DataFrame,
                           root: String, batchId: Long, majorEvery: Int,
                           hubLimit: Long, l0Dir: String, l1Dir: String)
      : BatchOutcome = {
    val prevL1 = l1Epochs(spark, root, hubLimit).headOption
    val liveL0 = l0Epochs(spark, root, hubLimit)
      .filter(id => prevL1.forall(id > _))
    if (liveL0.size + 1 < majorEvery) {
      // MINOR: delta-sized durable commit (the whole point of the tier)
      IndexStore.saveStage(spark, norm, l0Dir, s"batch:$batchId",
        l0Params(hubLimit))
      BatchOutcome.Minor
    } else {
      // MAJOR: fold standing L1 + live deltas + this batch into a full
      // index; prune absorbed L0s (grace: only those ≤ the PREVIOUS L1)
      // and old L1 generations after the commit
      val view = loadView(spark, root, hubLimit, prevL1, liveL0,
        strict = true)
      val allEdges = view.map(_.mergedEdges.unionByName(norm).distinct())
        .getOrElse(norm)
      val built =
        try Checkpoints.sweepingOnFailure(spark.sparkContext)(
          Adjacency.build(allEdges, dedup = true, hubLimit = hubLimit))
        finally view.foreach(_.release())
      try IndexStore.saveGraphIndex(spark, built, l1Dir,
        s"batch:$batchId", params(hubLimit))
      finally built.release()
      EpochDirs.prune(spark, l1Root(root),
        l1Epochs(spark, root, hubLimit).take(2).toSet)
      prevL1.foreach { prev =>
        // L0s ≤ the previous L1 are two generations old — no grace left
        val keep = l0Epochs(spark, root, hubLimit).filter(_ > prev).toSet
        EpochDirs.prune(spark, l0Root(root), keep + batchId)
      }
      BatchOutcome.Major(liveL0.size)
    }
  }

  /** Start the tiered roll: `edges` (a streaming `(src, dst)` frame) →
    * per-batch [[foldBatch]] → committed L0/L1 epochs under `root`. */
  def start(edges: DataFrame, root: String, checkpointDir: String,
            majorEvery: Int = 8,
            hubLimit: Long = Adjacency.DefaultHubLimit,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, root, batchId, majorEvery, hubLimit)
        ()
      }
      .start()
}
