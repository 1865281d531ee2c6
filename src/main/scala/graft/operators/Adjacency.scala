package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HUB-SAFE adjacency for the iterative graph operators ([[PageRank]],
  * [[LabelPropagation]], [[BfsHops]], [[CheapestPaths]]) — the one shared
  * mechanism that closes the family's documented scale hole.
  *
  * The array layout (one `(src, dsts[])` row per source, built by a single
  * aggregating shuffle) is the right trade for bounded-degree graphs: the
  * |V|-row frame is what every round re-reads, and collect_set dedups in
  * the same pass. But it bounds per-node memory by MAX OUT-DEGREE — a
  * power-law graph with a 10⁸-degree hub would materialize a multi-GB
  * array row and OOM the executor that gets it. Previously that fallback
  * was prose in the operators' scaladoc; this makes it code:
  *
  *  - a COUNT pre-pass over the (persisted) edge frame measures per-source
  *    multiplicity — cheap (map-side combinable, two longs per row) and
  *    the only way to know a hub exists without first building its array;
  *  - sources above `hubLimit` are routed to a FLAT (src, dst[, w]) layout
  *    — plain rows, partitioned like any fact table, no per-row bound —
  *    and their arrays are NEVER built (the anti-join removes them before
  *    the collect);
  *  - everyone else keeps the array layout, so the common case pays one
  *    extra count shuffle and nothing else;
  *  - [[Hybrid.expand]] joins a per-source frame into BOTH layouts and
  *    unions flat (dst [, w], outdeg, payload…) rows — the operators'
  *    round arithmetic is identical over either layout, so results are
  *    bit-identical whatever the routing (pinned per operator in
  *    GraphHubSpec against a planted extreme-degree hub).
  *
  * Routing is by RAW multiplicity, deliberately: with `dedup=true` a
  * source whose duplicates collapse below the limit may still route flat —
  * conservative (the flat path applies the same distinct), never wrong,
  * and it means the pre-pass needs no exact distinct-count per source.
  *
  * The pre-pass also yields measured sizes for free: the array frame is
  * coalesced to ~[[Checkpoints.partitionsForRows]] of the measured edge
  * count (a |V|-row frame left at the session's shuffle-partition width is
  * pure task-count overhead on small graphs — the RoundFloor finding), and
  * `srcCount`/`edgeCount` are exposed so operators can size their round
  * exchanges the same way.
  */
object Adjacency {

  /** Sources with more than this many (raw) out-edges keep the flat
    * layout. 2^17 longs ≈ 1 MB serialized per array row — comfortably
    * inside any executor, far above real bounded-degree graphs (q65's
    * co-purchase degrees are in the hundreds), far below the 10⁸-degree
    * hubs of web/social graphs. */
  val DefaultHubLimit: Long = 131072L

  /** Measured-count bar under which a (node)/(src, outdeg)-shaped frame
    * gets a broadcast hint. 10^6 single-long rows ≈ 8 MB serialized —
    * inside Spark's default 10 MB autoBroadcastJoinThreshold, so the hint
    * never forces a broadcast the planner's own bar would refuse. Shared
    * by this build, [[Hybrid.expand]], [[KCore]] and [[BfsHops]] so the
    * whole graph family routes through one constant; above it the joins
    * fall back to shuffle (exercised in GraphHubSpec). */
  val BroadcastRowLimit: Long = 1000000L

  /** Conf flag: when true, operators taking a `symmetric` caller
    * assertion verify it ([[Hybrid.requireSymmetric]]) instead of
    * trusting it — a lying caller fails loudly rather than silently
    * dropping dst-only nodes from the node set. Off by default: the check
    * costs the very explode+distinct+anti-join that `symmetric=true`
    * exists to skip. */
  val SymmetryCheckConf = "spark.graft.graph.symmetryCheck"

  def symmetryCheckEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption(SymmetryCheckConf)
      .exists(_.trim.equalsIgnoreCase("true"))

  /** The two-layout adjacency. `arrayAdj` = (src, dsts, outdeg) for
    * bounded-degree sources; `flat` = (src, dst[, w]) rows for hub
    * sources; `hubDeg` = (src, outdeg) for hubs only (≤ |E|/hubLimit rows
    * by construction, always broadcastable). Frames are MATERIALIZED at
    * build (the caller can rely on eager failure — e.g. CheapestPaths'
    * negative-weight refusal fires here even with empty seeds). */
  final case class Hybrid(
      weighted: Boolean,
      arrayAdj: DataFrame,
      flat: DataFrame,
      hubDeg: DataFrame,
      hubCount: Long,
      srcCount: Long,
      edgeCount: Long,
      release: () => Unit,
      bcastLimit: Long = BroadcastRowLimit) {

    /** Join a per-source frame (must carry a `src` column; every other
      * column is payload) into both layouts: returns flat rows
      * (dst [, w], outdeg, payload…) — one per out-edge of each `per`
      * source, multiplicity per the build's `dedup` flag. The array side
      * is the usual join-explode; the flat side is a plain equi-join with
      * the (tiny) hubDeg broadcast riding along for outdeg. When no hubs
      * exist the union is skipped entirely, keeping the common-case plan
      * identical to the pure-array form. */
    def expand(per: DataFrame): DataFrame = {
      val reserved = Set("dst", "w", "outdeg", "dsts", "__e")
      val clash = per.columns.filter(c => c != "src" && reserved(c))
      require(clash.isEmpty,
        s"expand payload column(s) ${clash.mkString(", ")} collide with " +
          "the columns expand produces (dst/w/outdeg) — rename them " +
          "before joining")
      val payload = per.columns.filter(_ != "src").toSeq.map(col)
      val arr =
        if (weighted)
          arrayAdj.join(per, Seq("src"))
            .select((explode(col("dsts")).as("__e") +: col("outdeg") +:
              payload): _*)
            .select((col("__e.dst").as("dst") +: col("__e.w").as("w") +:
              col("outdeg") +: payload): _*)
        else
          arrayAdj.join(per, Seq("src"))
            .select((explode(col("dsts")).as("dst") +: col("outdeg") +:
              payload): _*)
      if (hubCount == 0) arr
      else {
        // hubDeg has hubCount rows (up to |E|/hubLimit) — hint only under
        // the same measured bar the build uses; a graph pathological
        // enough to exceed it must shuffle, not OOM the driver
        val hd = if (hubCount <= bcastLimit) broadcast(hubDeg)
                 else hubDeg
        val base = flat.join(hd, Seq("src"))
          .join(per, Seq("src"))
        val fl =
          if (weighted)
            base.select((col("dst") +: col("w") +: col("outdeg") +:
              payload): _*)
          else base.select((col("dst") +: col("outdeg") +: payload): _*)
        arr.unionByName(fl)
      }
    }

    /** Distinct sources, as (node) — the layouts partition the source set,
      * so the union needs no distinct. */
    def srcs: DataFrame = {
      val a = arrayAdj.select(col("src").as("node"))
      if (hubCount == 0) a else a.union(hubDeg.select(col("src").as("node")))
    }

    /** src(E) ∪ dst(E), distinct, as (node). */
    def allNodes: DataFrame = {
      val dstExpr =
        if (weighted) explode(col("dsts")).as("__e") else explode(col("dsts")).as("node")
      val arrDsts =
        if (weighted)
          arrayAdj.select(dstExpr).select(col("__e.dst").as("node"))
        else arrayAdj.select(dstExpr)
      val all = srcs.union(arrDsts)
      (if (hubCount == 0) all
       else all.union(flat.select(col("dst").as("node")))).distinct()
    }

    /** (src, outdeg) across both layouts. */
    def outDegrees: DataFrame = {
      val a = arrayAdj.select(col("src"), col("outdeg"))
      if (hubCount == 0) a else a.union(hubDeg.select(col("src"), col("outdeg")))
    }

    /** Verify the `symmetric` caller assertion (every node occurs as a
      * src): counts dst-only nodes and refuses if any exist. Costs the
      * full node-set pass the assertion normally skips — run under
      * [[SymmetryCheckConf]], not unconditionally. */
    def requireSymmetric(): Unit = {
      val dstOnly = allNodes.join(srcs, Seq("node"), "left_anti").count()
      require(dstOnly == 0L,
        s"symmetric=true but $dstOnly node(s) occur only as a dst — " +
          "they would silently get no output row; symmetrize the edge " +
          "list or pass symmetric=false")
    }
  }

  /** Build the hybrid adjacency. `edges` must already be normalized to
    * columns (src LONG, dst LONG) — plus (w LONG) for the weighted form,
    * detected by schema. `dedup=true` collapses duplicate (src,dst) rows
    * in BOTH layouts (collect_set / distinct); weighted edges are never
    * deduped (multiplicity is the caller's contract there).
    *
    * Materialization order matters: the edge frame is persisted so the
    * caller's (possibly expensive) edge generation runs ONCE across the
    * degree pre-pass and both layout builds, then freed as soon as the
    * layouts are durable. Callers wrap the build in
    * [[Checkpoints.sweepingOnFailure]] like every other eager iterative
    * build. */
  def build(edges: DataFrame, dedup: Boolean,
            hubLimit: Long = DefaultHubLimit,
            broadcastRowLimit: Long = BroadcastRowLimit): Hybrid = {
    require(hubLimit >= 1, s"hubLimit must be >= 1, got $hubLimit")
    val weighted = edges.columns.contains("w")
    require(!(weighted && dedup), "dedup applies to unweighted edges only")
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val degrees = e.groupBy("src").agg(count(lit(1)).as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val srcCount = degrees.count()
    val edgeCount = degrees.agg(sum(col("n"))).collect()(0) match {
      case row if row.isNullAt(0) => 0L
      case row => row.getLong(0)
    }
    val hubSrcs = degrees.filter(col("n") > hubLimit).select("src")
    val hubCount = hubSrcs.count()
    // the hub source LIST is ≤ |E|/hubLimit rows — broadcast it below the
    // same measured-count bar the operators' semi-joins use
    val hub = if (hubCount > 0 && hubCount <= broadcastRowLimit)
                broadcast(hubSrcs)
              else hubSrcs
    val collected =
      if (weighted) collect_list(struct(col("dst"), col("w")))
      else if (dedup) collect_set(col("dst"))
      else collect_list(col("dst"))
    val nonHub = if (hubCount == 0) e else e.join(hub, Seq("src"), "left_anti")
    val arrayAdj = nonHub.groupBy("src").agg(collected.as("dsts"))
      .select(col("src"), col("dsts"),
        size(col("dsts")).cast("long").as("outdeg"))
      // measured sizing: array bytes scale with |E|, so size partitions by
      // the measured edge count, not the session's shuffle width — a 20k-
      // source graph becomes a handful of tasks per round instead of 32
      // (the RoundFloor finding); a 100-TB graph keeps its parallelism
      .coalesce(Checkpoints.partitionsForRows(edgeCount))
      .persist(StorageLevel.MEMORY_AND_DISK)
    arrayAdj.count()
    val (flat, hubDeg) =
      if (hubCount == 0) (e.limit(0), e.limit(0).groupBy("src")
        .agg(count(lit(1)).as("outdeg")))
      else {
        val f0 = e.join(hub, Seq("src"), "left_semi")
        val f = (if (dedup) f0.distinct() else f0)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val hd = f.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
        hd.count() // materializes f (first use) and hd in one job
        (f, hd)
      }
    e.unpersist()
    degrees.unpersist()
    Hybrid(weighted, arrayAdj, flat, hubDeg, hubCount, srcCount, edgeCount,
      () => {
        arrayAdj.unpersist()
        if (hubCount > 0) { flat.unpersist(); hubDeg.unpersist() }
        ()
      },
      bcastLimit = broadcastRowLimit)
  }
}
