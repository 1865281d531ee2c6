package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph ranking (PageRank) in EXACT fixed-point integer
  * arithmetic — the ranking companion to [[Components]]' connected
  * components (the reference pipeline has no graph verbs; this extends the
  * engine's graph family the way the dedup/ANN operators extend its text
  * family).
  *
  * Why fixed-point: float PageRank is reduction-order dependent — the sum
  * of per-edge contributions arrives in nondeterministic partition order,
  * so two runs (or two engines) can disagree in the last ulp and flip a
  * rank ordering. Here every rank is a LONG in units of 1/`scale`, per-edge
  * contributions are floor divisions (`div`), and the damping step is
  * `base + (inflow * 85) div 100` — integer sums are order-independent, so
  * the result is bit-identical under any partitioning and replayable by a
  * single-threaded SQL oracle.
  *
  * Semantics (documented, deliberate):
  *  - rank_0(n) = scale for every node in src(E) ∪ dst(E);
  *  - contribution of edge (s,d) at step i = rank_i(s) div outdeg(s);
  *  - rank_{i+1}(n) = (scale*15) div 100 + (inflow * 85) div 100;
  *  - dangling nodes (no out-edges) receive rank but emit none — their
  *    mass leaks, the standard simplification; symmetrized graphs (e.g.
  *    co-occurrence) have no dangling nodes by construction.
  *
  * Scale shape: the edge list is the big side. It is joined to the rank
  * frame once per iteration, so it is repartitioned on `src` ONCE and
  * persisted — every iteration reuses that layout and only the rank frame
  * (|V| rows, ≪ |E|) moves through a shuffle per step. The per-step
  * aggregate is a partial-aggregating groupBy on dst (map-side combine
  * before the exchange). Plan depth grows linearly in `iters` (each step
  * references the previous once); for the 30+-iteration regime a caller
  * would thread [[Checkpoints.stage]] between rounds — at the ≤8 iterations
  * of the oracle-checked query, lineage stays shallow and nothing beyond
  * the two leaves is ever cached (no per-call cache accumulation — the
  * round-9 d03 lesson).
  *
  * Overflow: total mass never exceeds |V|·scale, and the damping multiply
  * is by 85, so the caller must keep |V|·scale·85 < 2^63 — checked at
  * build time against a caller-supplied node-count bound when provided.
  */
object PageRank {

  /** Ranks plus the handle that frees the two persisted leaves (edge
    * layout + node set). Same contract as [[Dedup.ManagedPairs]]: the
    * caller releases after its terminal action. */
  final case class ManagedRanks(ranks: DataFrame, release: () => Unit)

  /** @param edges directed edge list; duplicates NOT collapsed here —
    *              dedup upstream if multiplicity is not intended
    * @param scale fixed-point unit (rank_0 = scale); must be divisible by
    *              100 so the damping base (scale*15) div 100 is exact */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iters: Int, scale: Long = 1000000000L): ManagedRanks = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1,64], got $iters")
    require(scale >= 100 && scale % 100 == 0,
      s"scale must be >= 100 and divisible by 100, got $scale")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // one repartition buys src-clustered layout for every iteration's join
    val edgesDeg = e.join(deg, "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val base = scale * 15 / 100
    var r = nodes.select(col("node"), lit(scale).as("r"))
    for (_ <- 1 to iters) {
      val inflow = edgesDeg
        .join(r, edgesDeg("src") === r("node"))
        .select(col("dst"), call_function("div", col("r"), col("outdeg")).as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("m"))
      r = nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .select(nodes("node"),
          (lit(base) + call_function("div",
            coalesce(col("m"), lit(0L)) * 85, lit(100L))).as("r"))
    }
    val out = r.join(deg, r("node") === deg("src"), "left")
      .select(r("node"), col("r").as("rank_fp"),
        coalesce(col("outdeg"), lit(0L)).as("outdeg"))
    ManagedRanks(out, () => { edgesDeg.unpersist(); nodes.unpersist(); () })
  }
}
