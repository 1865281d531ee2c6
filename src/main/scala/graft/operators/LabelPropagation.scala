package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Community detection by synchronous label propagation (LPA) in EXACT,
  * replayable semantics — the clustering member of the graph family beside
  * [[PageRank]] (ranking), [[Components]] (connectivity) and the q56
  * transitive closure (reachability). The reference pipeline has no graph
  * verbs; this extends the engine the way the dedup/ANN operators extend
  * its text family.
  *
  * Classic LPA is famously nondeterministic (async update order + random
  * tie-breaks). This form removes both sources:
  *  - SYNCHRONOUS rounds: every round-i label is computed from the complete
  *    round-(i-1) labelling, so partition order cannot matter;
  *  - TOTAL-ORDER tie-break: the new label is the neighbor label with the
  *    highest multiplicity, ties broken by the SMALLEST label value —
  *    `min(struct(-count, label))` — an order-independent integer argmin.
  * The result is bit-identical under any partitioning and replayable by a
  * single-threaded SQL oracle as unrolled CTEs (one count + one argmax per
  * round), which is how q70 certifies it.
  *
  * Semantics (documented, deliberate):
  *  - label_0(n) = n for every node in src(E) ∪ dst(E);
  *  - label_{i+1}(n) = argmax-by-(count, then min-label) over the labels of
  *    n's IN-neighbors at round i (an edge (s,d) carries s's label to d,
  *    once per multiplicity unless `dedupEdges`);
  *  - a node with no in-edges keeps its previous label (cannot happen on
  *    symmetrized graphs, where in(n) = out(n) ≠ ∅ by construction);
  *  - synchronous LPA can two-cycle on bipartite-ish structures instead of
  *    converging — `iters` is therefore a FIXED budget, not a convergence
  *    loop, and the oracle replays exactly that budget.
  *
  * Scale shape: identical to [[PageRank]] — the edge list collapses into a
  * persisted per-src adjacency frame (|V| rows) by one aggregating shuffle
  * (`dedupEdges` dedups inside that same pass); each round joins the |V|-row
  * label frame into it, explodes (dst, label) carriers, counts them with
  * map-side partial aggregation, and argmaxes per dst. Rounds are STAGED
  * (eager [[Checkpoints]]) with the previous round freed immediately —
  * unstaged rounds are lazy subtrees every later round re-executes,
  * O(iters²) total work (measured on PageRank, same machinery).
  *
  * Degree caveat: as with [[PageRank]], the adjacency array bounds per-node
  * memory by max out-degree — right for bounded-degree graphs; a power-law
  * graph with extreme hubs would keep the flat (src, dst) layout and pay
  * the per-round |E|-row join instead.
  */
object LabelPropagation {

  /** Labels plus the handle that frees the persisted/staged frames (the
    * [[PageRank.ManagedRanks]] contract: release after the terminal
    * action). `labels` has columns (node LONG, label LONG). */
  final case class ManagedLabels(labels: DataFrame, release: () => Unit)

  /** @param edges directed edge list; symmetrize first for undirected LPA
    * @param iters fixed round budget (each replayable in an unrolled CTE)
    * @param dedupEdges collapse duplicate (src,dst) rows inside the
    *              adjacency build; false → a repeated edge carries its
    *              label once per repeat
    * @param symmetric caller asserts every node occurs as a src — the node
    *              set then reads off the adjacency frame directly */
  def labels(edges: DataFrame, srcCol: String, dstCol: String,
             iters: Int, dedupEdges: Boolean = false,
             symmetric: Boolean = false): ManagedLabels = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1,64], got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val collected =
      if (dedupEdges) collect_set(col("dst")) else collect_list(col("dst"))
    val adj = e.groupBy("src").agg(collected.as("dsts"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes =
      if (symmetric) adj.select(col("src").as("node"))
      else adj.select(col("src").as("node"))
        .union(adj.select(explode(col("dsts")).as("node")))
        .distinct()

    val sc = edges.sparkSession.sparkContext
    // no measured-size round-partition override here (KCore's trick):
    // probed at sf0.1 — LPA/BFS/min-plus rounds move frontier-sized or
    // carrier-sized frames small enough that the extra measuring job
    // costs more than the task-count saving; KCore's rounds re-scan the
    // full 2|E|-row degree union, which is where the override pays.
    def build(): ManagedLabels = {
      var r = Checkpoints.stage(nodes.select(col("node"), col("node").as("lab")))
      for (_ <- 1 to iters) {
        // carriers: every in-edge delivers its src's round-(i-1) label
        val votes = adj
          .join(r, adj("src") === r("node"))
          .select(explode(col("dsts")).as("dst"), col("lab"))
          .groupBy("dst", "lab")
          .agg(count(lit(1)).as("c"))
        // argmax by (count desc, label asc) as one order-independent
        // integer argmin — no window, one exchange on dst (a prefix of the
        // (dst,lab) count key, so AQE-local)
        val upd = votes.groupBy("dst")
          .agg(min(struct((-col("c")).as("nc"), col("lab"))).as("m"))
          .select(col("dst"), col("m.lab").as("newlab"))
        val next = Checkpoints.stage(
          r.join(upd, r("node") === upd("dst"), "left")
            .select(r("node"), coalesce(col("newlab"), r("lab")).as("lab")))
        Checkpoints.release(r)
        r = next
      }
      val rFinal = r
      // rFinal is a staged checkpoint with no dependency on adj — free the
      // |V|-row adjacency cache NOW, not at the caller's release (review
      // finding: holding it through the consume phase evicts blocks other
      // queries need; the sibling operators all free it here)
      adj.unpersist()
      ManagedLabels(rFinal, () => { Checkpoints.release(rFinal); () })
    }
    Checkpoints.sweepingOnFailure(sc)(build())
  }
}
