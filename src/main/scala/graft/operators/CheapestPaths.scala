package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source WEIGHTED shortest paths (min-plus relaxation, bounded
  * rounds) — the weighted generalization of [[BfsHops]]: where BFS counts
  * hops, this minimizes an integer edge-cost sum (Bellman-Ford), the
  * "strongest association chain" primitive behind related-item distance,
  * influence radius, and cheapest-route rollups.
  *
  * Semantics (exact, replayable):
  *  - cost(s) = 0 for every seed;
  *  - after round i, cost(n) = minimum total weight over paths from any
  *    seed using ≤ i edges — the textbook Bellman-Ford invariant, an
  *    integer min under any partitioning, so bit-exact;
  *  - nodes unreached within `rounds` are absent from the output;
  *  - negative weights are REFUSED (a negative cycle makes bounded-round
  *    "cost" meaningless; with nonnegative weights every round only
  *    improves, monotone toward the true shortest path).
  *
  * Frontier optimization (exact, the SPFA argument): only nodes whose
  * cost IMPROVED in round i-1 can improve a neighbor in round i, so each
  * round relaxes edges out of the improved set only — identical results
  * to full relaxation, a fraction of the work once the graph stabilizes.
  * The oracle replays FULL relaxation per round; the equivalence is the
  * invariant above (pinned against a sequential replay in
  * CheapestPathsSpec).
  *
  * Scale shape: edges persist once as a per-src adjacency of (dst, w)
  * structs; each round joins the improved-frontier cost frame into it,
  * explodes candidate relaxations, min-aggregates per dst, and merges
  * with the standing cost frame (min of old and new — a full-outer
  * shuffle join: new nodes enter, old nodes may improve). Cost frames
  * are STAGED with the previous round freed ([[Checkpoints]]).
  */
object CheapestPaths {

  /** Costs plus the release handle ([[PageRank.ManagedRanks]] contract).
    * `costs` has columns (node LONG, cost LONG). */
  final case class ManagedCosts(costs: DataFrame, release: () => Unit)

  def relax(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
            seeds: DataFrame, seedCol: String, rounds: Int): ManagedCosts = {
    require(rounds >= 1 && rounds <= 64,
      s"rounds must be in [1,64], got $rounds")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
    val sc = edges.sparkSession.sparkContext
    def build(): ManagedCosts = {
      // the weight guard rides the adjacency build — raise_error inside
      // the aggregated struct, so pruning can never drop it
      val guardedW = when(col("w") < 0, raise_error(concat(
        lit("CheapestPaths: negative weight "), col("w").cast("string"),
        lit(" on edge "), col("src").cast("string"), lit("->"),
        col("dst").cast("string")))).otherwise(col("w"))
      val adj = e.select(col("src"), struct(col("dst"), guardedW.as("w")).as("dw"))
        .groupBy("src").agg(collect_list(col("dw")).as("dws"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // materialize the adjacency NOW: the guard must fire even when the
      // seed set is empty and the relaxation loop never runs (review
      // finding — "REFUSED" can't depend on the caller's seeds), and
      // every round reads the persisted frame anyway. No round-partition
      // override (see LabelPropagation note): relaxation rounds move
      // frontier-sized frames, too small for the trick to pay here.
      adj.count()
      val costs0 = Checkpoints.stage(
        seeds.select(col(seedCol).cast("long").as("node")).distinct()
          .withColumn("cost", lit(0L)))
      buildRounds(adj, costs0)
    }
    def buildRounds(adj: DataFrame, costs0: DataFrame): ManagedCosts = {
      var costs = costs0
      var frontier = Checkpoints.stage(costs)
      var frontierCount = costs.count()
      var r = 0
      while (r < rounds && frontierCount > 0) {
        r += 1
        val cand = adj
          .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
          .select(explode(col("dws")).as("dw"),
            col("cost").as("base"))
          .select(col("dw.dst").as("node"),
            (col("base") + col("dw.w")).as("cand"))
          .groupBy("node").agg(min(col("cand")).as("cand"))
        // the merge is a FULL OUTER join (new nodes enter, old nodes may
        // improve) — full outer cannot broadcast in Spark, so it shuffles
        // both |V|-row frames on node; the frontier join above is where
        // the round's real work lives
        val merged = costs.join(cand, Seq("node"), "full_outer")
          .select(col("node"),
            least(coalesce(col("cost"), col("cand")),
              coalesce(col("cand"), col("cost"))).as("cost"),
            (col("cost").isNull ||
              (col("cand").isNotNull && col("cand") < col("cost")))
              .as("improved"))
        val nextCosts = Checkpoints.stage(merged.select("node", "cost", "improved"))
        val nextFrontier = Checkpoints.stage(
          nextCosts.filter(col("improved")).select("node", "cost"))
        frontierCount = nextFrontier.count()
        Checkpoints.release(costs)
        Checkpoints.release(frontier)
        costs = nextCosts
        frontier = nextFrontier
      }
      val fin = costs
      val lastFrontier = frontier
      adj.unpersist()
      ManagedCosts(fin.select("node", "cost"), () => {
        Checkpoints.release(fin)
        Checkpoints.release(lastFrontier)
        ()
      })
    }
    Checkpoints.sweepingOnFailure(sc)(build())
  }
}
