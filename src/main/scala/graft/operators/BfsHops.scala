package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS hop distance — the reachability-with-distance member
  * of the graph family ([[Components]] answers "connected to what",
  * q56's closure answers "reachable from where", this answers "HOW FAR":
  * blast-radius analysis, related-item rings, dependency depth).
  *
  * Semantics (exact, replayable):
  *  - dist(s) = 0 for every seed (graph membership NOT required — a seed
  *    is trivially 0 hops from itself, so it appears in the output even
  *    if it occurs in no edge);
  *  - dist(n) = min hops along directed edges from any seed;
  *  - nodes not reached within `maxHops` are ABSENT from the output (the
  *    caller left-joins a sentinel if it needs them).
  * BFS hop distance has no tie-break question — a node's distance is the
  * ROUND it is first reached, identical under any partitioning — so the
  * result is bit-exact and replayable by unrolled frontier CTEs (q74).
  *
  * Scale shape: the textbook frontier iteration. The edge list collapses
  * once into a persisted per-src adjacency frame; each round joins ONLY
  * the current frontier (the newly-reached nodes, not the accumulated
  * set) into it, explodes neighbors, and anti-joins the known set — so
  * per-round shuffle work is O(|frontier| · avg-degree), and total work
  * across all rounds is O(|E|) amortized, the property that makes BFS
  * viable on a 100-TB graph. Frontier and known frames are STAGED
  * ([[Checkpoints]]) with the previous round freed. The anti-join
  * broadcasts the known set below `broadcastLimit` (measured count, the
  * [[KCore]] adaptivity) and shuffles above it.
  *
  * Early exit on an empty frontier is exact: once nothing new is
  * reached, later rounds are identities, so a fixed-budget oracle replay
  * and the early-exited run agree.
  */
object BfsHops {

  /** Distances plus the release handle ([[PageRank.ManagedRanks]]
    * contract). `dists` has columns (node LONG, dist INT). */
  final case class ManagedDists(dists: DataFrame, release: () => Unit)

  def hops(edges: DataFrame, srcCol: String, dstCol: String,
           seeds: DataFrame, seedCol: String, maxHops: Int,
           broadcastLimit: Long = 5000000L): ManagedDists = {
    require(maxHops >= 1 && maxHops <= 64,
      s"maxHops must be in [1,64], got $maxHops")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sc = edges.sparkSession.sparkContext
    val preexisting = sc.getPersistentRDDs.keySet
    def failCleanup(): Unit =
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!preexisting.contains(id)) {
          try rdd.unpersist(blocking = true) catch { case _: Exception => () }
        }
      }
    def build(): ManagedDists = {
      val adj = e.groupBy("src").agg(collect_set(col("dst")).as("dsts"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var known = Checkpoints.stage(
        seeds.select(col(seedCol).cast("long").as("node")).distinct()
          .withColumn("dist", lit(0)))
      // the initial frontier is staged in its own right so every round's
      // release logic is uniform (each frontier/known frame is always a
      // checkpoint with its own blocks)
      var frontier = Checkpoints.stage(known.select("node"))
      var knownCount = known.count()
      var frontierCount = knownCount
      var d = 0
      while (d < maxHops && frontierCount > 0) {
        d += 1
        val kn = known.select("node")
        val knHinted = if (knownCount <= broadcastLimit) broadcast(kn) else kn
        val reached = adj
          .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
          .select(explode(col("dsts")).as("node"))
          .distinct()
          .join(knHinted, Seq("node"), "left_anti")
        val nextFrontier = Checkpoints.stage(reached)
        frontierCount = nextFrontier.count()
        val nextKnown = Checkpoints.stage(
          known.union(nextFrontier.withColumn("dist", lit(d))))
        Checkpoints.release(known)
        Checkpoints.release(frontier)
        known = nextKnown
        frontier = nextFrontier
        knownCount += frontierCount
      }
      val fin = known
      val lastFrontier = frontier
      adj.unpersist()
      ManagedDists(fin, () => {
        Checkpoints.release(fin)
        Checkpoints.release(lastFrontier)
        ()
      })
    }
    try build() catch { case t: Throwable => failCleanup(); throw t }
  }
}
