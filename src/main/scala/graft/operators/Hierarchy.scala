package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Variable-depth hierarchy traversal — the recursive-CTE capability Spark
  * SQL lacks (BOM explosion, org charts, category trees), expressed as the
  * scale-correct iterative frontier join: level d+1 is frontier(d) ⋈ edges,
  * each level checkpointed through [[Checkpoints.stage]] (materialized,
  * lineage truncated — the same discipline, and the same local-vs-reliable
  * mode switch, as [[Components]]' component loop: sessions configured via
  * [[graft.GraftSession.enableReliableCheckpoints]] survive executor loss
  * mid-traversal), loop ends when the
  * frontier empties. Wall-clock is O(depth) joins; each join shuffles only
  * the CURRENT frontier, never the accumulated closure — on a 100-node
  * cluster a 10-level billion-edge hierarchy is 10 bounded shuffles.
  *
  * Cycles never terminate a closure; the `maxDepth` cap turns one into an
  * error instead of an infinite loop (a DAG/tree is the operator's
  * contract, the cap is the enforcement).
  */
object Hierarchy {

  /** Transitive ancestors: for child→parent `edges` (two columns, child
    * first), every (node, anc, depth) with depth ≥ 1 following parent
    * links. Levels are materialized checkpoints; pass the RETURNED frame
    * to [[Components.releaseCheckpoint]] when done — one call frees every
    * level's blocks.
    *
    * `dedupPaths`: by default the result follows recursive-CTE UNION ALL
    * semantics — a DAG node reaches an ancestor once per DISTINCT PATH
    * (pinned in HierarchySpec; the q56 oracle replays it). That
    * multiplicity is also the scale hazard: on diamond-heavy DAGs the
    * frontier grows with path count, exponential in stacked diamonds.
    * `dedupPaths = true` switches to SET semantics — each level is
    * distinct-ed, the frontier is bounded by (node, anc, depth) triples,
    * and a row means "reachable at this depth", not "one path". Choose it
    * for BOM/category DAGs where reachability, not path count, is the
    * question. */
  def ancestors(edges: DataFrame, maxDepth: Int = 64,
                dedupPaths: Boolean = false): DataFrame = {
    def lvl(df: DataFrame): DataFrame = if (dedupPaths) df.distinct() else df
    require(edges.columns.length >= 2, "edges needs (child, parent) columns")
    val e = Checkpoints.stage(
      edges.select(col(edges.columns(0)).cast("long").as("child"),
        col(edges.columns(1)).cast("long").as("parent")))
    val base = Checkpoints.stage(lvl(
      e.select(col("child").as("node"), col("parent").as("anc"),
        lit(1L).as("depth"))))
    // one emptiness probe per level, exactly; depth == maxDepth is legal
    // (the cap rejects only a level BEYOND it); every failure path frees
    // what it checkpointed — a cyclic input must not also leak 64 levels
    var levels = if (base.isEmpty) Nil else List(base)
    var frontier = base
    var done = levels.isEmpty
    var d = 1
    while (!done) {
      val next = Checkpoints.stage(lvl(
        frontier.join(e, frontier("anc") === e("child"))
          .select(frontier("node"), e("parent").as("anc"),
            (frontier("depth") + 1).as("depth"))))
      if (next.isEmpty) {
        Components.releaseCheckpoint(next) // terminal, never in the result
        done = true
      } else {
        d += 1
        if (d > maxDepth) {
          (next :: levels).foreach(Components.releaseCheckpoint)
          Components.releaseCheckpoint(e)
          throw new IllegalArgumentException(
            s"hierarchy deeper than maxDepth=$maxDepth — cycle, or raise the cap")
        }
        levels ::= next
        frontier = next
      }
    }
    // the edge checkpoint is not part of the returned union's plan — free
    // it now, or it outlives the result
    Components.releaseCheckpoint(e)
    if (levels.isEmpty) base // empty input: a valid, blockless empty frame
    else levels.reduce(_ unionByName _)
  }
}
