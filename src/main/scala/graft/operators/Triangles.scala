package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting by degree-ordered orientation — the motif-counting
  * member of the graph family ([[PageRank]] ranks, [[LabelPropagation]]
  * clusters, [[Components]] connects; this measures local closure, the
  * basis of clustering coefficients and spam/bot structure detection).
  *
  * Algorithm (the standard shuffle-bounded form): undirected edges are
  * oriented from the endpoint with the SMALLER (degree, id) to the larger —
  * a total acyclic order — so every triangle {a,b,c} has exactly one
  * "pivot" node with out-edges to the other two and is counted exactly
  * once. Out-degrees under this orientation are bounded by O(√|E|)
  * regardless of how skewed the raw degree distribution is (a hub of
  * degree d only keeps neighbors of degree ≥ d, and there can be at most
  * ~2|E|/d of those), which bounds the wedge (out-neighbor pair) explosion
  * at O(|E|^1.5) — the textbook bound; an unoriented wedge join on a
  * power-law graph is O(Σ deg²) and dies on the first hub.
  *
  * Plan shape: one distinct shuffle (undirected edge set), one degree
  * aggregation, two |V|-row joins to attach endpoint degrees, one
  * aggregating shuffle into a per-pivot sorted adjacency array, a
  * flat-map wedge expansion done entirely in codegen'd array expressions
  * (`transform`/`slice`/`flatten` — no UDF), and ONE equi-join of wedges
  * against oriented edges. Everything is integers; the result is
  * bit-identical under any partitioning and replayable by a plain
  * a<b<c SQL triple join (how q71's oracle certifies it).
  */
object Triangles {

  /** Counts plus the handle that frees the staged result (the
    * [[PageRank.ManagedRanks]] contract: consume, then release). */
  final case class ManagedCounts(counts: DataFrame, release: () => Unit)

  /** Per-node triangle participation: (node LONG, n_tri LONG) for every
    * node of the undirected graph (0 rows for nodes in no triangle — the
    * caller left-joins if it needs zeros). Self-loops and duplicate /
    * reverse edges are collapsed first.
    */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): ManagedCounts = {
    val s = col(srcCol).cast("long")
    val d = col(dstCol).cast("long")
    val sc = edges.sparkSession.sparkContext
    def build(): ManagedCounts = {
      val und = edges.select(least(s, d).as("a"), greatest(s, d).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
        // three consumers: degree agg + the orientation join + (via the
        // oriented frame) the closing-edge join
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = und.select(col("a").as("node"))
        .union(und.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      // orient {a,b} from lower (deg, id) to higher — join degrees onto
      // both endpoints, then pick direction with pure column arithmetic
      val withDeg = und
        .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), Seq("a"))
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), Seq("b"))
      val aFirst = (col("da") < col("db")) ||
        (col("da") === col("db") && col("a") < col("b"))
      val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, col("db")).otherwise(col("da")).as("dv"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // per-pivot out-neighbors sorted by the SAME (deg, id) order the
      // orientation uses, so emitted wedge pairs (x,y) always satisfy
      // (deg,id)(x) < (deg,id)(y) — i.e. the closing edge, if it exists,
      // is oriented exactly x→y and one equi-join finds it
      val adj = oriented.groupBy("u")
        .agg(sort_array(collect_list(struct(col("dv"), col("v")))).as("nbrs"))
      // wedge expansion: all i<j pairs of the sorted neighbor array, in
      // codegen'd expressions (transform over (elem, idx), slice the tail)
      val pairsExpr = flatten(transform(col("nbrs"), (x, i) =>
        transform(slice(col("nbrs"), i + lit(2), size(col("nbrs"))),
          y => struct(x.getField("v").as("x"), y.getField("v").as("y")))))
      val wedges = adj.select(col("u"), explode(pairsExpr).as("p"))
        .select(col("u"), col("p.x").as("x"), col("p.y").as("y"))
      val closing = oriented.select(col("u").as("x"), col("v").as("y"))
      val tris = wedges.join(closing, Seq("x", "y"))
      // each triangle (u,x,y) appears exactly once; credit all 3 corners
      val counts = tris
        .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_tri"))
      // materialize eagerly so the two persisted leaves can be freed HERE
      // (the ManagedPairs lesson: a lazily-returned persist has no release
      // site); the staged result is freed by the caller's release()
      val out = Checkpoints.stage(counts)
      und.unpersist()
      oriented.unpersist()
      ManagedCounts(out, () => { Checkpoints.release(out); () })
    }
    Checkpoints.sweepingOnFailure(sc)(build())
  }
}
