package graft.operators

/** Single-threaded reference of [[PageRank]]'s exact fixed-point semantics
  * (floor-division contributions, integer damping, dangling mass leaks) —
  * ONE copy shared by every suite that replays it (PageRankSpec,
  * HybridRankSpec), so a semantics change cannot update one replica and
  * miss the other. */
object BrutePageRank {
  def ranks(edges: Seq[(Long, Long)], iters: Int,
            scale: Long = 1000000000L): Map[Long, Long] =
    personalized(edges, iters, scale, seeds = None)

  /** `seeds = Some(set)` replays [[PageRank.personalizedRanks]]: teleport
    * base and initial rank only at seed nodes; None = global. */
  def personalized(edges: Seq[(Long, Long)], iters: Int,
                   scale: Long = 1000000000L,
                   seeds: Option[Set[Long]]): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    def base(n: Long) = if (seeds.forall(_.contains(n))) scale * 15 / 100 else 0L
    def r0(n: Long) = if (seeds.forall(_.contains(n))) scale else 0L
    var r = nodes.map(n => n -> r0(n)).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s, d) => inflow(d) += r(s) / out(s) }
      r = nodes.map(n => n -> (base(n) + inflow(n) * 85 / 100)).toMap
    }
    r
  }
}
