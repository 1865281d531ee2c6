package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q78's composition contract: four iterative graph operators chained
  * over one persisted edge cache must leave NOTHING persisted after the
  * query returns (every managed handle released, every staged round
  * freed) — the leak mode the managed-handle pattern exists to prevent,
  * now pinned under chaining rather than per-operator. Also sanity-pins
  * the composition's semantics against its building blocks: the core
  * community sizes can never exceed the untrimmed q70-style labelling of
  * the same graph, and modularity inputs are internally consistent. */
class GraphComposeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q78 leaves zero persisted RDDs and zero new checkpoints behind") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val out = CoreQueries.queries("q78_core_communities")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(sc.getPersistentRDDs.size === before,
      "the composed pipeline must release every operator's frames")
  }

  test("q78 rows are internally consistent modularity inputs") {
    val rows = CoreQueries.queries("q78_core_communities")(spark, sf).collect()
    rows.foreach { r =>
      val (sz, dC, intraE, contrib, rankMass) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(sz >= 1)
      // every core node has degree >= 1 in the trimmed graph
      assert(dC >= sz, s"community ${r.get(0)}: d_c $dC < sz $sz")
      // intra-edges can't exceed the community's degree mass
      assert(intraE <= dC, s"community ${r.get(0)}: intra $intraE > d_c $dC")
      // rank mass: each node carries at least the damping base (scale*15/100)
      assert(rankMass >= sz * 150000000L,
        s"community ${r.get(0)}: rank mass below the damping floor")
      // contrib = intra*em - d_c² with em >= d_c (degree mass is bounded
      // by twice the edge count): a positive contrib needs intra edges
      if (intraE == 0) assert(contrib < 0, s"community ${r.get(0)}")
    }
  }

  test("q78 core communities are no larger than the untrimmed labelling " +
       "allows (trim only removes nodes)") {
    val core = CoreQueries.queries("q78_core_communities")(spark, sf).collect()
    val coreNodes = core.map(_.getLong(1)).sum
    // the 1997 co-purchase node count bounds the core size from above
    val ip = graft.io.Tables.load(spark, sf, "lineitem")
      .filter(year(col("l_shipdate")) === 1997)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val full = ip.as("a").join(ip.as("b"),
        col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
      .select(col("a.p")).distinct().count()
    assert(coreNodes <= full,
      s"core labels cover $coreNodes nodes but the full graph has $full")
  }
}
