package graft.tools

import org.apache.spark.sql.functions._

/** One-off scale probe for Components.connectedComponents (not engine
  * surface): a chain graph — the pathological diameter-n case where naive
  * min-label propagation needs n rounds — and a random graph, both at
  * n nodes. Prints rounds + wall time; the alternating algorithm should
  * stay at O(log n) rounds for the chain. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // chain 0-1-2-...-n: diameter n, one component rooted at 0
    val chain = spark.range(n - 1).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val ((chainDf, chainRounds), tChain) = time {
      val (df, r) = graft.operators.Components.connectedComponentsWithStats(chain)
      (df, r)
    }
    val chainOk = chainDf.agg(max(col("cluster"))).head().getLong(0) == 0L &&
      chainDf.count() == n
    println(f"chain   n=$n rounds=$chainRounds wall=$tChain%.1f s allRoot0=$chainOk")

    // sparse random graph: n nodes, n edges (many components, mixed sizes)
    val rand = spark.range(n).select(
      (xxhash64(col("id")) % n).as("src"),
      (xxhash64(col("id"), lit(1)) % n).as("dst"))
      .select(abs(col("src")).as("src"), abs(col("dst")).as("dst"))
    val ((randDf, randRounds), tRand) = time {
      val (df, r) = graft.operators.Components.connectedComponentsWithStats(rand)
      (df, r)
    }
    println(f"random  n=$n rounds=$randRounds wall=$tRand%.1f s " +
      s"nodes=${randDf.count()} comps=${randDf.select("cluster").distinct().count()}")
    spark.stop()
  }
}
