package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Adjacency, Checkpoints}

/** Measure the ingest-epoch claim behind Adjacency.foldEdges: folding a
  * 1%-of-orders delta epoch into the standing co-purchase adjacency vs
  * re-running the full build over all orders.
  * Usage: runMain graft.tools.FoldProbe [sfDir] */
object FoldProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def pairs(pred: org.apache.spark.sql.Column) = {
      val ip = graft.io.Tables.load(spark, dir, "lineitem").filter(pred)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      ip.as("a").join(ip.as("b"),
          col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
        .select(col("a.p").cast("long").as("src"),
          col("b.p").cast("long").as("dst"))
    }
    def med(tag: String)(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val m = ts.sorted.apply(1)
      println(f"### $tag: $m%.2fs (${ts.map(t => f"$t%.2f").mkString(",")})")
      m
    }
    val standing = Checkpoints.sweepingOnFailure(spark.sparkContext)(
      Adjacency.build(pairs(pmod(col("l_orderkey"), lit(100)) =!= 0), dedup = true))
    println(s"standing: srcs=${standing.srcCount} stored-edges≈${standing.edgeCount} hubs=${standing.hubCount}")
    val rebuild = med("full rebuild (all orders)") {
      val h = Checkpoints.sweepingOnFailure(spark.sparkContext)(
        Adjacency.build(pairs(lit(true)), dedup = true))
      h.release()
    }
    val fold = med("fold 1% epoch") {
      val h = Checkpoints.sweepingOnFailure(spark.sparkContext)(
        Adjacency.foldEdges(standing, pairs(pmod(col("l_orderkey"), lit(100)) === 0),
          dedup = true))
      h.release()
    }
    println(f"""{"rebuild_sec":$rebuild%.2f,"fold_sec":$fold%.2f,"ratio":${rebuild / fold}%.1f}""")
    standing.release()
    spark.stop()
  }
}
