package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway probe: where does q72_kcore's time go?
  * Usage: runMain graft.tools.KcProbe <sfDir> */
object KcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def tmed(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"### $tag: ${ts.sorted.apply(1)}%.2fs (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    def bp = graft.io.Tables.load(spark, dir, "orders")
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .join(graft.io.Tables.load(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2 + 1).as("src"), (col("l_partkey") * 2).as("dst"))
    tmed("und build + count") {
      bp.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct().count()
    }
    for (r <- Seq(1, 2, 6)) {
      tmed(s"kcore rounds=$r") {
        val mc = graft.operators.KCore.core(bp, "src", "dst", 8, r, broadcastLimit = args.lift(1).map(_.toLong).getOrElse(graft.operators.Adjacency.BroadcastRowLimit))
        mc.core.count(); mc.release()
      }
    }
    spark.stop()
  }
}
