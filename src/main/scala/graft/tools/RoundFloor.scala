package graft.tools

import org.apache.spark.sql.functions._

/** Probe: what sets the ~0.9 s/round floor of the iterative graph
  * operators on this harness? Times the atomic pieces of one k-core
  * round at sf0.1 separately: the semi-join+aggregate plan WITHOUT
  * staging, the localCheckpoint of its (small) result, and a no-op
  * count on an already-staged frame.
  * Usage: runMain graft.tools.RoundFloor [sfDir] */
object RoundFloor {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def tmed(tag: String, reps: Int = 5)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"### $tag: med ${ts.sorted.apply(reps / 2)}%.3fs " +
        ts.map(t => f"$t%.2f").mkString("(", ",", ")"))
    }
    val bp = graft.io.Tables.load(spark, dir, "orders")
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .join(graft.io.Tables.load(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2 + 1).as("src"), (col("l_partkey") * 2).as("dst"))
    val und = bp.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist()
    und.count()
    def degreesOf(e: org.apache.spark.sql.DataFrame) =
      e.select(col("a").as("node")).union(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    val surv0 = degreesOf(und).filter(col("deg") >= 8)
    val surv = surv0.localCheckpoint()
    val keep = surv.select("node")
    def roundPlan = {
      val e = und
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
      degreesOf(e).filter(col("deg") >= 8).select(col("node"), col("deg"))
    }
    tmed("A: round plan, plain count (no staging)") { roundPlan.count(); () }
    tmed("B: round plan, localCheckpoint (stage)") {
      val cp = roundPlan.localCheckpoint()
      graft.operators.Checkpoints.release(cp)
    }
    tmed("C: count on an already-staged frame") { surv.count(); () }
    tmed("D: round plan, broadcast keep") {
      val kb = broadcast(keep)
      val e = und
        .join(kb.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(kb.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
      degreesOf(e).filter(col("deg") >= 8).count()
      ()
    }
    // AQE off for the same plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    tmed("E: round plan, plain count, AQE OFF") { roundPlan.count(); () }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // fewer shuffle partitions (restore the SAVED value, not a literal —
    // the session default is max(cores, 4), not 32 everywhere)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    tmed("F: round plan, plain count, 8 shuffle partitions") { roundPlan.count(); () }
    spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    // AQE coalescing with size-first (parallelismFirst=false): tiny
    // shuffles collapse toward the 64MB advisory target
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    tmed("G: round plan, AQE size-first coalesce") { roundPlan.count(); () }
    tmed("H: staged round, AQE size-first coalesce") {
      val cp = roundPlan.localCheckpoint()
      graft.operators.Checkpoints.release(cp)
    }
    spark.stop()
  }
}
