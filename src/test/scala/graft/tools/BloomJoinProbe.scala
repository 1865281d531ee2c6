package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what `SkewJoin.bloomFilteredJoin` is FOR: the shuffle mass a
  * plan-literal Bloom probe keeps out of a shuffled fact join. Broadcast
  * joins are disabled so the join shuffles both sides — the regime the
  * operator targets (at 100 TB the "small" side is past any broadcast
  * threshold; locally Spark would broadcast 3k keys and hide the effect).
  *
  * Run: sbt "Test/runMain graft.tools.BloomJoinProbe"
  */
object BloomJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", 8))
      // AFTER tune: tune sets a 64 MiB broadcast threshold (last write wins)
      .config("spark.sql.autoBroadcastJoinThreshold", -1)
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf = "/root/testdata/sf0.1"
    def fact = graft.io.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"),
        col("l_extendedprice"), col("l_discount"))
    def small = graft.io.Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) === 2001)
      .select(col("o_orderkey"), col("o_orderdate"))

    @volatile var shuffleWrite = 0L
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def measure(label: String)(f: => Long): Unit = {
      Thread.sleep(500); shuffleWrite = 0L
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let straggler TaskEnd events drain
      println(f"### $label: rows=$n shuffleWrite=${shuffleWrite / 1024}%dKiB time=$sec%.2fs")
    }

    measure("warmup")(fact.join(small, Seq("o_orderkey")).count())
    measure("plain shuffled join")(fact.join(small, Seq("o_orderkey")).count())
    measure("bloom-prefiltered join")(
      graft.operators.SkewJoin.bloomFilteredJoin(fact, small, "o_orderkey",
        estimatedItems = 100000L, numBits = 1L << 20).count())
    spark.stop()
  }
}
