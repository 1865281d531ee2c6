package graft.tools

import org.apache.spark.sql.functions._

/** One-off timing probe for t14's bigram-pair enumeration. */
object T14Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // warm
    graft.queries.TextQueries.queries("t14_bigram_vocab")(spark, "/root/testdata/sf0.001").collect()
    var best = Double.MaxValue
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val r = graft.queries.TextQueries.queries("t14_bigram_vocab")(spark, dir).collect()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      assert(r.length == 20)
    }
    println(f"t14 best-of-3: $best%.3f s")
    spark.stop()
  }
}
