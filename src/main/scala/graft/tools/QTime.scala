package graft.tools

/** Probe: time named SparkEntry queries N times each (steady-state
  * separation of signal from box noise). Usage:
  * runMain graft.tools.QTime <sfDir> <reps> <q1> <q2> ... */
object QTime {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(spark, "/root/testdata/sf0.001").count() // codegen warm
      val ts = (1 to reps).map { _ =>
        HostCpu.measuring {
          val t0 = System.nanoTime()
          fn(spark, sf).count()
          (System.nanoTime() - t0) / 1e9
        }
      }
      val sorted = ts.sortBy(_._1)
      println(f"### $q: min ${sorted.head._1}%.2fs (steal ${sorted.head._2}%.1f%%) " +
        f"med ${sorted(reps / 2)._1}%.2fs max ${sorted.last._1}%.2fs " +
        f"(steal ${sorted.last._2}%.1f%%)")
    }
    spark.stop()
  }
}
