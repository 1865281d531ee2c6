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
        val t0 = System.nanoTime()
        fn(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"### $q: min ${ts.min}%.2fs med ${ts.sorted.apply(reps / 2)}%.2fs max ${ts.max}%.2fs")
    }
    spark.stop()
  }
}
