package graft.tools

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Probe: why do consecutive d03 runs in one session degrade?
  * Prints per-rep wall time, cached-RDD count/bytes, and cumulative GC
  * time so the accumulation mechanism names itself.
  * Usage: runMain graft.tools.D03LeakProbe [sfDir] [reps] [query] */
object D03LeakProbe {
  private def gcMs: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val sf = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val q = args.lift(2).getOrElse("d03_minhash_lsh")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(q)
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskMs.addAndGet(te.taskInfo.duration); tasks.incrementAndGet(); ()
      }
    })
    fn(spark, "/root/testdata/sf0.001").count()
    (1 to reps).foreach { i =>
      val g0 = gcMs
      val (m0, n0) = (taskMs.get, tasks.get)
      val t0 = System.nanoTime()
      fn(spark, sf).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let straggler task-end events drain
      val rdds = spark.sparkContext.getPersistentRDDs
      println(f"rep $i: $sec%.2fs gc+${gcMs - g0}%dms taskSec=${(taskMs.get - m0) / 1e3}%.1f " +
        f"nTasks=${tasks.get - n0}%d cachedRdds=${rdds.size}")
    }
    spark.stop()
  }
}
