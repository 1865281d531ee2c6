package graft.tools

import org.apache.spark.sql.functions._

/** Phase decomposition of t40_tiered_bm25's fixed cost: the 5-batch
  * tiered lex lifecycle (bootstrap build, 2 minors, major, edit minor),
  * the merged-view load, and the BM25 probe+collect — timed separately
  * so the expensive phase is a measurement, not a guess.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.T40Probe */
object T40Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    // per-phase job/stage/task census: is a slow phase real work or
    // scheduling floor (many tiny stages)?
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
          stageLog.add((s.stageInfo.name.takeWhile(_ != '\n').take(90),
            s.stageInfo.taskMetrics.executorRunTime, s.stageInfo.numTasks))
          ()
        }
      })
    val d = graft.io.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def census[T](label: String)(body: => T): T = {
      val (j0, s0, t0) = (jobs.get, stages.get, taskMs.get)
      stageLog.clear()
      val w0 = System.nanoTime()
      val out = body
      val w = (System.nanoTime() - w0) / 1e9
      println(f"  [$label] wall=$w%.2fs jobs=${jobs.get - j0} " +
        f"stages=${stages.get - s0} taskSec=${(taskMs.get - t0) / 1e3}%.2f")
      import scala.jdk.CollectionConverters._
      stageLog.asScala.toSeq.sortBy(-_._2).take(5).foreach { case (n, ms, nt) =>
        println(f"      ${ms / 1e3}%8.2fs tasks=$nt%3d  $n")
      }
      out
    }
    (1 to 2).foreach { rep => // rep 1 pays codegen warmup; read rep 2
      val root = java.nio.file.Files.createTempDirectory("t40_probe").toString
      val perBatch = (0 until 4).map { i =>
        timed {
          census(s"rep$rep batch$i") {
            graft.streaming.LexTieredStream.foldBatch(
              d.filter(pmod(col("doc_id"), lit(4)) === i), root,
              batchId = i.toLong, majorEvery = 3)
          }
        }
      }
      val edits = d.filter(pmod(col("doc_id"), lit(16)).isin(0L, 8L))
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(16)) === 0, upper(col("text")))
            .otherwise(lit("")).as("text"))
      val editSec = timed {
        graft.streaming.LexTieredStream.foldBatch(edits, root,
          batchId = 4L, majorEvery = 3)
      }
      var view: graft.streaming.LexTieredStream.Tiered = null
      val loadSec = timed {
        view = graft.streaming.LexTieredStream.loadCurrent(spark, root)
          .getOrElse(sys.error("no view"))
      }
      val probeSec = timed {
        import spark.implicits._
        val qterms = graft.queries.TextQueries.Bm25Queries
          .toDF("qid", "qtext")
          .select(col("qid"),
            explode(array_distinct(split(col("qtext"), " "))).as("tok"))
        val agg = graft.queries.TextQueries.bm25ScoresOverIndex(
          view.index, qterms, excludeSelf = false)
        agg.count()
        ()
      }
      view.release()
      println(f"""{"metric":"t40_phases","rep":$rep,""" +
        f""""batches":[${perBatch.map(s => f"$s%.2f").mkString(",")}],""" +
        f""""edit_sec":$editSec%.2f,"load_sec":$loadSec%.2f,"probe_sec":$probeSec%.2f}""")
    }
    spark.stop()
  }
}
