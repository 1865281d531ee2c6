package graft.tools

import org.apache.spark.sql.SparkSession

import graft.htn.{HtnConfig, HtnPipeline, OmopFixtures2, OmopTables, SyntheticOmop}

/** Scale harness for the versioned stage checkpoints: generate synthetic
  * OMOP at `nPatients`, write it to parquet (file-backed inputs are what
  * the stamps version), then time the pipeline three ways:
  *
  *  1. `cold_sec` — empty checkpoint dir, every stage computes + commits;
  *  2. `restart_reuse_sec` — identical inputs/config/logic: every stage
  *     must REUSE (zero-job loads), so this measures the stamp-check +
  *     read-back floor a crashed-and-restarted driver pays;
  *  3. `restart_middle_sec` — the last stage's directory deleted (the
  *     crash-mid-pipeline shape): the committed prefix reuses, only the
  *     final stage recomputes.
  *
  * Usage: runMain graft.tools.ScaleRestart [nPatients] [workDir] */
object ScaleRestart {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val work = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("scale_restart").toString)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val spin0 = HostCpu.spinScore()

    val genT0 = System.nanoTime()
    val mem = SyntheticOmop.generate(spark, n)
    Seq("person" -> mem.person, "co" -> mem.conditionOccurrence,
      "m" -> mem.measurement, "o" -> mem.observation,
      "po" -> mem.procedureOccurrence, "de" -> mem.drugExposure)
      .foreach { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$work/omop/$name") }
    val genSec = (System.nanoTime() - genT0) / 1e9
    def tables = OmopTables(
      spark.read.parquet(s"$work/omop/person"),
      spark.read.parquet(s"$work/omop/co"),
      spark.read.parquet(s"$work/omop/m"),
      spark.read.parquet(s"$work/omop/o"),
      spark.read.parquet(s"$work/omop/po"),
      spark.read.parquet(s"$work/omop/de"))

    val ck = s"$work/ck"
    def run(): (Double, Long) = {
      val t0 = System.nanoTime()
      val res = HtnPipeline.run(spark, tables, OmopFixtures2.codes,
        HtnConfig(), Some(ck))
      val rows = res.analytical.count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val (coldSec, rows1) = run()
    val (reuseSec, rows2) = run()
    require(rows1 == rows2, s"restart changed the output: $rows1 != $rows2")
    // crash-mid-pipeline: drop the final stage, keep the committed prefix
    val lastStage = new java.io.File(s"$ck/analytical_htn")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); ()
    }
    rm(lastStage)
    val (middleSec, rows3) = run()
    require(rows1 == rows3, s"middle restart changed the output: $rows1 != $rows3")

    val spin1 = HostCpu.spinScore()
    println(f"""{"metric":"scale_restart","patients":$n,""" +
      f""""analytical_rows":$rows1,"gen_sec":$genSec%.1f,""" +
      f""""cold_sec":$coldSec%.1f,"restart_reuse_sec":$reuseSec%.1f,""" +
      f""""restart_middle_sec":$middleSec%.1f,""" +
      f""""spin_before":$spin0,"spin_after":$spin1}""")
    spark.stop()
  }
}
