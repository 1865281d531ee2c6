package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B runtime-mutable conf settings over named SparkEntry queries:
  * times each query under (label, settings) variants in ONE session,
  * reps each, printing min/med per variant. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ConfAb <sfDir> <reps> <q1> <q2> ..."
  */
object ConfAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val variants: Seq[(String, Map[String, String])] = Seq(
      "baseline(pf=true)" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "67108864"),
      "pf=false,adv=8m" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8388608"),
      "pf=false,adv=32m" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "33554432"),
      "pf=false,adv=64m" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "67108864")
    )

    names.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(spark, "/root/testdata/sf0.001").count() // warm
      variants.foreach { case (label, confs) =>
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"### $q%-28s $label%-20s min ${ts.head}%6.2f med ${ts(ts.size / 2)}%6.2f")
      }
    }
    spark.stop()
  }
}
