package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory with scale-oriented defaults.
  *
  * Design notes (SURVEY.md §4): the engine relies on Catalyst + AQE for
  * physical planning — broadcast promotion of small dimension tables,
  * skew-join splitting, and partition coalescing. Everything here is a
  * default that also holds on a real cluster; only `local[*]` master and
  * the shuffle-partition count are test-environment choices.
  */
object GraftSession {

  /** The `spark.sql.extensions` entry this engine needs on every session:
    * native expressions (float_dot, sig_match_count, set_jaccard), optimizer
    * rewrites (FuseSetJaccard) and the TopKPerKey planner strategy. The same
    * value a cluster deployment passes via --conf. */
  val ExtensionsClass = "graft.plans.GraftExtensions"

  /** APPEND our extensions to whatever the caller already configured —
    * `spark.sql.extensions` is a comma-separated list, and a plain
    * `config()` would overwrite earlier builder writes / --conf values
    * (last write wins). Sources checked: the builder's own option map
    * (public `options()`), then system properties (spark-submit --conf). */
  private def mergedExtensions(b: SparkSession.Builder): String = {
    val existing: Option[String] =
      org.apache.spark.sql.GraftSqlBridge
        .builderOption(b, "spark.sql.extensions")
        .orElse(sys.props.get("spark.sql.extensions"))
    existing match {
      case Some(list) if list.split(",").map(_.trim).contains(ExtensionsClass) =>
        list
      case Some(list) if list.trim.nonEmpty => s"$list,$ExtensionsClass"
      case _ => ExtensionsClass
    }
  }

  /** Apply engine defaults to an existing builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", mergedExtensions(b))
    // If a TIMESTAMP(NANOS) parquet is ever read, decode as nanos-long
    // engine-wide rather than erroring; graft.io.Tables branches on the
    // file footer's actual logical type and converts to TimestampType
    // explicitly (micros files never hit this flag). Set here so read
    // behavior never depends on which table loaded first.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    // Commit with one rename per file instead of two (FileOutputCommitter
    // v1 renames task → job-temp → final; v2 renames task → final at task
    // commit). The epoch stores' torn-write detection never relied on the
    // v1 job-commit barrier — a commit is visible only once its meta
    // marker (written AFTER the data) validates — so v2's weaker
    // mid-job visibility is invisible to readers here, and every epoch
    // write (the tiered rolls commit 5–10 per query) saves a
    // driver-side rename pass. Same reasoning holds on HDFS at cluster
    // scale; object stores use their own committers anyway.
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    .config("spark.ui.enabled", "false")

  /** Opt this session's iterative operators (connected components,
    * hierarchy traversal) into RELIABLE checkpoints: each round is written
    * to `dir` (HDFS/S3/object store on a cluster) instead of
    * executor-local blocks, so a lost executor mid-run recovers from the
    * store rather than killing the job — the fault-tolerance mode an
    * hours-long 100-TB run needs. `dir` must be a fault-tolerant,
    * cluster-visible path in production; operators delete their round
    * files as soon as the next round is durable (see
    * [[graft.operators.Checkpoints]]), so steady-state usage is
    * O(2 rounds), not O(all rounds). Idempotent; runtime-revocable with
    * `spark.conf.set(Checkpoints.ReliableConf, "false")`. */
  def enableReliableCheckpoints(spark: SparkSession, dir: String): Unit = {
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(graft.operators.Checkpoints.ReliableConf, "true")
  }

  /** Local session for tests / benchmarks. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = tune(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", math.max(cores, 4))
        .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
