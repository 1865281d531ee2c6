package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.io.Tables
import graft.htn.OmopFixtures

/** SURVEY §4 scale techniques as verifiable plan properties: bucketed
  * co-located joins (no exchange), year-partitioned layout (partition
  * pruning), and exchange reuse across flag joins. These are the design
  * decisions that survive a 100× scale-up — asserted, not assumed. */
class ScaleTechniquesSpec extends SparkSpec {

  private def fmt(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("bucketed tables join without an exchange (co-located join)") {
    // a fresh derby metastore doesn't know about leftover table dirs from
    // a previous JVM — clear them so saveAsTable can create the location
    Seq("orders_bkt", "lineitem_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get(s"/tmp/graft_warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")

    // bucketed join must not shuffle either side — disable auto-broadcast
    // so the join strategy is sort-merge over co-located buckets
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").count()
      val plan = fmt(joined)
      val joinSection = plan.substring(0, plan.indexOf("HashAggregate")
        .max(plan.length - 1))
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      // no Exchange between the scans and the join (only the post-join agg
      // may exchange): count exchanges below the join in the tree
      val treeLines = plan.linesIterator
        .takeWhile(!_.trim.startsWith("(1) Scan")).toSeq
      val joinIdx = treeLines.indexWhere(_.contains("SortMergeJoin"))
      val belowJoin = treeLines.drop(joinIdx)
      assert(!belowJoin.exists(_.contains("Exchange")),
        "exchange below the bucketed join:\n" + treeLines.mkString("\n"))
      assert(joined.count() === 3)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("year-partitioned measurement layout prunes partitions on year filters") {
    val dir = java.nio.file.Files.createTempDirectory("meas_part").toString
    val m = OmopFixtures.tables(spark).measurement
      .withColumn("yr", year(col("MEASUREMENT_DATE")))
    m.write.mode("overwrite").partitionBy("yr").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("yr") === 2023)
    val plan = fmt(pruned)
    // the scan's partition filters must carry the year predicate, and the
    // non-matching years (2021, 2022) must not be read
    assert(plan.contains("PartitionFilters") && plan.contains("yr"), plan.take(800))
    val years = OmopFixtures.measurements.map(_.MEASUREMENT_DATE.toLocalDate.getYear).distinct
    assert(years.size > 1) // fixture really has prunable partitions
    assert(pruned.select(countDistinct(col("yr"))).head().getLong(0) === 1)
  }

  test("shared pipeline stages are cut (persisted), not recomputed per flag join") {
    val t = OmopFixtures.tables(spark)
    val res = graft.htn.HtnPipeline.run(spark, t, OmopFixtures.codes)
    val plan = fmt(res.analytical)
    // without the persist cut, this plan re-derives the full cohort +
    // exclusion chain once per flag table (measured: 488 physical nodes);
    // with it, the six flag joins read the cached denominator
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      plan.take(800))
    res.analytical.unpersist(); res.denominatorDays.unpersist()
    res.eligible.unpersist(); res.cohort.unpersist()
  }

  test("bare min/max/count aggregates push down to parquet footer stats") {
    // GraftSession sets spark.sql.parquet.aggregatePushdown, but the
    // pushdown only exists on the V2 read path — parquet sits on Spark's
    // default V1 list, so flip it for this scope (documenting the real
    // deployment requirement). A stats-only aggregate then never touches
    // data pages: the scan advertises PushedAggregation and answers from
    // row-group metadata. Any filter or non-stats expression disables it.
    val v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    try {
      spark.conf.set("spark.sql.sources.useV1SourceList", "")
      val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .agg(min("o_orderkey"), max("o_orderkey"), count(lit(1)))
      val plan = fmt(df)
      assert(plan.contains("PushedAggregation: [MIN(o_orderkey), MAX(o_orderkey), COUNT(*)]"),
        plan.take(1200))
      val r = df.head()
      assert(r.getLong(2) > 0)
      assert(r.getLong(0) <= r.getLong(1))
    } finally spark.conf.set("spark.sql.sources.useV1SourceList", v1)
  }
}
