package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match point rows to interval rows with
  * `start <= point < end`, without a key.
  *
  * A naive non-equi join compiles to BroadcastNestedLoopJoin — O(n×m)
  * comparisons and a broadcast of a whole side; it falls over long before
  * 100 TB. The scale formulation BANDS the domain: every interval is
  * exploded to the fixed-width buckets it overlaps, every point maps to
  * exactly one bucket, and the join becomes an equi-join on the bucket id
  * followed by the exact range predicate. Shuffle cost is
  * O((n + m·avgSpan/bucketWidth)), and Spark plans a hash/sort-merge join
  * with AQE handling bucket skew. Pick `bucketWidth` ≈ the typical
  * interval span so interval replication stays near 1×.
  */
object RangeJoin {

  /** @param points      DataFrame with a numeric/long point column
    * @param intervals   DataFrame with numeric/long start and end columns
    * @param pointCol    point column name (long-compatible)
    * @param startCol    interval start (inclusive)
    * @param endCol      interval end (exclusive)
    * @param bucketWidth banding width in the domain's units */
  /** Banding arithmetic is integral (`div`, `- 1`): a fractional domain
    * would round into the WRONG bucket and silently drop matches (e.g. a
    * double interval end 10.5 truncating to bucket(9) while a point 10.2
    * lands in bucket(1 at width 10)). Refuse non-integral columns rather
    * than mis-join — callers scale fractional domains to integer units
    * first (the engine-wide fixed-point discipline). */
  private def requireIntegral(df: DataFrame, cols: Seq[String]): Unit =
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      // "date" deliberately NOT allowed: both bucket paths (`div` on the
      // raw column / cast("long")) fail analysis for DateType in Spark, so
      // allowing it would only trade this readable message for an obscure
      // analysis error — convert dates to day numbers (datediff/unix_date)
      // before bucketing.
      require(Seq("long", "integer", "short", "byte")
        .contains(dt.typeName),
        s"range-join column $c must be integral (got ${dt.typeName}); " +
          "scale fractional domains to integer units first " +
          "(dates: convert to day numbers, e.g. datediff)")
    }

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    requireIntegral(points, Seq(pointCol))
    requireIntegral(intervals, Seq(startCol, endCol))
    // Integer `div`, not fractional `/`: the fractional form computes the
    // quotient in double, which rounds for |x| > 2^53 (epoch nanos) and can
    // map a point and its interval to different buckets, silently dropping
    // matches. `div` is exact over the full long domain.
    def bucketOf(c: Column): Column =
      call_function("div", c.cast("long"), lit(bucketWidth))
    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val i = intervals
      .withColumn("__b0", bucketOf(col(startCol)))
      // end is exclusive: an interval ending exactly on a bucket boundary
      // does not reach into that bucket
      .withColumn("__b1", bucketOf(col(endCol) - 1))
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b0", "__b1")
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /** INTERVAL × INTERVAL overlap join — [[pointInInterval]]'s two-sided
    * sibling (temporal co-occurrence, validity-window intersection): emit
    * every (a, b) pair whose half-open intervals intersect
    * (`aStart < bEnd && bStart < aEnd` — touching intervals do NOT
    * overlap). Same banding discipline on BOTH sides; a pair sharing
    * several buckets is emitted exactly once WITHOUT a distinct pass —
    * only the bucket containing the overlap's left edge
    * (max(aStart, bStart)) emits it, the classic replicate-filter trick,
    * so no O(pairs) dedup shuffle exists in the plan. Shuffle cost is
    * O((na + nb) · avgSpan/bucketWidth); pick `bucketWidth` ≈ the typical
    * span. Column names must be disjoint across the two sides (checked) —
    * alias upstream. */
  def intervalOverlap(a: DataFrame, b: DataFrame,
                      aStart: String, aEnd: String,
                      bStart: String, bEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    requireIntegral(a, Seq(aStart, aEnd))
    requireIntegral(b, Seq(bStart, bEnd))
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"column names must be disjoint across sides, both have: $shared")
    def bucketOf(c: Column): Column =
      call_function("div", c.cast("long"), lit(bucketWidth))
    def banded(df: DataFrame, s: String, e: String) = df
      // empty intervals overlap nothing — and sequence(b0, b1) with
      // b1 < b0 would fabricate a DESCENDING bucket range
      .filter(col(e) > col(s))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(s)), bucketOf(col(e) - 1))))
    banded(a, aStart, aEnd).join(banded(b, bStart, bEnd), Seq("__bucket"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("__bucket") ===
        bucketOf(greatest(col(aStart), col(bStart))))
      .drop("__bucket")
  }
}
