package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, attach the latest right row whose time is
  * strictly before (or equal to, see `strict`) the left row's time, per key.
  *
  * Spark-first formulation (SURVEY §7.3 preference (a): compose existing
  * ops): union the two sides tagged, run one ranking window per key ordered
  * by (time, tiebreak), and carry the "last right row seen" with a running
  * `max(struct)` — nulls skipped, so left rows pick up the most recent
  * right payload. ONE shuffle on the key, no range-explosion join, no
  * per-row binary search: the classic distributed as-of shape that scales
  * linearly with input and never builds candidate pairs.
  *
  * Tie semantics are pinned: right rows at the same timestamp resolve to
  * the highest tiebreak value (struct ordering), and `strict` excludes
  * same-instant right rows via the window frame (UNBOUNDED PRECEDING .. 1
  * PRECEDING) — both deterministic under any partitioning.
  */
object AsOfJoin {

  /** @param left       rows to enrich
    * @param right      rows providing the as-of payload
    * @param keys       equi-join key column names (present on both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightTiebreak column on `right` ordering same-instant rows
    * @param payload    right columns to attach (emitted as `asof_<name>`)
    * @param strict     true → the matched right row must be strictly on the
    *                   match side of the left row's (time, tiebreak) order
    *                   position (earlier for backward, later for forward) —
    *                   same-instant right rows never match; false → same-
    *                   instant right rows are eligible in both directions
    * @param direction  "backward" (default): latest right row at-or-before;
    *                   "forward": EARLIEST right row at-or-after (same
    *                   single-shuffle shape — the window frame flips to
    *                   FOLLOWING and the running max becomes a running min,
    *                   ties resolving to the LOWEST tiebreak)
    * @param tolerance  max |leftTime − rightTime| for a match to count;
    *                   requires NUMERIC time columns (e.g. epoch micros) so
    *                   the unit is defined; farther matches emit
    *                   NULL payload, exactly like an unmatched row. The
    *                   bound is applied AFTER the running pick — for the
    *                   backward/forward nearest row, in-tolerance-but-not-
    *                   nearest rows never resurface (pandas merge_asof
    *                   semantics).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, rightTiebreak: String,
           payload: Seq[String], strict: Boolean = true,
           direction: String = "backward",
           tolerance: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    tolerance.foreach { t =>
      require(t >= 0, s"tolerance must be >= 0, got $t")
      // a plain-number tolerance only has defined units against NUMERIC
      // time columns (epoch micros, ticks, ...): DATE/TIMESTAMP arithmetic
      // would silently reinterpret it (days for DATE) — the unit the
      // caller assumed and the unit applied could differ by 86400×
      def numeric(d: org.apache.spark.sql.types.DataType) =
        d.isInstanceOf[org.apache.spark.sql.types.NumericType]
      val (lt, rt) = (left.schema(leftTime).dataType, right.schema(rightTime).dataType)
      require(numeric(lt) && numeric(rt),
        s"tolerance=$t needs numeric time columns to have defined units; " +
          s"got $leftTime: $lt, $rightTime: $rt — convert event time to " +
          "epoch micros (unix_micros) first")
    }
    val forward = direction == "forward"
    val keyCols = keys.map(col)

    // the tiebreak is cast to long below; a non-numeric column would cast
    // to NULL on every row and silently degrade the documented
    // deterministic same-instant resolution to payload-struct comparison —
    // refuse eagerly, like the tolerance column check above
    locally {
      val dt = right.schema(rightTiebreak).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"rightTiebreak '$rightTiebreak' must be numeric (cast to long for " +
          s"the same-instant total order); got $dt — hash or rank it to a " +
          "number first")
    }

    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0))
      .withColumn("__tb", lit(null).cast("long"))
    val r = right.withColumn("__t", col(rightTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", col(rightTiebreak).cast("long"))

    // single tagged stream; same-instant right rows land inside the frame
    // (preceding for backward, following for forward) iff non-strict
    // matching should see them
    val sideOrder = if (strict ^ forward) col("__side") else -col("__side")
    val common = (keys ++ Seq("__t", "__side", "__tb")).distinct
    val lCols = l.columns.toSeq
    val rPayload = payload
    val tagged = l.select((common.map(col) ++
        lCols.filterNot(common.contains).map(c => col(c)) ++
        rPayload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c"))): _*)
      .unionByName(
        r.select((common.map(col) ++
          lCols.filterNot(common.contains).map(c => lit(null).cast(l.schema(c).dataType).as(c)) ++
          rPayload.map(c => col(c).as(s"__p_$c"))): _*))

    val wBase = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), sideOrder, col("__tb"))
    val w =
      if (forward) wBase.rowsBetween(1, Window.unboundedFollowing)
      else wBase.rowsBetween(Window.unboundedPreceding, -1)

    // running "nearest right row": max (backward) / min (forward) over
    // (time, tiebreak, payload...) of right rows only — null for left
    // rows, and max/min skip nulls
    val rightStruct = when(col("__side") === 1,
      struct((Seq(col("__t"), col("__tb")) ++ rPayload.map(c => col(s"__p_$c"))): _*))
    val pick = if (forward) min(rightStruct) else max(rightStruct)
    val withinTol = tolerance.map { tol =>
      if (forward) col("__r.__t") <= col("__t") + tol
      else col("__r.__t") >= col("__t") - tol
    }.getOrElse(lit(true))
    val joined = tagged
      .withColumn("__r", pick.over(w))
      .withColumn("__last_r", when(col("__r").isNotNull && withinTol, col("__r")))
      .filter(col("__side") === 0)

    val out = joined.select(
      (lCols.map(col) ++
        rPayload.map(c => col(s"__last_r.__p_$c").as(s"asof_$c")) :+
        col(s"__last_r.__t").as("asof_time")): _*)
    out.drop("__t", "__side", "__tb")
  }
}
