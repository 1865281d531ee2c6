package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: per-key rollup STATE that merges
  * exactly — the aggregate twin of the dedup `SignatureIndex` and the ANN
  * `IvfIndex` build/probe split. Build state once per corpus version
  * (write it as a table), then fold each arriving batch in with one
  * state-sized merge instead of re-scanning the corpus — the difference
  * between O(batch) and O(corpus) per refresh at 100 TB.
  *
  * Mergeability is exact, not approximate: counts and sums are algebraic
  * (long-unit fixed-point sums, so merge order — and therefore executor
  * scheduling — can never change a bit), min/max are idempotent
  * semilattice ops. State is self-describing via column-name prefixes
  * (`cnt_` / `sum_` / `min_` / `max_`): `merge` needs no side-channel
  * schema, so state written by one job merges in another.
  *
  * Retraction (CDC deletes) is supported for the invertible metrics only:
  * counts and sums subtract; min/max cannot un-see a value (classic
  * non-invertibility) — `retract` refuses state carrying them rather than
  * silently producing stale bounds.
  */
object IncrementalAgg {

  private val Prefixes = Seq("cnt_", "sum_", "min_", "max_")
  private def isMetric(c: String): Boolean = Prefixes.exists(c.startsWith)

  /** Aggregate `df` into mergeable per-key state.
    *
    * @param sums (column, scale) pairs: values are rounded to integer
    *             units at `scale` decimals and summed as longs — exact for
    *             fixed-point data, deterministic under any merge order
    *             (same contract as the query surface's exactSum)
    * @param minMax columns to track min/max of (cast to double)
    */
  def build(df: DataFrame, keys: Seq[String],
            sums: Seq[(String, Int)] = Nil,
            minMax: Seq[String] = Nil): DataFrame = {
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("cnt_rows")) ++
        sums.map { case (c, scale) =>
          val f = math.pow(10, scale)
          sum(round(col(c) * f, 0).cast("long")).as(s"sum_${c}__$scale")
        } ++
        minMax.flatMap(c => Seq(
          min(col(c).cast("double")).as(s"min_$c"),
          max(col(c).cast("double")).as(s"max_$c")))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge state frames (same schema) into one: one shuffle of STATE rows
    * — never of the underlying data. Keys are inferred as the columns
    * carrying no metric prefix; a natural key column that itself starts
    * with a metric prefix (e.g. `sum_type`) would be mis-classified, so
    * inference REFUSES ambiguity-prone schemas unless the keys are
    * declared via the explicit overload. */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state frame")
    val schema = states.head.schema
    val keys = states.head.columns.filterNot(isMetric).toSeq
    require(keys.nonEmpty, "state has no key columns")
    // the promised refusal: a column inference classifies as a metric must
    // LOOK like build()'s output — numeric, and for sum_ carrying the
    // __<scale> suffix build() always appends. A natural key named
    // `sum_type` (string) or `sum_parts` (no scale suffix) trips this
    // instead of being silently aggregated away.
    val suspect = states.head.columns.filter(isMetric).filterNot { c =>
      val numeric = schema(c).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType]
      val shape = c == "cnt_rows" || c.matches("sum_.*__\\d+") ||
        c.startsWith("min_") || c.startsWith("max_")
      numeric && shape
    }
    require(suspect.isEmpty,
      s"columns carry a metric prefix but do not look like build() state " +
        s"(numeric; sum_ with a __<scale> suffix): ${suspect.mkString(", ")}" +
        " — these are probably natural keys; use merge(keys, states*) to " +
        "declare the key set explicitly")
    merge(keys, states: _*)
  }

  /** Merge with DECLARED key columns — the safe form when a key name could
    * collide with a metric prefix. Every column must be either a declared
    * key or a metric-prefixed state column; anything else is an error, not
    * a silent aggregation. */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state frame")
    val all = states.reduce(_.unionByName(_))
    val missing = keys.filterNot(all.columns.contains)
    require(missing.isEmpty,
      s"declared key columns absent from state: ${missing.mkString(", ")}")
    val stray = all.columns.filterNot(c => keys.contains(c) || isMetric(c))
    require(stray.isEmpty,
      s"state columns neither declared keys nor metric-prefixed " +
        s"(cnt_/sum_/min_/max_): ${stray.mkString(", ")} — declare them as " +
        "keys or rename; refusing to guess")
    val metricCols = all.columns.filterNot(keys.contains)
    val aggs: Seq[Column] = metricCols.toIndexedSeq.map { c =>
      if (c.startsWith("min_")) min(col(c)).as(c)
      else if (c.startsWith("max_")) max(col(c)).as(c)
      else sum(col(c)).as(c) // cnt_ and sum_ both add
    }
    all.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Remove `deleted` rows' contribution from `state`: build state over
    * the deleted rows with the SAME spec, negate its additive metrics, and
    * merge. Only count/sum state is invertible — refuses min/max on BOTH
    * sides (a min/max-carrying `state` would otherwise die later inside
    * merge with an opaque union error). Keys whose count reaches exactly 0
    * are dropped (fully-retracted key); a key driven NEGATIVE means the
    * CDC input retracted rows never built in — that is corrupt input and
    * fails the job at execution time instead of being silently dropped. */
  def retract(state: DataFrame, deletedState: DataFrame): DataFrame = {
    Seq("state" -> state, "deletedState" -> deletedState).foreach {
      case (which, df) =>
        val bad = df.columns.filter(c =>
          c.startsWith("min_") || c.startsWith("max_"))
        require(bad.isEmpty,
          s"min/max state is not invertible; cannot retract ($which " +
            s"carries: ${bad.mkString(", ")})")
    }
    val negated = deletedState.columns.foldLeft(deletedState) { (d, c) =>
      if (c.startsWith("cnt_") || c.startsWith("sum_"))
        d.withColumn(c, -col(c)) else d
    }
    val merged = merge(state, negated)
    val keys = merged.columns.filterNot(isMetric)
    merged
      .filter(col("cnt_rows") =!= 0)
      .withColumn("cnt_rows",
        when(col("cnt_rows") < 0,
          raise_error(concat(
            lit("IncrementalAgg.retract: cnt_rows went negative for key "),
            to_json(struct(keys.map(col): _*)),
            lit(" — deleted rows were never built into this state"))))
          .otherwise(col("cnt_rows")))
  }

  /** Present state for reading: decode `sum_<c>__<scale>` long units back
    * to doubles as `sum_<c>`, rename `cnt_rows` to `n`. Derived metrics
    * (avg = sum/n) are one select away and deliberately not stored — they
    * don't merge. */
  def finish(state: DataFrame): DataFrame = {
    val cols: Seq[Column] = state.columns.toIndexedSeq.map {
      case "cnt_rows" => col("cnt_rows").as("n")
      case c if c.startsWith("sum_") && c.contains("__") =>
        val base = c.substring(4, c.lastIndexOf("__"))
        val scale = c.substring(c.lastIndexOf("__") + 2).toInt
        (col(c) / math.pow(10, scale)).as(s"sum_$base")
      case c => col(c)
    }
    state.select(cols: _*)
  }
}
