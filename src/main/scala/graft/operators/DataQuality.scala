package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data-quality audit — the constraint-metrics step every
  * large-scale ingest runs before training data is trusted (the reference
  * pipeline does this ad hoc: `summary()` / `tabyl()` sanity prints in
  * `2_data_importing_cleaning.R` and the plausibility screens of
  * `3_blood_pressure.R`; here it is one declarative operator).
  *
  * Scale shape: ALL column metrics ride a single aggregation over one scan
  * of the input — null counts, min/max, and key-duplication reduce
  * map-side to one tiny partial row per partition regardless of input
  * width. The only caveat is exact distinct counts: n distinct columns in
  * one agg plan through Catalyst's Expand (input ×(n+1) rows before the
  * partial agg). That is the honest price of an EXACT audit and is the
  * mode the DuckDB oracle can check; at 100 TB run `exact = false` and the
  * same metrics come from one-pass DataSketches HLL estimates (no Expand,
  * ONE binary buffer per sketch — see the in-body note on why NOT
  * `approx_count_distinct` — and the binary form is directly mergeable
  * across independently-audited shards via `hll_union_agg`).
  *
  * Output is long-format `(metric, col_name, value: double)` so audits of
  * arbitrarily wide tables union, diff across snapshots (TableDiff on
  * (metric, col_name)), and threshold-check uniformly.
  */
object DataQuality {

  /** Audit `df` in one aggregation pass.
    *
    * Key semantics: rows where ANY declared key column is NULL are
    * excluded from the duplicate computation (a NULL key identifies
    * nothing — same convention as SQL `count(DISTINCT k)` and
    * [[referentialOrphans]]) and surfaced separately as `null_key_rows`,
    * so "key collides" and "key missing" stay distinguishable failures.
    *
    * @param nullCols     columns to count NULLs in
    * @param distinctCols columns to count distinct non-null values of
    * @param numericCols  columns to min/max (cast to double)
    * @param keyCols      declared unique key; emits `dup_key_rows` =
    *                     non-null-key rows − distinct(key) (0 when the key
    *                     holds) and `null_key_rows` = rows with a NULL key
    * @param exact        true → exact countDistinct (Expand cost, oracle-
    *                     checkable); false → HLL++ approx, one pass, no
    *                     Expand — the 100 TB mode. Approx `dup_key_rows`
    *                     is clamped at 0 (HLL can overestimate the
    *                     distinct count past the row count) and is a
    *                     NOISY LOWER-BOUND SIGNAL, not an exact count:
    *                     small duplicate counts can vanish under the
    *                     sketch error (±rsd·n); use exact mode to assert
    *                     a key strictly.
    * @param rsd          target relative standard deviation of the HLL
    *                     estimates when `exact = false` (default matches
    *                     Spark's approx_count_distinct default)
    */
  def audit(df: DataFrame,
            nullCols: Seq[String] = Nil,
            distinctCols: Seq[String] = Nil,
            numericCols: Seq[String] = Nil,
            keyCols: Seq[String] = Nil,
            exact: Boolean = true,
            rsd: Double = 0.05): DataFrame = {
    // Approx mode uses the DataSketches HLL aggregate, NOT
    // approx_count_distinct: Spark's HLL++ materializes its registers as
    // individual aggregate-buffer ATTRIBUTES — 1639 longs per sketch at
    // rsd = 0.01 — and every optimizer pass over a plan built on top of
    // the audit then walks thousands of expression nodes (measured: the
    // q59 join re-planned in ~2 s of pure driver time per execution,
    // ~0.6 s per approx slot). hll_sketch_agg carries ONE binary buffer
    // per sketch, the plan stays attribute-thin, and the sketch form is
    // the one that actually serves the documented cross-shard merge story
    // (store the binary, hll_union_agg across shards). lgK is derived
    // from the requested rsd (rse ≈ 1.16/√2^lgK for the HLL_8 default).
    // Supported input types (int/long/string/binary) feed the sketch RAW
    // — its list/set stages are then exact at low cardinality, the
    // property the spec pins — and only unsupported types (structs,
    // doubles, dates) are xxhash64-normalized first, null-gated so
    // count-distinct's null-skip semantics survive. A 64-bit pre-hash
    // collision only UNDER-counts, the direction approx mode already
    // documents as its noise (and it is real: xxhash64-ing the spec's
    // 100-long fixture before sketching produced a deterministic coupon
    // collision, estimate 99 — hash only when the type forces it).
    val lgK = math.max(4, math.min(21,
      math.ceil(2 * math.log(1.16 / rsd) / math.log(2)).toInt))
    import org.apache.spark.sql.types._
    def sketchable(dt: DataType): Boolean = dt match {
      case IntegerType | LongType | StringType | BinaryType => true
      case _ => false
    }
    def sketchCd(c: Column, dt: DataType): Column = {
      val in = if (sketchable(dt)) c else when(c.isNotNull, xxhash64(c))
      // coalesce: a sketch over zero non-null inputs is NULL, where exact
      // countDistinct reports 0 — the two modes must agree on empty
      coalesce(hll_sketch_estimate(hll_sketch_agg(in, lgK)), lit(0L))
    }
    def cdNamed(name: String): Column =
      if (exact) countDistinct(col(name))
      else sketchCd(col(name), df.schema(name).dataType)

    // `count(keyStruct)`/`cd(keyStruct)` both skip NULL inputs, so gating
    // the struct on all-keys-non-null implements the key semantics above
    // inside the same single aggregate (no second scan, no filter job).
    val keyStruct: Column =
      if (keyCols.isEmpty) lit(null)
      else when(keyCols.map(col(_).isNotNull).reduce(_ && _),
                struct(keyCols.map(col): _*))
    // single supported-type key: sketch the raw (null-gated) column, not
    // the struct — keeps the low-cardinality exactness on the common case
    val keyCd: Column =
      if (exact) countDistinct(keyStruct)
      else keyCols match {
        case Seq(k) if sketchable(df.schema(k).dataType) =>
          sketchCd(col(k), df.schema(k).dataType)
        case _ => sketchCd(keyStruct, NullType /* force the hash path */)
      }
    def clamped(c: Column): Column =
      if (exact) c else greatest(lit(0L), c)

    // (metric, col_name, aggregate) triples, unpivoted after the agg.
    val slots: Seq[(String, String, Column)] =
      Seq(("row_count", "*", count(lit(1)))) ++
        nullCols.map(c =>
          ("null_count", c, count(lit(1)) - count(col(c)))) ++
        distinctCols.map(c => ("distinct_count", c, cdNamed(c))) ++
        numericCols.flatMap(c => Seq(
          ("min", c, min(col(c).cast("double"))),
          ("max", c, max(col(c).cast("double"))))) ++
        (if (keyCols.nonEmpty)
           Seq(
             ("dup_key_rows", keyCols.mkString(","),
               clamped(count(keyStruct) - keyCd)),
             ("null_key_rows", keyCols.mkString(","),
               count(lit(1)) - count(keyStruct)))
         else Nil)

    val aggs = slots.zipWithIndex.map { case ((_, _, e), i) => e.as(s"m$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // Unpivot the single metrics row driver-side-free: explode an array of
    // tagged structs (stack() can't tag with two literal key columns).
    val kvs = array(slots.zipWithIndex.map { case ((m, c, _), i) =>
      struct(lit(m).as("metric"), lit(c).as("col_name"),
        col(s"m$i").cast("double").as("value"))
    }: _*)
    wide.select(explode(kvs).as("kv")).select("kv.*")
  }

  /** Referential-integrity leg: count child rows whose `childKey` has no
    * match in `parent(parentKey)`. Left-anti join — at scale the parent
    * key set is usually the broadcast side; Catalyst/AQE picks that when
    * it fits, and the aggregate is a single count. NULL child keys are
    * orphans by definition here (they reference nothing) and are counted
    * separately under `null_key_rows` so the two failure modes stay
    * distinguishable. */
  def referentialOrphans(child: DataFrame, childKey: String,
                         parent: DataFrame, parentKey: String): DataFrame = {
    val nn = child.filter(col(childKey).isNotNull)
    val orphans = nn.join(
      parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")
    val orphanRow = orphans.agg(count(lit(1)).cast("double").as("value"))
      .select(lit("orphan_count").as("metric"), lit(childKey).as("col_name"),
        col("value"))
    val nullRow = child.agg(
        (count(lit(1)) - count(col(childKey))).cast("double").as("value"))
      .select(lit("null_key_rows").as("metric"), lit(childKey).as("col_name"),
        col("value"))
    orphanRow.unionByName(nullRow)
  }
}
