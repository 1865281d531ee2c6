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
  * same metrics come from one-pass HyperLogLog++ approximate counts (no
  * Expand; `approx_count_distinct` returns a finalized estimate per run —
  * to merge across independently-audited shards, re-run on the union or
  * keep the raw hll sketches with `hll_sketch_agg`).
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
    def cd(c: Column): Column =
      if (exact) countDistinct(c) else approx_count_distinct(c, rsd)

    // `count(keyStruct)`/`cd(keyStruct)` both skip NULL inputs, so gating
    // the struct on all-keys-non-null implements the key semantics above
    // inside the same single aggregate (no second scan, no filter job).
    val keyStruct: Column =
      if (keyCols.isEmpty) lit(null)
      else when(keyCols.map(col(_).isNotNull).reduce(_ && _),
                struct(keyCols.map(col): _*))
    def clamped(c: Column): Column =
      if (exact) c else greatest(lit(0L), c)

    // (metric, col_name, aggregate) triples, unpivoted after the agg.
    val slots: Seq[(String, String, Column)] =
      Seq(("row_count", "*", count(lit(1)))) ++
        nullCols.map(c =>
          ("null_count", c, count(lit(1)) - count(col(c)))) ++
        distinctCols.map(c => ("distinct_count", c, cd(col(c)))) ++
        numericCols.flatMap(c => Seq(
          ("min", c, min(col(c).cast("double"))),
          ("max", c, max(col(c).cast("double"))))) ++
        (if (keyCols.nonEmpty)
           Seq(
             ("dup_key_rows", keyCols.mkString(","),
               clamped(count(keyStruct) - cd(keyStruct))),
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
