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
  * same metrics come from HyperLogLog++ sketches (no Expand, still one
  * pass, mergeable across shards).
  *
  * Output is long-format `(metric, col_name, value: double)` so audits of
  * arbitrarily wide tables union, diff across snapshots (TableDiff on
  * (metric, col_name)), and threshold-check uniformly.
  */
object DataQuality {

  /** Audit `df` in one aggregation pass.
    *
    * @param nullCols     columns to count NULLs in
    * @param distinctCols columns to count distinct non-null values of
    * @param numericCols  columns to min/max (cast to double)
    * @param keyCols      declared unique key; emits `dup_key_rows` =
    *                     rows − distinct(key) (0 when the key holds)
    * @param exact        true → exact countDistinct (Expand cost, oracle-
    *                     checkable); false → HLL++ approx, one pass, no
    *                     Expand — the 100 TB mode
    */
  def audit(df: DataFrame,
            nullCols: Seq[String] = Nil,
            distinctCols: Seq[String] = Nil,
            numericCols: Seq[String] = Nil,
            keyCols: Seq[String] = Nil,
            exact: Boolean = true): DataFrame = {
    def cd(c: Column): Column =
      if (exact) countDistinct(c) else approx_count_distinct(c)

    // (metric, col_name, aggregate) triples; slot names joined with "§"
    // (never in a metric/column name) keep the wide→long mapping exact.
    val slots: Seq[(String, String, Column)] =
      Seq(("row_count", "*", count(lit(1)))) ++
        nullCols.map(c =>
          ("null_count", c, count(lit(1)) - count(col(c)))) ++
        distinctCols.map(c => ("distinct_count", c, cd(col(c)))) ++
        numericCols.flatMap(c => Seq(
          ("min", c, min(col(c).cast("double"))),
          ("max", c, max(col(c).cast("double"))))) ++
        (if (keyCols.nonEmpty)
           Seq(("dup_key_rows", keyCols.mkString(","),
             count(lit(1)) - cd(struct(keyCols.map(col): _*))))
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
