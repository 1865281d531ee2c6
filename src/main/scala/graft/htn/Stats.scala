package graft.htn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Surveillance statistics: frequency tables (janitor::tabyl +
  * adorn_totals parity — SURVEY §2.4 A5), exclusion-rate metrics (A6), and
  * the dashboard prevalence cube (§7.4 extension).
  */
object Stats {

  /** One-way frequency table with share-of-total and a total row
    * (`2_data_importing_cleaning.R:96-126,630-634`,
    * `4_hypertension_phenotype_main.R:182-186`). Output columns:
    * (value: string, n, percent). */
  def tabyl(df: DataFrame, c: String): DataFrame = {
    val counts = df.groupBy(col(c).cast("string").as("value"))
      .agg(count(lit(1)).as("n"))
      .withColumn("percent",
        col("n").cast("double") / sum(col("n")).over(Window.partitionBy()))
    val total = df.agg(count(lit(1)).as("n"))
      .select(lit("Total").as("value"), col("n"), lit(1.0).as("percent"))
    counts.orderBy("value").unionByName(total)
  }

  /** Exclusion-rate metrics computed in one pass (no repeated nrow() scans;
    * the reference recounts full tables three times,
    * `2_data_importing_cleaning.R:403-405,483-484,619-620`). */
  final case class ExclusionMetrics(
      cohort: Long, wra: Long,
      afterPregnancy: Long, afterEsrd: Long, afterCare: Long) {
    // zero denominators (empty cohort / no WRA patients) report 0.0 rather
    // than Infinity/NaN — those are unrepresentable in JSON and would
    // corrupt the emitted metrics file
    private def pct(num: Long, denom: Long): Double =
      if (denom == 0) 0.0 else 100.0 * num / denom
    def pregnancyPctOfWra: Double = pct(cohort - afterPregnancy, wra)
    def esrdPctOfCohort: Double = pct(afterPregnancy - afterEsrd, cohort)
    def carePctOfCohort: Double = pct(afterEsrd - afterCare, cohort)
  }

  /** Dashboard extension: hypertension prevalence by state × sex × race ×
    * age group with all-subtotal rollups (cube). */
  def prevalenceCube(analytical: DataFrame): DataFrame = {
    val ageGroup = when(col("age") < 45, "18-44")
      .when(col("age") < 65, "45-64")
      .otherwise("65+")
    analytical
      .withColumn("age_group", ageGroup)
      .cube(col("state"), col("sex"), col("race"), col("age_group"))
      .agg(count(lit(1)).as("n"),
           sum(col("hypertension_140")).as("n_htn140"),
           sum(col("hypertension_130")).as("n_htn130"))
      .withColumn("prev_140", round(col("n_htn140").cast("double") / col("n"), 4))
      .withColumn("prev_130", round(col("n_htn130").cast("double") / col("n"), 4))
  }
}
