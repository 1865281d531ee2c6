package graft.htn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Part 2 (a-c): denominator cohort construction — demographics cleaning,
  * mis-bridge removal, location dedup, age subsets.
  *
  * Reference: `2_data_importing_cleaning.R:59-198`. All semantics traps from
  * SURVEY.md §7.5 are resolved here:
  *  - quote-wrapped source values are normalized ONCE at ingest (the
  *    reference trips on `"\"F\""` vs `"F"`, `:192` vs `:197`);
  *  - the zip3 double-strip (`TRIM` in SQL then `str_sub(.,2,-2)` in R,
  *    `:69` + `:655`) is NOT reproduced — intended value is the bare
  *    3-character zip prefix, stripped exactly once;
  *  - dedup winners are pinned by a total order (STATE, ZIP3), not
  *    "first row in frame order" (`:150-156` is order-dependent in R).
  */
object Cohort {

  private def unquote(c: org.apache.spark.sql.Column) = trim(c, "\"")

  /** Demographics projection + normalization + null-key removal
    * (`2_data_importing_cleaning.R:61-81`). One row per source PERSON row. */
  def demographics(person: DataFrame): DataFrame =
    person.select(
        col("PATIENT_LINKAGE"),
        col("YEAR_OF_BIRTH"),
        unquote(col("ETHNICITY_SOURCE_VALUE")).as("RACE"),
        unquote(col("GENDER_SOURCE_VALUE")).as("SEX"),
        unquote(col("LOCATION_ZIP")).as("ZIP3"),
        col("LOCATION_STATE").as("STATE"),
        col("GENDER_CONCEPT_ID"))
      .filter(col("PATIENT_LINKAGE").isNotNull)

  /** Mis-bridge removal: keep only patients whose YOB, SEX and RACE are
    * single-valued across all their rows (`2_data_importing_cleaning.R:134-142`).
    * Exact count-distinct (the predicate is == 1, approx would be wrong).
    * Returns the input rows of surviving patients. */
  def dropMisBridged(demo: DataFrame): DataFrame = {
    val ok = demo.groupBy("PATIENT_LINKAGE")
      .agg(countDistinct(col("YEAR_OF_BIRTH")).as("yob_count"),
           countDistinct(col("SEX")).as("sex_count"),
           countDistinct(col("RACE")).as("race_count"))
      .filter(col("yob_count") === 1 && col("sex_count") === 1 && col("race_count") === 1)
      .select("PATIENT_LINKAGE")
    demo.join(ok, Seq("PATIENT_LINKAGE"), "left_semi")
  }

  /** Location cleanup: drop rows with missing STATE/ZIP3, then keep exactly
    * one row per patient, deterministically (ordered by STATE, ZIP3 — the
    * reference keeps an arbitrary one, `2_data_importing_cleaning.R:145-156`;
    * SURVEY §2.4 A7). Output = `all_pop3c`: one row per patient. */
  def dedupLocations(demo: DataFrame): DataFrame =
    graft.operators.Dedup.keepFirst(
      demo.filter(col("STATE").isNotNull && col("ZIP3").isNotNull),
      key = Seq(col("PATIENT_LINKAGE")),
      order = Seq(col("STATE"), col("ZIP3")))

  /** Adults 18+ in the measurement year (`2_data_importing_cleaning.R:185-187`). */
  def adults(cohort: DataFrame, cfg: HtnConfig): DataFrame =
    cohort.filter(col("YEAR_OF_BIRTH") <= cfg.adultMaxYob)

  /** Women of reproductive age 18-44 (`2_data_importing_cleaning.R:194-198`). */
  def wra(cohort: DataFrame, cfg: HtnConfig): DataFrame =
    cohort.filter(col("YEAR_OF_BIRTH").between(cfg.wraMinYob, cfg.wraMaxYob) &&
                  col("SEX") === "F")

  /** Final label cleanup (`2_data_importing_cleaning.R:637-658`): age,
    * recoded race/sex, lowercase column names. */
  def cleanLabels(cohort: DataFrame, cfg: HtnConfig): DataFrame =
    cohort.select(
      col("PATIENT_LINKAGE"),
      col("YEAR_OF_BIRTH"),
      (lit(cfg.measurementYear) - col("YEAR_OF_BIRTH")).as("age"),
      // recode(...) at :644-653; unmapped values pass through like dplyr recode
      when(col("RACE") === "AFRICAN AMERICAN", "Black")
        .when(col("RACE") === "ASIAN", "Asian")
        .when(col("RACE") === "CAUCASIAN", "White")
        .when(col("RACE") === "HISPANIC", "Hispanic")
        .when(col("RACE") === "OTHER", "Other")
        .when(col("RACE") === "UNKNOWN", "Unknown")
        .otherwise(col("RACE")).as("race"),
      when(col("SEX") === "F", "Female")
        .when(col("SEX") === "M", "Male")
        .otherwise(col("SEX")).as("sex"),
      col("STATE").as("state"),
      // intended zip3 = bare 3-char prefix; the reference's second strip
      // (str_sub(.,2,-2), :655) double-applies and is documented bug-adjacent
      col("ZIP3").as("zip3"))
}
