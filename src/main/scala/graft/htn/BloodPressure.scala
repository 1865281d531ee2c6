package graft.htn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Part 3: blood-pressure extraction, cleaning, same-day averaging,
  * denominator inclusion, high-BP flags, and control flags.
  *
  * Reference: `3_blood_pressure.R`. Semantics decisions (SURVEY §7.5):
  *  - plausibility bounds use closed-interval `between` (the R code's
  *    `SBP %in% 30:300` keeps only integer values — `3_blood_pressure.R:147`;
  *    intent per `:143` is a plausibility range, so 112.5 is plausible);
  *  - same-day mean is rounded half-even to 1dp (`bround`) to match R's
  *    banker's `round(mean(x), 1)` (`:170,:174`);
  *  - the year filter applies to MEASUREMENT_DATE (bug B3: the SQL filters
  *    `YEAR(DRUG_EXPOSURE_START_DATE)` on the MEASUREMENT table, `:100,:123`);
  *  - the 130/80 flag is computed from its own rows, not the 140-table's
  *    (bug B5, `:310`);
  *  - latest-reading argmax is pinned by (date, SBP_avg, DBP_avg) total
  *    order; after same-day averaging, (patient, date) is unique, so this
  *    matches R `slice(which.max(date))` wherever that is well-defined.
  */
object BloodPressure {

  /** One cleaned reading stream: concept+unit+year filter, plausibility
    * bounds (`3_blood_pressure.R:85-127,145-151`). Output:
    * (PATIENT_LINKAGE, MEASUREMENT_DATE, value as `alias`). */
  def readings(measurement: DataFrame, concepts: Seq[Long], years: Seq[Int],
               lo: Double, hi: Double, alias: String): DataFrame =
    measurement
      .filter(col("MEASUREMENT_CONCEPT_ID").isin(concepts: _*) &&
              col("UNIT_CONCEPT_ID") === Codelists.mmHgUnit &&
              year(col("MEASUREMENT_DATE")).isin(years: _*) &&
              col("VALUE_AS_NUMBER").isNotNull &&
              col("VALUE_AS_NUMBER").between(lo, hi))
      .select(col("PATIENT_LINKAGE"), col("MEASUREMENT_DATE"),
              col("VALUE_AS_NUMBER").as(alias))

  /** Same-day average, banker's-rounded to 1dp (`3_blood_pressure.R:168-174`).
    * Partial aggregation (map-side combine) comes free from Catalyst. */
  def sameDayAvg(readings: DataFrame, valueCol: String): DataFrame =
    readings.groupBy("PATIENT_LINKAGE", "MEASUREMENT_DATE")
      .agg(bround(avg(col(valueCol)), 1).as(s"${valueCol}_avg"))

  /** Complete same-day SBP+DBP pairs: composite-key inner join
    * (`3_blood_pressure.R:203-205`). Both sides are already aggregated to
    * (patient, date) grain, so this is a 1:1 join. */
  def pairedDays(sbpAvg: DataFrame, dbpAvg: DataFrame): DataFrame =
    sbpAvg.join(dbpAvg, Seq("PATIENT_LINKAGE", "MEASUREMENT_DATE"))

  /** BP denominator, per-day grain (`all_pop_clean3`): cohort patients with
    * ≥1 complete pair in the window (`3_blood_pressure.R:207-216`). */
  def denominatorDays(cohort: DataFrame, pairs: DataFrame): DataFrame =
    cohort.join(pairs, Seq("PATIENT_LINKAGE")) // inner: left-join + non-null filter

  /** BP denominator, per-patient grain (`all_pop_clean4`,
    * `3_blood_pressure.R:220-222`): one row per patient with demographics. */
  def denominatorPatients(denomDays: DataFrame): DataFrame =
    denomDays
      .select("PATIENT_LINKAGE", "YEAR_OF_BIRTH", "age", "sex", "race", "state", "zip3")
      .dropDuplicates("PATIENT_LINKAGE") // demographic cols are single-valued per patient

  /** High-BP flag at a threshold: ≥ `minDays` separate days with
    * SBP_avg >= s OR DBP_avg >= d within the measurement year
    * (`3_blood_pressure.R:260-290`). Output: (PATIENT_LINKAGE, flag 0/1). */
  def highBpFlag(denomDays: DataFrame, cfg: HtnConfig,
                 s: Double, d: Double, flagName: String): DataFrame =
    denomDays
      .filter(year(col("MEASUREMENT_DATE")) === cfg.measurementYear)
      .withColumn("hbp",
        when(col("SBP_avg") >= s || col("DBP_avg") >= d, 1).otherwise(0))
      .groupBy("PATIENT_LINKAGE")
      .agg(sum(col("hbp")).as("n"))
      .withColumn(flagName, when(col("n") > cfg.minHighBpDays - 1, 1).otherwise(0))
      .select("PATIENT_LINKAGE", flagName)

  /** BP-control flag: most recent reading in the measurement year is below
    * the threshold (`3_blood_pressure.R:351-363,377-389`). Argmax by date
    * with pinned tie order. */
  def controlFlag(denomDays: DataFrame, cfg: HtnConfig,
                  s: Double, d: Double, flagName: String): DataFrame =
    denomDays
      .filter(year(col("MEASUREMENT_DATE")) === cfg.measurementYear)
      .groupBy("PATIENT_LINKAGE")
      .agg(max(struct(col("MEASUREMENT_DATE"), col("SBP_avg"), col("DBP_avg"))).as("m"))
      .withColumn(flagName,
        when(col("m.SBP_avg") < s && col("m.DBP_avg") < d, 1).otherwise(0))
      .select("PATIENT_LINKAGE", flagName)
}
