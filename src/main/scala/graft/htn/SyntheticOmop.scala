package graft.htn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic OMOP generator at arbitrary patient counts —
  * the scale-testing source (the reference's SAMPLE_/RANDOM1000_ dev
  * databases, generalized; BASELINE.md's hard number is the R pipeline's
  * grouped high-BP flag DNF'ing at >4 h on 12M patients).
  *
  * Everything derives from hash functions of the row id: fully parallel
  * generation (spark.range → select), no driver-side data, reproducible
  * at any scale. Value distributions are hash-uniform; rates roughly
  * mirror the reference's QC numbers (a few % excluded, ~half with BP
  * readings, ~30% hypertensive).
  */
object SyntheticOmop {

  private def h(seed: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("id"), lit(seed)), lit(1000000L))

  def generate(spark: SparkSession, nPatients: Long,
               readingsPerPatient: Int = 8): OmopTables = {
    val year = 2023

    val persons = spark.range(nPatients).select(
      concat(lit("P"), lpad(col("id").cast("string"), 10, "0")).as("PATIENT_LINKAGE"),
      (lit(1930) + pmod(xxhash64(col("id"), lit(1)), lit(85))).cast("int").as("YEAR_OF_BIRTH"),
      when(h(2) < 500000, 8532L).otherwise(8507L).as("GENDER_CONCEPT_ID"),
      concat(lit("\""),
        element_at(typedLit(Seq("CAUCASIAN", "AFRICAN AMERICAN", "ASIAN", "HISPANIC", "OTHER", "UNKNOWN")),
          (pmod(xxhash64(col("id"), lit(3)), lit(6)) + 1).cast("int")),
        lit("\"")).as("ETHNICITY_SOURCE_VALUE"),
      when(h(2) < 500000, "\"F\"").otherwise("\"M\"").as("GENDER_SOURCE_VALUE"),
      concat(lit("\""), lpad(pmod(xxhash64(col("id"), lit(4)), lit(900)).cast("string"), 3, "0"),
        lit("\"")).as("LOCATION_ZIP"),
      element_at(typedLit(Seq("GA", "CA", "NY", "TX", "WA", "IL", "FL", "OH")),
        (pmod(xxhash64(col("id"), lit(5)), lit(8)) + 1).cast("int")).as("LOCATION_STATE"))

    // readings: each patient gets `readingsPerPatient` SBP+DBP pairs over
    // 2022-2023; ~30% of patients run high
    val base = spark.range(nPatients * readingsPerPatient).select(
      (col("id") / readingsPerPatient).cast("long").as("pid"),
      pmod(col("id"), lit(readingsPerPatient.toLong)).as("visit"))
      .select(
        concat(lit("P"), lpad(col("pid").cast("string"), 10, "0")).as("PATIENT_LINKAGE"),
        date_add(lit(java.sql.Date.valueOf(s"${year - 1}-01-01")),
          pmod(xxhash64(col("pid"), col("visit"), lit(10)), lit(730)).cast("int"))
          .as("MEASUREMENT_DATE"),
        when(pmod(xxhash64(col("pid"), lit(11)), lit(100)) < 30,
          lit(135.0) + pmod(xxhash64(col("pid"), col("visit"), lit(12)), lit(40)))
          .otherwise(lit(105.0) + pmod(xxhash64(col("pid"), col("visit"), lit(12)), lit(30)))
          .as("SBP"),
        when(pmod(xxhash64(col("pid"), lit(11)), lit(100)) < 30,
          lit(85.0) + pmod(xxhash64(col("pid"), col("visit"), lit(13)), lit(25)))
          .otherwise(lit(65.0) + pmod(xxhash64(col("pid"), col("visit"), lit(13)), lit(20)))
          .as("DBP"))

    def meas(valueCol: String, concept: Long) = base.select(
      col("PATIENT_LINKAGE"),
      lit(concept).as("MEASUREMENT_CONCEPT_ID"),
      lit("\"BP\"").as("MEASUREMENT_CONCEPT_DESC"),
      col("MEASUREMENT_DATE"),
      col(valueCol).as("VALUE_AS_NUMBER"),
      lit(Codelists.mmHgUnit).as("UNIT_CONCEPT_ID"),
      lit("\"mmHg\"").as("UNIT_CONCEPT_DESC"))
    val measurement = meas("SBP", Codelists.sbpConcepts.head)
      .unionByName(meas("DBP", Codelists.dbpConcepts.head))

    // diagnoses: ~15% of patients, measurement-year
    val conditions = spark.range(nPatients).filter(h(20) < 150000).select(
      concat(lit("P"), lpad(col("id").cast("string"), 10, "0")).as("PATIENT_LINKAGE"),
      lit(400L).as("CONDITION_CONCEPT_ID"),
      lit("\"essential hypertension\"").as("CONDITION_CONCEPT_DESC"),
      date_add(lit(java.sql.Date.valueOf(s"$year-01-01")),
        pmod(xxhash64(col("id"), lit(21)), lit(364)).cast("int")).as("CONDITION_START_DATE"))

    // prescriptions: ~12%
    val drugs = spark.range(nPatients).filter(h(30) < 120000).select(
      concat(lit("P"), lpad(col("id").cast("string"), 10, "0")).as("PATIENT_LINKAGE"),
      lit(500L).as("DRUG_CONCEPT_ID"),
      date_add(lit(java.sql.Date.valueOf(s"$year-01-01")),
        pmod(xxhash64(col("id"), lit(31)), lit(364)).cast("int")).as("DRUG_EXPOSURE_START_DATE"))

    // exclusion events: ~1% each domain family
    val observations = spark.range(nPatients).filter(h(40) < 10000).select(
      concat(lit("P"), lpad(col("id").cast("string"), 10, "0")).as("PATIENT_LINKAGE"),
      when(h(41) < 500000, 201L).otherwise(302L).as("OBSERVATION_CONCEPT_ID"),
      date_add(lit(java.sql.Date.valueOf(s"$year-01-01")),
        pmod(xxhash64(col("id"), lit(42)), lit(364)).cast("int")).as("OBSERVATION_DATE"))
    val procedures = spark.range(nPatients).filter(h(50) < 10000).select(
      concat(lit("P"), lpad(col("id").cast("string"), 10, "0")).as("PATIENT_LINKAGE"),
      when(h(51) < 500000, 103L).otherwise(303L).as("PROCEDURE_CONCEPT_ID"),
      date_add(lit(java.sql.Date.valueOf(s"$year-01-01")),
        pmod(xxhash64(col("id"), lit(52)), lit(364)).cast("int")).as("PROCEDURE_DATE"))

    OmopTables(persons, conditions, measurement, observations, procedures, drugs)
  }

  /** Timing harness: generate at scale, run the full pipeline, print wall
    * seconds per stage. Usage: runMain graft.htn.SyntheticOmop <nPatients> */
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val tables = generate(spark, n)
    val res = HtnPipeline.run(spark, tables, OmopFixtures2.codes)
    val analyticalRows = res.analytical.count()
    val htn = res.analytical.agg(sum(col("hypertension_140"))).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"patients":$n,"analytical_rows":$analyticalRows,"htn140":$htn,"wall_sec":$secs%.1f}""")
    spark.stop()
  }
}

/** Codelists for the synthetic concept ids (mirrors OmopFixtures.codes,
  * which lives in test scope). */
object OmopFixtures2 {
  val codes: Codelists = Codelists(
    pregCondition = Seq(100L), pregMeasurement = Seq(101L),
    pregObservation = Seq(102L), pregProcedure = Seq(103L),
    esrdCondition = Seq(200L), esrdObservation = Seq(201L), esrdProcedure = Seq(202L),
    palliativeObservation = Seq(300L), palliativeProcedure = Seq(301L),
    hospiceObservation = Seq(302L), hospiceProcedure = Seq(303L),
    htnDx = Seq(400L), htnRx = Seq(500L))
}
