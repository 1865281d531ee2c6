package graft.htn

import java.sql.Date
import org.apache.spark.sql.SparkSession
import graft.htn.{Codelists => CL}

/** Deterministic OMOP scenario fixtures (FIXTURES.md §3): one named patient
  * per semantics trap. Measurement year 2023. */
object OmopFixtures {

  case class P(PATIENT_LINKAGE: String, YEAR_OF_BIRTH: java.lang.Integer,
               GENDER_CONCEPT_ID: Long, ETHNICITY_SOURCE_VALUE: String,
               GENDER_SOURCE_VALUE: String, LOCATION_ZIP: String, LOCATION_STATE: String)
  case class M(PATIENT_LINKAGE: String, MEASUREMENT_CONCEPT_ID: Long,
               MEASUREMENT_CONCEPT_DESC: String, MEASUREMENT_DATE: Date,
               VALUE_AS_NUMBER: Option[Double], UNIT_CONCEPT_ID: Long,
               UNIT_CONCEPT_DESC: String)
  case class C(PATIENT_LINKAGE: String, CONDITION_CONCEPT_ID: Long,
               CONDITION_CONCEPT_DESC: String, CONDITION_START_DATE: Date)
  case class O(PATIENT_LINKAGE: String, OBSERVATION_CONCEPT_ID: Long, OBSERVATION_DATE: Date)
  case class PR(PATIENT_LINKAGE: String, PROCEDURE_CONCEPT_ID: Long, PROCEDURE_DATE: Date)
  case class D(PATIENT_LINKAGE: String, DRUG_CONCEPT_ID: Long, DRUG_EXPOSURE_START_DATE: Date)

  val codes = Codelists(
    pregCondition = Seq(100L), pregMeasurement = Seq(101L),
    pregObservation = Seq(102L), pregProcedure = Seq(103L),
    esrdCondition = Seq(200L), esrdObservation = Seq(201L), esrdProcedure = Seq(202L),
    palliativeObservation = Seq(300L), palliativeProcedure = Seq(301L),
    hospiceObservation = Seq(302L), hospiceProcedure = Seq(303L),
    htnDx = Seq(400L), htnRx = Seq(500L))

  private def male(id: String, yob: Int, state: String = "GA") =
    P(id, yob, 8507L, "\"CAUCASIAN\"", "\"M\"", "\"303\"", state)
  private def female(id: String, yob: Int, state: String = "GA") =
    P(id, yob, CL.femaleConcept, "\"AFRICAN AMERICAN\"", "\"F\"", "\"303\"", state)

  private def d(s: String) = Date.valueOf(s)
  private def sbp(id: String, date: String, v: Double) =
    M(id, CL.sbpConcepts.head, "\"SBP\"", d(date), Some(v), CL.mmHgUnit, "\"mmHg\"")
  private def dbp(id: String, date: String, v: Double) =
    M(id, CL.dbpConcepts.head, "\"DBP\"", d(date), Some(v), CL.mmHgUnit, "\"mmHg\"")
  private def pair(id: String, date: String, s: Double, db: Double) =
    Seq(sbp(id, date, s), dbp(id, date, db))

  val persons: Seq[P] = Seq(
    male("PX_HTN_BP", 1970),
    male("PX_130_ONLY", 1980),
    male("PX_ONE_DAY", 1975),
    male("PX_CONTROL", 1960),
    male("PX_DX_ONLY", 1955),
    male("PX_RX_ONLY", 1965),
    female("PX_PREG", 1990),
    male("PX_ESRD", 1950),
    male("PX_HOSPICE", 1945),
    // mis-bridged: two distinct YOBs
    male("PX_MISBRIDGE", 1980), male("PX_MISBRIDGE", 1985),
    // null key (dropped at ingest)
    P(null, 1970, 8507L, "\"OTHER\"", "\"M\"", "\"303\"", "GA"),
    male("PX_SAMEDAY", 1972),
    // two states, same YOB/SEX/RACE → location dedup, deterministic 'CA' win
    male("PX_TIE", 1971, "GA"), male("PX_TIE", 1971, "CA"),
    male("PX_NOBP", 1968),
    male("PX_LOOKBACK", 1966),
    male("PX_MINOR", 2010),
    male("PX_PLAUS", 1973))

  val measurements: Seq[M] =
    pair("PX_HTN_BP", "2023-03-01", 150, 95) ++
    pair("PX_HTN_BP", "2023-05-01", 145, 92) ++
    pair("PX_130_ONLY", "2023-02-01", 132, 82) ++
    pair("PX_130_ONLY", "2023-04-01", 133, 83) ++
    pair("PX_ONE_DAY", "2023-03-10", 150, 95) ++
    pair("PX_ONE_DAY", "2023-06-10", 120, 70) ++
    pair("PX_CONTROL", "2023-07-01", 130, 85) ++
    pair("PX_DX_ONLY", "2023-08-01", 120, 70) ++
    pair("PX_RX_ONLY", "2023-09-01", 118, 75) ++
    // pregnant patient has BP too — must be excluded anyway
    pair("PX_PREG", "2023-03-02", 150, 95) ++ pair("PX_PREG", "2023-04-02", 150, 95) ++
    // same-day averaging + banker's rounding: (119.0+119.25+119.5)/3 = 119.25 → 119.2
    Seq(sbp("PX_SAMEDAY", "2023-04-15", 119.0),
        sbp("PX_SAMEDAY", "2023-04-15", 119.25),
        sbp("PX_SAMEDAY", "2023-04-15", 119.5),
        dbp("PX_SAMEDAY", "2023-04-15", 75)) ++
    pair("PX_TIE", "2023-05-05", 125, 80) ++
    // lookback-only: complete pair in 2022, nothing in 2023
    pair("PX_LOOKBACK", "2022-06-01", 135, 85) ++
    // implausible SBP=400 dropped (day has no pair); fractional 112.5 kept
    Seq(sbp("PX_PLAUS", "2023-03-03", 400), dbp("PX_PLAUS", "2023-03-03", 70),
        sbp("PX_PLAUS", "2023-03-04", 112.5), dbp("PX_PLAUS", "2023-03-04", 70),
        // null value row (dropped), wrong-unit row (dropped)
        M("PX_PLAUS", CL.sbpConcepts.head, "\"SBP\"", d("2023-03-05"), None, CL.mmHgUnit, "\"mmHg\""),
        M("PX_PLAUS", CL.sbpConcepts.head, "\"SBP\"", d("2023-03-06"), Some(150), 9999L, "\"other\"")) ++
    // out-of-window year 2021 (dropped by bpYears filter)
    pair("PX_NOBP", "2021-05-01", 150, 95)

  val conditions: Seq[C] = Seq(
    C("PX_PREG", 100L, "\"pregnancy\"", d("2023-02-15")),
    C("PX_CONTROL", 400L, "\"essential hypertension\"", d("2023-01-20")),
    C("PX_DX_ONLY", 400L, "\"essential hypertension\"", d("2023-03-25")),
    // dx outside measurement year → does not count
    C("PX_ONE_DAY", 400L, "\"essential hypertension\"", d("2022-03-25")))

  val observations: Seq[O] = Seq(
    O("PX_ESRD", 201L, d("2023-04-01")),
    // hospice observation in the wrong year → not excluded for it
    O("PX_HOSPICE", 302L, d("2021-01-01")))

  val procedures: Seq[PR] = Seq(
    PR("PX_HOSPICE", 303L, d("2023-06-15")))

  val drugs: Seq[D] = Seq(
    D("PX_RX_ONLY", 500L, d("2023-02-10")),
    // rx outside year
    D("PX_ONE_DAY", 500L, d("2022-02-10")))

  def tables(spark: SparkSession): OmopTables = {
    import spark.implicits._
    OmopTables(
      person = persons.toDF(),
      conditionOccurrence = conditions.toDF(),
      measurement = measurements.toDF(),
      observation = observations.toDF(),
      procedureOccurrence = procedures.toDF(),
      drugExposure = drugs.toDF())
  }
}
