package graft.htn

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed row models for the pipeline's public stage outputs (SURVEY §1.1:
  * `DataFrame` for internal stages where schema is dynamic, `Dataset[T]`
  * with case classes at the API boundary where type safety helps callers).
  * Encoders are Spark-generated products — no reflection at runtime per
  * row, full Tungsten columnar layout underneath.
  */
object model {

  /** One row of the deduplicated cohort (`all_pop3c` grain). */
  final case class CohortRow(
      PATIENT_LINKAGE: String, YEAR_OF_BIRTH: Int,
      RACE: String, SEX: String, ZIP3: String, STATE: String,
      GENDER_CONCEPT_ID: Long)

  /** One patient-day of paired, averaged blood pressure. */
  final case class BpDay(
      PATIENT_LINKAGE: String, MEASUREMENT_DATE: java.sql.Date,
      SBP_avg: Double, DBP_avg: Double)

  /** One row of the final analytical table. Nullable year-scoped flags are
    * Options (patients with no measurement-year readings). */
  final case class PatientPhenotype(
      PATIENT_LINKAGE: String, age: Int, sex: String, race: String,
      state: String, zip3: String,
      HTN140_90: Option[Int], HTN130_80: Option[Int],
      HTNcontrol140: Option[Int], HTNcontrol130: Option[Int],
      DX: Int, MEDS: Int, hypertension_140: Int, hypertension_130: Int)

  implicit val cohortEnc: Encoder[CohortRow] = Encoders.product[CohortRow]
  implicit val bpDayEnc: Encoder[BpDay] = Encoders.product[BpDay]
  implicit val phenotypeEnc: Encoder[PatientPhenotype] = Encoders.product[PatientPhenotype]

  /** Typed view of the analytical table. */
  def phenotypes(analytical: DataFrame): Dataset[PatientPhenotype] =
    analytical.as[PatientPhenotype]

  /** Typed view of the cohort. */
  def cohort(df: DataFrame): Dataset[CohortRow] = df.as[CohortRow]
}
