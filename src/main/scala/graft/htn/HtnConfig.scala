package graft.htn

/** Pipeline configuration (SURVEY.md §1.1: no string-spliced SQL — all
  * period arithmetic happens here, typed).
  *
  * Reference defaults: measurement year 2023, BP lookback one extra year
  * (`2_data_importing_cleaning.R:54-57`, `3_blood_pressure.R:77-79`).
  */
final case class HtnConfig(
    measurementYear: Int = 2023,
    bpLookbackYears: Int = 1,
    sbpPlausibleMin: Double = 30, sbpPlausibleMax: Double = 300,
    dbpPlausibleMin: Double = 20, dbpPlausibleMax: Double = 150,
    sbpHigh: Double = 140, dbpHigh: Double = 90,
    sbpHigh2: Double = 130, dbpHigh2: Double = 80,
    minHighBpDays: Int = 2) {

  /** Adults 18+ in the measurement year: YOB <= year-18
    * (`2_data_importing_cleaning.R:186-187`). */
  def adultMaxYob: Int = measurementYear - 18

  /** Women of reproductive age 18-44: YOB in [year-44, year-18]
    * (`2_data_importing_cleaning.R:195-198`). */
  def wraMinYob: Int = measurementYear - 44
  def wraMaxYob: Int = measurementYear - 18

  /** BP measurement window: measurement year + lookback
    * (`3_blood_pressure.R:79`; date column per intended semantics of bug B3). */
  def bpYears: Seq[Int] = (measurementYear - bpLookbackYears) to measurementYear

  /** Exclusions / Dx / Rx use the measurement year only
    * (`2_data_importing_cleaning.R:301` etc., `4_hypertension_phenotype_main.R:76,105`). */
  def phenotypeYears: Seq[Int] = Seq(measurementYear)
}

/** OMOP concept-id code lists (loaded from CSV fixtures or passed directly;
  * the reference loads xlsx — `2_data_importing_cleaning.R:208-268`,
  * `4_hypertension_phenotype_main.R:50-54`). */
final case class Codelists(
    pregCondition: Seq[Long], pregMeasurement: Seq[Long],
    pregObservation: Seq[Long], pregProcedure: Seq[Long],
    esrdCondition: Seq[Long], esrdObservation: Seq[Long], esrdProcedure: Seq[Long],
    palliativeObservation: Seq[Long], palliativeProcedure: Seq[Long],
    hospiceObservation: Seq[Long], hospiceProcedure: Seq[Long],
    htnDx: Seq[Long], htnRx: Seq[Long])

object Codelists {
  /** SBP/DBP measurement concepts + mmHg unit (`3_blood_pressure.R:98,102,121,125`). */
  val sbpConcepts: Seq[Long] = Seq(4152194L, 3004249L, 4232915L, 3018586L)
  val dbpConcepts: Seq[Long] = Seq(4154790L, 3012888L, 4248524L, 3034703L)
  val mmHgUnit: Long = 8876L
  /** Female gender concept (`2_data_importing_cleaning.R:295`). */
  val femaleConcept: Long = 8532L
}
