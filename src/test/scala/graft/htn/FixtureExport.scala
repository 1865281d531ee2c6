package graft.htn

import graft.GraftSession

/** Test utility: materialize the OMOP scenario fixtures as CSV files +
  * codelist CSVs so the HtnMain CLI can be driven end-to-end.
  * Usage: Test/runMain graft.htn.FixtureExport <dir> */
object FixtureExport {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(4)
    val t = OmopFixtures.tables(spark)
    def exp(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(s"$dir/omop/$name.csv")
    exp(t.person, "person")
    exp(t.conditionOccurrence, "condition_occurrence")
    exp(t.measurement, "measurement")
    exp(t.observation, "observation")
    exp(t.procedureOccurrence, "procedure_occurrence")
    exp(t.drugExposure, "drug_exposure")

    val c = OmopFixtures.codes
    val lists = Map(
      "preg_condition" -> c.pregCondition, "preg_measurement" -> c.pregMeasurement,
      "preg_observation" -> c.pregObservation, "preg_procedure" -> c.pregProcedure,
      "esrd_condition" -> c.esrdCondition, "esrd_observation" -> c.esrdObservation,
      "esrd_procedure" -> c.esrdProcedure,
      "palliative_observation" -> c.palliativeObservation,
      "palliative_procedure" -> c.palliativeProcedure,
      "hospice_observation" -> c.hospiceObservation,
      "hospice_procedure" -> c.hospiceProcedure,
      "htn_dx" -> c.htnDx, "htn_rx" -> c.htnRx)
    import spark.implicits._
    lists.foreach { case (name, ids) =>
      ids.toDF("concept_id").coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(s"$dir/codelists/$name.csv")
    }
    spark.stop()
  }
}
