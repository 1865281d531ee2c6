package graft.htn

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.Schemas

/** The six OMOP CDM inputs the pipeline consumes (SURVEY.md §1.3). */
final case class OmopTables(
    person: DataFrame,
    conditionOccurrence: DataFrame,
    measurement: DataFrame,
    observation: DataFrame,
    procedureOccurrence: DataFrame,
    drugExposure: DataFrame) {

  /** Register as temp views for the SQL entry point (EP1). */
  def registerViews(): Unit = {
    person.createOrReplaceTempView("person")
    conditionOccurrence.createOrReplaceTempView("condition_occurrence")
    measurement.createOrReplaceTempView("measurement")
    observation.createOrReplaceTempView("observation")
    procedureOccurrence.createOrReplaceTempView("procedure_occurrence")
    drugExposure.createOrReplaceTempView("drug_exposure")
  }
}

object OmopTables {
  /** Read all six tables from a directory of parquet files with enforced
    * schemas (production path: one directory per table, partitioned by
    * year(date) for partition pruning — SURVEY §4). */
  def parquet(spark: SparkSession, dir: String): OmopTables = {
    def rd(name: String) =
      spark.read.schema(Schemas.omop(name)).parquet(s"$dir/$name")
    OmopTables(rd("person"), rd("condition_occurrence"), rd("measurement"),
      rd("observation"), rd("procedure_occurrence"), rd("drug_exposure"))
  }

  /** Read from CSV checkpoints (export-parity path — SURVEY §2.1 S4). */
  def csv(spark: SparkSession, dir: String): OmopTables = {
    def rd(name: String) =
      spark.read.option("header", "true").schema(Schemas.omop(name))
        .csv(s"$dir/$name.csv")
    OmopTables(rd("person"), rd("condition_occurrence"), rd("measurement"),
      rd("observation"), rd("procedure_occurrence"), rd("drug_exposure"))
  }
}
