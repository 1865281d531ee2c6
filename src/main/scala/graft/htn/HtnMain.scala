package graft.htn

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GraftSession
import graft.schema.Schemas

/** CLI entry point: run the full e-phenotype pipeline against an OMOP data
  * directory and emit the analytical table + QC metrics.
  *
  * Usage: HtnMain <omopDir> <codelistDir> <outDir> [csv|parquet] [year]
  *
  * - omopDir: person/, condition_occurrence/, ... (parquet subdirs) or
  *   person.csv, ... (csv files) — the reference's two source shapes
  *   (SURVEY §2.1 S1/S4).
  * - codelistDir: one CSV per codelist, header `concept_id`
  *   (xlsx in the reference — S5).
  * - outDir: analytical_htn parquet + stage checkpoints + metrics.json.
  */
object HtnMain {

  /** Load the 13 codelists from `dir`. Both of the reference's source
    * shapes are supported, per list:
    *  - `<name>.xlsx`: single-sheet workbook, codes in the first column
    *    (`import(...)[[1]]` — `2_data_importing_cleaning.R:208-268`);
    *  - `<name>.csv`: header `concept_id` (the test/driver shape).
    * The HTN dx/rx lists additionally accept the reference's combined
    * multi-sheet workbook `code_lists.xlsx` with `dx_code` / `rx_code`
    * columns flattened across sheets (`purrr::flatten(import_list(...))` —
    * `4_hypertension_phenotype_main.R:50-54`); it wins over per-name files
    * when present, matching the reference's main script. */
  def loadCodelists(spark: SparkSession, dir: String): Codelists = {
    def list(name: String): Seq[Long] = {
      val xlsx = new java.io.File(s"$dir/$name.xlsx")
      if (xlsx.isFile) graft.io.Xlsx.firstColumn(xlsx.getPath).map(graft.io.Xlsx.toCode)
      else spark.read.option("header", "true").schema(Schemas.codelist)
        .csv(s"$dir/$name.csv")
        .collect().map(_.getLong(0)).toSeq
    }
    val combined = {
      val f = new java.io.File(s"$dir/code_lists.xlsx")
      if (f.isFile) graft.io.Xlsx.flattenColumns(f.getPath) else Map.empty[String, Seq[String]]
    }
    def htnList(col: String, fallback: String): Seq[Long] =
      combined.get(col).map(_.map(graft.io.Xlsx.toCode)).getOrElse(list(fallback))
    Codelists(
      pregCondition = list("preg_condition"), pregMeasurement = list("preg_measurement"),
      pregObservation = list("preg_observation"), pregProcedure = list("preg_procedure"),
      esrdCondition = list("esrd_condition"), esrdObservation = list("esrd_observation"),
      esrdProcedure = list("esrd_procedure"),
      palliativeObservation = list("palliative_observation"),
      palliativeProcedure = list("palliative_procedure"),
      hospiceObservation = list("hospice_observation"),
      hospiceProcedure = list("hospice_procedure"),
      htnDx = htnList("dx_code", "htn_dx"), htnRx = htnList("rx_code", "htn_rx"))
  }

  def main(args: Array[String]): Unit = {
    val omopDir = args(0)
    val codelistDir = args(1)
    val outDir = args(2)
    val format = if (args.length > 3) args(3) else "parquet"
    val year = if (args.length > 4) args(4).toInt else 2023

    val spark = GraftSession.local()
    val tables =
      if (format == "csv") OmopTables.csv(spark, omopDir)
      else OmopTables.parquet(spark, omopDir)
    val codes = loadCodelists(spark, codelistDir)
    val cfg = HtnConfig(measurementYear = year)

    val result = HtnPipeline.run(spark, tables, codes, cfg, Some(outDir))

    // export-parity CSV of the final analytical table (the reference's
    // `export(analytical_htn, ...csv)` at 4_hypertension_phenotype_main.R:195)
    graft.io.Sinks.csv(result.analytical, s"$outDir/analytical_htn_csv")
    // dashboard extension: the prevalence cube as a queryable artifact
    graft.io.Sinks.parquet(Stats.prevalenceCube(result.analytical),
      s"$outDir/prevalence_cube")

    println("=== hypertension_140 ===")
    Stats.tabyl(result.analytical, "hypertension_140").show(20, truncate = false)
    println("=== hypertension_130 ===")
    Stats.tabyl(result.analytical, "hypertension_130").show(20, truncate = false)

    val m = result.metrics.getOrElse(
      sys.error("metrics skipped on a computeMetrics=true run"))
    val json =
      s"""{"cohort":${m.cohort},"wra":${m.wra},"after_pregnancy":${m.afterPregnancy},
         |"after_esrd":${m.afterEsrd},"after_care":${m.afterCare},
         |"pregnancy_pct_of_wra":${m.pregnancyPctOfWra},
         |"esrd_pct_of_cohort":${m.esrdPctOfCohort},
         |"care_pct_of_cohort":${m.carePctOfCohort}}""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/metrics.json"), json)
    println(json)
    spark.stop()
  }
}
