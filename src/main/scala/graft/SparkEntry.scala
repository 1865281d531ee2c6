package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, HtnQueries, MediaQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's externally-checkable operator surface: one
  * entry per operator family from SURVEY.md §2 (plus the LLM-data-pipeline
  * extensions), each with a DuckDB-equivalent oracle in `oracleSql`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q03_join_revenue")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ TextQueries.queries ++ VectorQueries.queries ++
      MediaQueries.queries ++ HtnQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ TextQueries.oracle ++ VectorQueries.oracle ++
      MediaQueries.oracle ++ HtnQueries.oracle
}
