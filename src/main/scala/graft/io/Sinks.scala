package graft.io

import org.apache.spark.sql.DataFrame

/** Output sinks (SURVEY §2.1 S3): parquet for stage checkpoints (schema-
  * preserving — the engine's default), CSV for export parity with the
  * reference's `export(df, ...csv)` workflow (types are lossy in CSV; the
  * header carries names only, which is exactly why checkpoints are NOT
  * csv — see SURVEY §1.2 on the reference's type-loss-per-stage problem).
  */
object Sinks {

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Reference-parity CSV export: header row, one directory of part files
    * (coalesce only if a single file is required — at scale, don't). */
  def csv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }
}
