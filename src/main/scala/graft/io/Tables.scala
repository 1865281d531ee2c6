package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import graft.schema.Schemas

/** Typed readers for the driver testdata directory (TESTDATA.md).
  *
  * Every read carries an explicit schema so filter/column pushdown hits the
  * parquet scan with the types we expect, and so the SQL entry point (temp
  * views) agrees with the DataFrame path. At cluster scale the same readers
  * take a directory of many files; nothing here assumes a single file.
  */
object Tables {

  /** Read one testdata table with its canonical schema. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS): read as nanos-long, then
      // truncate to a microsecond TimestampType (Spark's native precision).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.schema(Schemas.events).parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.schema(Schemas.testdata(name)).parquet(s"$dir/$name.parquet")
    }
  }

  /** Register all testdata tables as temp views (EP1 SQL entry point). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Schemas.testdata.keys.foreach { n =>
      load(spark, dir, n).createOrReplaceTempView(n)
    }
}
