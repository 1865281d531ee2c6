package graft.queries

import graft.SparkSpec

/** q83's composed-pipeline fixture: the deterministic OMOP derivation from
  * `customer`/`orders` must plant each pathology it claims, and the
  * analytical output must obey the e-phenotype invariants the DuckDB
  * oracle certifies value-by-value. */
class HtnQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  lazy val omop = HtnQueries.omop(spark, dir)
  lazy val analytical =
    HtnQueries.queries("q83_htn_phenotype")(spark, dir).collect()

  test("fixture plants mis-bridged, dup-location, null-location patients") {
    import org.apache.spark.sql.functions._
    val perRows = omop.person.groupBy("PATIENT_LINKAGE")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("YEAR_OF_BIRTH")).as("yobs")).collect()
    assert(perRows.exists(r => r.getLong(2) > 1), "mis-bridged patients exist")
    assert(perRows.exists(r => r.getLong(1) > 1 && r.getLong(2) === 1),
      "duplicate-location (same-YOB) patients exist")
    assert(omop.person.filter(col("LOCATION_ZIP").isNull).count() > 0)
    // mis-bridged patients are absent from the analytical output
    val bridged = perRows.filter(_.getLong(2) > 1).map(_.getString(0)).toSet
    assert(analytical.forall(r => !bridged.contains(r.getString(0))))
  }

  test("analytical invariants: one row per patient, phenotype OR, null policy") {
    assert(analytical.nonEmpty)
    val keys = analytical.map(_.getString(0))
    assert(keys.distinct.length === keys.length, "one row per patient")
    analytical.foreach { r =>
      def i(name: String): Int = Option(r.getAs[Any](name))
        .map(_.asInstanceOf[Int]).getOrElse(0)
      assert(r.getAs[Int]("hypertension_140") ===
        (if (i("DX") == 1 || i("MEDS") == 1 || i("HTN140_90") == 1) 1 else 0))
      assert(r.getAs[Int]("hypertension_130") ===
        (if (i("DX") == 1 || i("MEDS") == 1 || i("HTN130_80") == 1) 1 else 0))
      // DX/MEDS are never NULL (coalesced); 130 flag is ≥ the 140 flag
      assert(r.getAs[Any]("DX") != null && r.getAs[Any]("MEDS") != null)
      assert(i("HTN130_80") >= i("HTN140_90"))
      assert(r.getAs[Int]("age") >= 18, "denominator is adults only")
    }
  }

  test("repeat invocation swaps the previous generation's stage persists") {
    analytical // force first run
    val before = spark.sparkContext.getRDDStorageInfo.length
    HtnQueries.queries("q83_htn_phenotype")(spark, dir).count()
    val after = spark.sparkContext.getRDDStorageInfo.length
    // the swap releases the previous run's persists: the census must not
    // grow by another full stage set (6 persists) per invocation
    assert(after <= before + 1, s"stage persists accumulate: $before -> $after")
    HtnQueries.releaseHeld(spark)
  }
}
