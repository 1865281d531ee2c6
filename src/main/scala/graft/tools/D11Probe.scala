package graft.tools

import org.apache.spark.sql.functions._

/** Probe: wall-clock of the edit-distance-2 neighborhood linkage (d11)
  * after the hash-kernel key generation — first run (codegen + shuffle
  * warm) and steady-state repeat, plus the drop counters that certify
  * exactness (must be zero on the driver corpus). */
object D11Probe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"### $label: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $a")
      a
    }

    val cust = graft.io.Tables.load(spark, sf, "customer")
    cust.count() // parquet footer + codegen warm-up

    t("editPairsK(2) first run")(graft.operators.Dedup.editPairsK(
      cust, "c_custkey", "c_nationkey", "c_name", k = 2).count())
    t("editPairsK(2) steady-state")(graft.operators.Dedup.editPairsK(
      cust, "c_custkey", "c_nationkey", "c_name", k = 2).count())
    spark.stop()
  }
}
