package graft.tools

import org.apache.spark.sql.functions._

object HllProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val o = graft.io.Tables.load(spark, s"/root/testdata/$sf", "orders")
      val perYear = o.groupBy(col("o_orderstatus").as("st"), year(col("o_orderdate")).as("yr"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      val merged = perYear.groupBy("st")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_m"))
      val direct = o.groupBy(col("o_orderstatus").as("st"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est_d"),
          countDistinct(col("o_custkey")).as("exact"))
      val j = direct.join(merged, "st").orderBy("st").collect()
      j.foreach { r =>
        println(s"$sf ${r.getString(0)} exact=${r.getLong(2)} direct=${r.getLong(1)} merged=${r.getLong(3)} eq=${r.getLong(1)==r.getLong(3)} errd=${math.abs(r.getLong(1)-r.getLong(2)).toDouble/r.getLong(2)}")
      }
    }
    spark.stop()
  }
}
