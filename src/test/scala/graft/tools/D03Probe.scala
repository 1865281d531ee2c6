package graft.tools
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.functions.TextFunctions._
object D03Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val k = 128; val bands = 8; val r = k / bands
    val sigs = docs.repartition(32, col("doc_id"))
      .select(col("doc_id").as("id"),
        minhashSignature(wordShingles(tokens(col("text")), 3), k).as("sig"))
      .filter(size(col("sig")) === k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sigs")(println("sig count: " + sigs.count()))
    val banded = sigs
      .select(col("id"), col("sig"), explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), col("band"),
        xxhash64(slice(col("sig"), col("band") * r + 1, lit(r)), col("band")).as("bh"))
    val buckets = banded.groupBy("band", "bh")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, 1000))
    time("buckets")(buckets.select(sum(size(col("ids"))), max(size(col("ids"))), count(lit(1))).show())
    val pairs = buckets.select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1), y ->
          |    named_struct('id_a', x, 'id_b', y))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b")).distinct()
    time("pairs")(println("pair count: " + pairs.count()))
    spark.stop()
  }
}
