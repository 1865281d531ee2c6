package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import sqlImplicits._

  test("salted join returns exactly the plain join's rows") {
    // one mega-key (90% of rows) + a tail
    val large = ((1 to 900).map(i => (1L, i.toLong)) ++
        (1 to 100).map(i => (i.toLong % 7 + 2, 1000L + i)))
      .toDF("k", "row_id")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (9L, "unmatched"))
      .toDF("k", "v")

    val plain = large.join(small, Seq("k")).select("k", "row_id", "v")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInnerJoin(large, small, "k", col("row_id"), 8)
      .select("k", "row_id", "v").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.size === 900 + (1 to 100).count(i => i % 7 + 2 <= 3))
  }

  test("salting actually spreads the hot key across sub-partitions") {
    val large = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "row_id")
    val saltCounts = large
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(saltCounts.length === 8)       // all 8 salts used
    assert(saltCounts.max < 1000 * 0.3)   // no salt holds the whole key
  }

  test("salt is deterministic across evaluations (retry-safe)") {
    val df = (1 to 50).map(i => (1L, i.toLong)).toDF("k", "row_id")
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)))
    assert(df.collect().toSet === df.collect().toSet)
    val twice = df.union(df).distinct()
    assert(twice.count() === 50) // same salt both times → exact dedup
  }

  test("hotKeys finds the mega-key") {
    val large = ((1 to 900).map(_ => (1L, 0L)) ++ Seq((2L, 0L))).toDF("k", "x")
    val hot = SkewJoin.hotKeys(large, "k", 100).collect()
    assert(hot.map(_.getLong(0)).toSeq === Seq(1L))
  }
}
