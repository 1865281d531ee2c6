package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SplitsSpec extends SparkSpec {
  import sqlImplicits._

  test("assign: stable per key, layout-independent, fractions near weights") {
    val df = spark.range(10000).toDF("id")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = df.select($"id", Splits.assign($"id", w).as("split"))
    val counts = a.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") / 10000.0 - 0.8) < 0.02, counts)
    assert(math.abs(counts("val") / 10000.0 - 0.1) < 0.02, counts)
    // layout independence: a different partitioning gives identical assignment
    val b = df.repartition(17).select($"id", Splits.assign($"id", w).as("split"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("assign survives full-range 64-bit keys (no ANSI overflow)") {
    val big = Seq(Long.MaxValue, Long.MaxValue - 1, 4000000000L, 1234567890123L)
      .toDF("id")
    val out = big
      .select(Splits.assign($"id", Seq("a" -> 0.5, "b" -> 0.5)).as("s"))
      .collect()
    assert(out.forall(r => Set("a", "b").contains(r.getString(0))))
  }

  test("assign on a group key keeps groups intact (leakage control)") {
    val docs = spark.range(1000)
      .select($"id", (($"id" % 50)).as("source_id"))
    val split = docs.select($"source_id",
      Splits.assign($"source_id", Seq("train" -> 0.9, "test" -> 0.1)).as("split"))
    // every source maps to exactly one split
    val perSource = split.groupBy("source_id")
      .agg(countDistinct("split").as("n")).collect()
    assert(perSource.forall(_.getLong(1) === 1L))
  }

  test("sampleByGroup: deterministic, rate-accurate, nested across rates") {
    val df = spark.range(10000)
      .select($"id", (($"id" % 3).cast("string")).as("g"))
    val half = Splits.sampleByGroup(df, $"id", $"g", Map("0" -> 0.5))
    val counts = half.groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("0") / 3334.0 - 0.5) < 0.05, counts)
    assert(counts("1") > 3300 && counts("2") > 3300) // default rate 1.0
    // determinism: rerun keeps the identical rows
    val again = Splits.sampleByGroup(df, $"id", $"g", Map("0" -> 0.5))
    assert(half.except(again).isEmpty && again.except(half).isEmpty)
    // nesting: the 0.25 sample is a subset of the 0.5 sample
    val quarter = Splits.sampleByGroup(df, $"id", $"g", Map("0" -> 0.25))
    assert(quarter.except(half).isEmpty)
    assert(quarter.count() < half.count())
  }

  test("contamination: inverted-index gram overlap, zero rows included") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),          // train
      (1L, "epsilon zeta eta theta"),          // train
      (2L, "alpha beta gamma something else"), // test: shares "alpha beta gamma"
      (3L, "totally unrelated words here now") // test: zero contamination
    ).toDF("doc_id", "text")
    val split = when($"doc_id" < 2, "train").otherwise("test")
    val res = Splits.contamination(docs, "doc_id", "text", split,
        sourceSplit = "train", targetSplit = "test", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 2: grams {a b g, b g s, g s e} -> 1 of 3 contaminated
    assert(res(2L) === ((3L, 1L, 0.3333)))
    // doc 3 appears with zero contamination (not dropped)
    assert(res(3L)._2 === 0L)
    assert(res.size === 2)
  }

  test("packByBudget: greedy sequential bins, bounded overflow, per-part windows") {
    val rows = Seq(
      // part a: sizes 900, 900, 900, 900 with budget 2000 ->
      // cum_before 0, 900, 1800, 2700 -> bins 0, 0, 0, 1
      ("a", 1L, 900L), ("a", 2L, 900L), ("a", 3L, 900L), ("a", 4L, 900L),
      // part b independent: starts again at bin 0
      ("b", 1L, 2500L), ("b", 2L, 100L)
    ).toDF("part", "ord", "sz")
    val packed = Splits.packByBudget(rows, $"part", $"ord", $"sz", budget = 2000L)
      .select("part", "ord", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(packed(("a", 1L)) === 0L && packed(("a", 2L)) === 0L)
    assert(packed(("a", 3L)) === 0L, "crossing row starts in its prefix bin")
    assert(packed(("a", 4L)) === 1L)
    assert(packed(("b", 1L)) === 0L, "each part packs from bin 0")
    assert(packed(("b", 2L)) === 1L, "oversized first row fills bin 0 alone")
  }

  test("sampleByWeight: rate tracks the weight, nested, clamped, deterministic") {
    val df = spark.range(20000).toDF("id")
    // weight 1/2: expect ~50% kept; the kept set of weight 1/4 must be a
    // subset of weight 1/2's (same hash, lower cut — nested samples)
    val half = Splits.sampleByWeight(df, $"id", lit(500L), 1000L)
    val quarter = Splits.sampleByWeight(df, $"id", lit(250L), 1000L)
    val nHalf = half.count()
    assert(math.abs(nHalf / 20000.0 - 0.5) < 0.02, s"kept $nHalf of 20000")
    assert(quarter.except(half).isEmpty, "lower weight keeps a subset")
    // weights >= den clamp to keep-always; negative weights drop the row
    assert(Splits.sampleByWeight(df, $"id", lit(5000L), 1000L).count() === 20000L)
    assert(Splits.sampleByWeight(df, $"id", lit(-3L), 1000L).count() === 0L)
    // layout independence
    val again = Splits.sampleByWeight(df.repartition(13), $"id", lit(500L), 1000L)
    assert(again.except(half).isEmpty && half.except(again).isEmpty)
    // per-row weights: a row's own column drives its keep probability
    val weighted = Splits.sampleByWeight(
      df.withColumn("wn", when($"id" < 10000, 0L).otherwise(1000L)),
      $"id", $"wn", 1000L)
    assert(weighted.filter($"id" < 10000).count() === 0L)
    assert(weighted.filter($"id" >= 10000).count() === 10000L)
    // NULL weight = missing quality signal = DROP, never keep-always
    // (Spark's least() skips nulls, which would otherwise keep them all)
    val withNulls = Splits.sampleByWeight(
      df.withColumn("wn", when($"id" < 10000, lit(null).cast("long"))
        .otherwise(1000L)),
      $"id", $"wn", 1000L)
    assert(withNulls.filter($"id" < 10000).count() === 0L,
      "null weights must drop the row")
    assert(withNulls.filter($"id" >= 10000).count() === 10000L)
  }

  test("bloomContamination: no false negatives, measured FP ~0, agrees with exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val split = Splits.assign(col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val out = Splits.bloomContamination(docs, "doc_id", "text", split,
      benchSplit = "test", corpusSplit = "train", n = 3)
      .select("id", "n_grams", "n_true_hits", "n_bloom_hits").collect()
    assert(out.nonEmpty)
    // Bloom's one guarantee: every true hit is flagged.
    out.foreach(r => assert(r.getLong(3) >= r.getLong(2),
      s"false negative on doc ${r.getLong(0)}"))
    // Measured per-gram FP rate at the configured geometry: ~0. The bound
    // here is loose (1%) so the test pins the ORDER of magnitude without
    // becoming a coin flip if the corpus grows.
    val fp = out.map(r => r.getLong(3) - r.getLong(2)).sum.toDouble
    val clean = out.map(r => r.getLong(1) - r.getLong(2)).sum.toDouble
    assert(clean > 0)
    assert(fp / clean <= 0.01, s"per-gram FP rate ${fp / clean} above 1%")
    // The exact leg must agree with the standalone exact operator run in
    // the same direction (bench indexes, corpus probes).
    val exact = Splits.contamination(docs, "doc_id", "text", split,
      sourceSplit = "test", targetSplit = "train", n = 3)
      .select("id", "n_contaminated").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(exact(r.getLong(0)) === r.getLong(2),
      s"exact-leg divergence on doc ${r.getLong(0)}"))
  }

  test("bloomContamination: empty bench split probes all-false, not null") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // a split label no row carries → zero bench grams → NULL aggregate
    val out = Splits.bloomContamination(docs, "doc_id", "text",
      lit("train"), benchSplit = "nonexistent", corpusSplit = "train", n = 3)
      .select("n_true_hits", "n_bloom_hits").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) === 0L)
      assert(r.getLong(1) === 0L, "empty bloom must answer false, not null")
    }
  }
}
