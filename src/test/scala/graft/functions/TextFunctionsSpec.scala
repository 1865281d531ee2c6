package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val df = Seq(
    (1L, "the quick brown fox"),
    (2L, "quick the brown fox"), // same tokens, different order
    (3L, "the quick brown fox"),
    (4L, "completely different words here")
  ).toDF("id", "text")

  test("wordShingles produces n-grams; short docs yield empty") {
    val sh = df.select(wordShingles(tokens($"text"), 3).as("s"))
      .filter($"s".getItem(0) === "the quick brown").count()
    assert(sh === 2)
    val short = Seq((1L, "two words")).toDF("id", "text")
      .select(wordShingles(tokens($"text"), 3).as("s"))
      .select(size($"s")).head().getInt(0)
    assert(short === 0)
  }

  test("fingerprint: deterministic, order-sensitive, content-sensitive") {
    val fps = df.select($"id", fingerprint(tokens($"text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(3L)) // identical text → identical fingerprint
    assert(fps(1L) !== fps(2L)) // reordered tokens → different (rolling hash)
    assert(fps(1L) !== fps(4L))
    assert(fps.values.forall(v => v >= 0 && v < 1000000007L)) // stays in field
  }

  test("stopword and distinct ratios") {
    val r = Seq((1L, "the the the fox")).toDF("id", "text")
      .select(stopwordRatio(tokens($"text"), Seq("the")).as("sr"),
              distinctRatio(tokens($"text")).as("dr"))
      .head()
    assert(r.getDouble(0) === 0.75)
    assert(r.getDouble(1) === 0.5)
  }

  test("JVM simhash is bit-identical to the expression formulation") {
    val exprSh = df.select($"id", tokens($"text").as("toks"))
      .select($"id", simhashExpr("toks").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    df.collect().foreach { r =>
      assert(simhash64Jvm(r.getString(1)) === Some(exprSh(r.getLong(0))))
    }
    assert(simhash64Jvm("   ") === None)
  }

  test("simhash of identical token arrays is identical; hamming64 is 0") {
    val sh = df.select($"id", tokens($"text").as("toks"))
      .select($"id", simhashExpr("toks").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(3L))
    val hd = Seq((sh(1L), sh(4L))).toDF("a", "b")
      .select(hamming64($"a", $"b")).head().getInt(0)
    assert(hd > 10) // unrelated content is far in hamming space
  }
}
