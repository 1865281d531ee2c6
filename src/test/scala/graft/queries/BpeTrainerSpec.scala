package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** t35's BPE trainer against a DRIVER-SIDE reference implementation —
  * plain Scala greedy-left merges over symbol vectors, no string-invariant
  * tricks — so the engine's replace-on-the-double-space-representation is
  * proven to BE greedy BPE, not merely self-consistent with its oracle.
  * Runs twice: on the sf0.001 corpus, and on an adversarial synthetic
  * corpus built to stress overlapping merge sites (runs of a repeated
  * symbol, merge-chaining across neighbors, merged symbols recurring as
  * pair members in later rounds). */
class BpeTrainerSpec extends SparkSpec {

  private val K = 10

  /** Reference trainer: greedy left-to-right, merged pair finalized and
    * scan resumed after it; ties broken by (count DESC, pair-string ASC)
    * with the pair string separated by the same double space the engine
    * orders on. */
  private def reference(words: Seq[(String, Long)], k: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words
      .map { case (w, n) => w.map(_.toString).toVector -> n }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    for (r <- 1 to k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, n) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.nonEmpty) {
        val ((pa, pb), cnt) = counts.minBy { case ((a, b), c) =>
          (-c, a + "  " + b)
        }
        out += ((r, pa, pb, pa + pb, cnt))
        vocab = vocab.toSeq.map { case (syms, n) =>
          val acc = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == pa && syms(i + 1) == pb) {
              acc += pa + pb; i += 2
            } else { acc += syms(i); i += 1 }
          }
          acc.result() -> n
        }.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      }
    }
    out.result()
  }

  private def wordsOf(s: SparkSession, dir: String): Seq[(String, Long)] =
    graft.io.Tables.load(s, dir, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }.toSeq

  private def run(dir: String): Seq[(Int, String, String, String, Long)] =
    TextQueries.queries("t35_bpe_trainer")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("t35 equals the driver-side reference trainer on the sf corpus") {
    val dir = "/root/testdata/sf0.001"
    assert(run(dir) === reference(wordsOf(spark, dir), K))
  }

  test("t36 encoder equals the reference trainer's final segmentation") {
    val dir = "/root/testdata/sf0.001"
    // reference: train K merges, then count each word's final symbols
    val words = wordsOf(spark, dir)
    var segs: Map[String, Vector[String]] =
      words.map { case (w, _) => w -> w.map(_.toString).toVector }.toMap
    reference(words, K).foreach { case (_, pa, pb, merged, _) =>
      def apply1(syms: Vector[String]): Vector[String] = {
        val acc = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == pa && syms(i + 1) == pb) {
            acc += merged; i += 2
          } else { acc += syms(i); i += 1 }
        }
        acc.result()
      }
      segs = segs.map { case (w, s) => w -> apply1(s) }
    }
    val expected = graft.io.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getLong(0), toks.length.toLong,
          toks.map(w => segs(w).length.toLong).sum)
      }.sortBy(_._1).toSeq
    val got = TextQueries.queries("t36_bpe_encode")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // fertility sanity: subwords per word in [1, word length]
    got.foreach { case (id, nw, nb) =>
      assert(nb >= nw, s"doc $id: fewer subwords than words")
    }
  }

  test("t35 greedy-left semantics survive overlapping merge sites") {
    import sqlImplicits._
    // runs of one char (aaaa → [aa][aa], aaa → [aa]a), chain-adjacent
    // sites (ababab), and later rounds re-using a merged symbol as a pair
    // member — the cases where a naive replace diverges from greedy BPE
    val texts = Seq(
      "aaaa aaa aaaa aaa aaaa",
      "ababab abab ababab abab",
      "aab aaab aab baa baa",
      "abcabc bcabca cababc",
      "aaaa ababab aab abcabc aaa")
    val dir = java.nio.file.Files.createTempDirectory("bpe_spec").toString
    texts.zipWithIndex
      .map { case (t, i) =>
        (i.toLong, t, "en", "synth", t.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = run(dir)
    assert(got.nonEmpty)
    assert(got === reference(wordsOf(spark, dir), K))
  }
}
