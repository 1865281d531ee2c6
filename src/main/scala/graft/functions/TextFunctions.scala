package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface.
  *
  * Everything here is a composition of built-in Catalyst expressions
  * (codegen-friendly, no UDFs — SURVEY.md §2.10 policy). Higher-order
  * array functions run on Tungsten rows without serialization, and all
  * of it is embarrassingly parallel per-row: no shuffle, scales linearly
  * with input splits.
  */
object TextFunctions {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct token set (for Jaccard-style set similarity). Same
    * tokenization as [[tokens]] — the two MUST agree or set-based and
    * sequence-based similarity see different token streams for the same
    * document (and repeated whitespace would inject empty-string tokens
    * shared across unrelated documents, inflating Jaccard). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** n-word shingles: ["a b c", "b c d", ...]. Empty if fewer than n tokens. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array())

  /** Ratio of tokens that are members of `stop` (language-ID / quality signal). */
  def stopwordRatio(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stop))).cast("double") / size(toks)

  /** Type-token ratio: distinct tokens / tokens. */
  def distinctRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks)

  /** Deterministic 64-bit-ish document fingerprint: polynomial rolling hash
    * of the token stream in a prime field (kept < 2^31 so ANSI-mode long
    * arithmetic can never overflow). Order-sensitive — reordered tokens
    * change the fingerprint, unlike the set-based signatures below. */
  def fingerprint(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * 31 + pmod(xxhash64(t), lit(1000000007L)), lit(1000000007L)))

  /** MinHash signature: k independent hash functions (xxhash64 salted by
    * position), min over the shingle set per function. Similar shingle sets
    * → equal signature positions with probability = Jaccard similarity. */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(shingles, sh => xxhash64(sh, seed))))

  /** Estimated Jaccard from two equal-length MinHash signatures. */
  def minhashEstimate(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x)).cast("double") /
      size(sigA)

  /** JVM twin of [[minhashSignature]] over [[wordShingles]] — same
    * tokenization, same hash chain as the expression form
    * (`xxhash64(shingle, seedIdx)` = XxHash64 of the shingle string at
    * seed 42, then of the int seed index chained on that), bit-identical
    * output; used by the mapPartitions hot path in Dedup.minhashLshPairs
    * and asserted equal to the expression form in DedupSpec. Hashing the
    * shingle once and chaining k cheap int-hashes is also why the kernel
    * beats re-hashing the string k times. Returns None if the text has
    * fewer than `shingleWidth` tokens. */
  def minhashSignatureJvm(text: String, k: Int, shingleWidth: Int): Option[Array[Long]] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{IntegerType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val toks = text.trim.split("\\s+")
    val nSh = toks.length - shingleWidth + 1
    if (nSh <= 0) None
    else {
      val sig = Array.fill(k)(Long.MaxValue)
      val sb = new StringBuilder
      var i = 0
      while (i < nSh) {
        sb.setLength(0)
        var w = 0
        while (w < shingleWidth) {
          if (w > 0) sb.append(' ')
          sb.append(toks(i + w)); w += 1
        }
        val base = XxHash64Function.hash(
          UTF8String.fromString(sb.toString), StringType, 42L)
        var f = 0
        while (f < k) {
          val h = XxHash64Function.hash(f, IntegerType, base)
          if (h < sig(f)) sig(f) = h
          f += 1
        }
        i += 1
      }
      Some(sig)
    }
  }

  /** 64-bit SimHash of a token-array column (referenced by name): per bit
    * position, each token votes +1/-1 with its hash's bit; the sign of the
    * vote total becomes that bit of the result. Near-identical texts land
    * within a small Hamming distance. Built as a SQL expression because
    * shiftright/shiftleft need a column-valued shift amount, which the Scala
    * DSL doesn't expose. Single pass over tokens, 64-wide vote vector. */
  def simhashExpr(toksCol: String): Column = expr(
    s"""aggregate(
       |  sequence(0, 63),
       |  named_struct('votes',
       |    aggregate($toksCol, array_repeat(0L, 64),
       |      (acc, t) -> zip_with(acc,
       |        transform(sequence(0, 63),
       |          i -> IF((shiftright(xxhash64(t), i) & 1) = 1, 1L, -1L)),
       |        (a, b) -> a + b)),
       |    'h', 0L),
       |  (st, i) -> named_struct('votes', st.votes,
       |    'h', IF(st.votes[i] > 0, st.h | shiftleft(1L, i), st.h)),
       |  st -> st.h)""".stripMargin)

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** JVM twin of [[simhashExpr]] — same tokenization, same hash function
    * (Spark's xxhash64, seed 42), bit-identical output; used by the
    * mapPartitions hot path in Dedup.simhashPairs and asserted equal to
    * the expression form in TextFunctionsSpec. Returns None for token-less
    * text. */
  def simhash64Jvm(text: String): Option[Long] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) None
    else {
      val votes = new Array[Long](64)
      toks.foreach { t =>
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType, 42L)
        var i = 0
        while (i < 64) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L)
          i += 1
        }
      }
      var sh = 0L
      var i = 0
      while (i < 64) { if (votes(i) > 0) sh |= (1L << i); i += 1 }
      Some(sh)
    }
  }
}
