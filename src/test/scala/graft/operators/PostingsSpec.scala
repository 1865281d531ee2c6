package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Postings]] — the standing lexical index and its incremental fold.
  * Contracts: build stats are exact, foldDocs ≡ full rebuild under
  * appends AND replacements (t38's certified identity, here at the frame
  * level), empty delta is the identity, folds chain, and the folded
  * index owns its frames (both inputs releasable immediately).
  */
class PostingsSpec extends SparkSpec {

  import sqlImplicits._

  private def tfOf(i: Postings.Index): Seq[(Long, String, Long)] =
    i.tf.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
  private def dlOf(i: Postings.Index): Seq[(Long, Long)] =
    i.dl.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private def docsDF(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("build: stats and frames match a driver-side recompute") {
    val rows = Seq(
      (1L, "a b b c"), (2L, "b c  d"), (3L, ""), (4L, "a a a a"))
    val idx = Postings.build(docsDF(rows))
    try {
      // doc 3 is empty and doc 2 has a double space (empty token dropped)
      assert(idx.nDocs === 3L, "empty docs carry no postings")
      assert(idx.sumDl === 4L + 3L + 4L)
      assert(dlOf(idx) === Seq((1L, 4L), (2L, 3L), (4L, 4L)))
      assert(tfOf(idx) === Seq(
        (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 1L),
        (2L, "b", 1L), (2L, "c", 1L), (2L, "d", 1L),
        (4L, "a", 4L)))
    } finally idx.release()
  }

  test("foldDocs ≡ full rebuild under appends and replacements; folds chain") {
    val rng = new scala.util.Random(411L)
    val vocab = Vector("x", "y", "z", "w", "v", "u")
    def text() = Seq.fill(1 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size)))
      .mkString(" ")
    val standing0 = (0L until 40L).map(id => id -> text())
    // delta 1: 10 new docs + 5 REPLACEMENTS of standing ids
    val d1 = (40L until 50L).map(id => id -> text()) ++
      Seq(3L, 7L, 11L, 13L, 39L).map(id => id -> text())
    // delta 2: 5 new + a replacement of a doc REPLACED IN DELTA 1 + one
    // replaced twice within the corpus history
    val d2 = (50L until 55L).map(id => id -> text()) ++
      Seq(7L -> text(), 40L -> text())
    def applied(base: Seq[(Long, String)], delta: Seq[(Long, String)]) = {
      val m = scala.collection.mutable.LinkedHashMap(base: _*)
      delta.foreach { case (id, t) => m(id) = t }
      m.toSeq
    }
    val s0 = Postings.build(docsDF(standing0))
    val f1 = Postings.foldDocs(s0, docsDF(d1))
    s0.release() // the fold owns its frames
    val expect1 = Postings.build(docsDF(applied(standing0, d1)))
    try {
      assert((f1.nDocs, f1.sumDl) === (expect1.nDocs, expect1.sumDl))
      assert(tfOf(f1) === tfOf(expect1))
      assert(dlOf(f1) === dlOf(expect1))
    } finally expect1.release()
    val f2 = Postings.foldDocs(f1, docsDF(d2))
    f1.release()
    val expect2 = Postings.build(docsDF(applied(applied(standing0, d1), d2)))
    try {
      assert((f2.nDocs, f2.sumDl) === (expect2.nDocs, expect2.sumDl))
      assert(tfOf(f2) === tfOf(expect2))
      assert(dlOf(f2) === dlOf(expect2))
    } finally { f2.release(); expect2.release() }
  }

  test("edit-to-empty retracts: re-ingesting a doc with empty text deletes " +
       "its standing postings and stats") {
    val s = Postings.build(docsDF(Seq((1L, "a b"), (2L, "b c c"), (3L, "c"))))
    val f = Postings.foldDocs(s, docsDF(Seq((2L, ""), (4L, "d"))))
    s.release()
    val expect = Postings.build(docsDF(Seq((1L, "a b"), (3L, "c"), (4L, "d"))))
    try {
      assert((f.nDocs, f.sumDl) === (expect.nDocs, expect.sumDl))
      assert(tfOf(f) === tfOf(expect))
      assert(dlOf(f) === dlOf(expect))
    } finally { f.release(); expect.release() }
  }

  test("empty delta is the identity fold") {
    val rows = Seq((1L, "p q"), (2L, "q r r"))
    val s = Postings.build(docsDF(rows))
    val f = Postings.foldDocs(s, docsDF(Seq.empty[(Long, String)]))
    try {
      assert((f.nDocs, f.sumDl) === (s.nDocs, s.sumDl))
      assert(tfOf(f) === tfOf(s))
      assert(dlOf(f) === dlOf(s))
    } finally { f.release(); s.release() }
  }

  test("release hygiene: build + fold + release leave no persisted RDDs behind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val s = Postings.build(docsDF(Seq((1L, "m n"), (2L, "n o"))))
    val f = Postings.foldDocs(s, docsDF(Seq((3L, "o p"), (1L, "m m"))))
    s.release()
    assert(tfOf(f).nonEmpty) // folded frames usable after standing release
    f.release()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"leaked persisted RDDs: ${after -- before}")
  }
}
