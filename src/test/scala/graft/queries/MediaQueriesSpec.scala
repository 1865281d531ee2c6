package graft.queries

import org.apache.spark.sql.execution.ExplainMode

import graft.SparkSpec

/** The m-family's Spark-side invariants — the halves the DuckDB oracle
  * can't see (the oracle certifies value exactness; this spec pins the
  * plan shape and the planted-fixture semantics). */
class MediaQueriesSpec extends SparkSpec {

  test("m01 finds exactly the planted near-dup pairs, none else") {
    val pairs = MediaQueries.queries("m01_image_neardup")(spark, "")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = (0L until MediaQueries.NearDupN)
      .filter(i => i % 7 == 3 && i >= 3).map(i => (i - 3, i))
    assert(pairs.map(p => (p._1, p._2)).toSet == planted.toSet)
    // planted perturbation is one inverted block out of 64: hashes land
    // close but the pair is a NEAR dup, not necessarily an exact one
    assert(pairs.forall(_._3 <= MediaQueries.NearDupMaxHamming))
  }

  test("m05 metadata scan prunes the blob column from the parquet read") {
    val df = MediaQueries.queries("m05_media_metadata")(spark, "")
    val readSchema = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
      .linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("media:"),
      s"blob column not pruned from scan: $readSchema")
    assert(readSchema.contains("media_id") && readSchema.contains("kind"))
  }

  test("m04 frame sampling agrees with the encoded frame counts") {
    val rows = MediaQueries.queries("m04_video_frames")(spark, "")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == MediaQueries.MediaN / 3)
    rows.foreach { case (id, n) =>
      val nf = 6 + ((id / 3) % 4).toInt
      assert(n == (nf + 2) / 3, s"media $id: sampled $n of $nf frames")
    }
  }
}
