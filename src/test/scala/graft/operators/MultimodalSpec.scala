package graft.operators

import org.apache.spark.sql.execution.ExplainMode
import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {

  private lazy val media = synthetic(spark, 30)

  test("synthetic media is deterministic (same seed → same bytes)") {
    val a = synthetic(spark, 5).collect().map(_.media.toSeq)
    val b = synthetic(spark, 5).collect().map(_.media.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("metadata projection prunes the binary column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    media.write.mode("overwrite").parquet(dir)
    val df = metadata(spark.read.parquet(dir))
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    // length(media) does need the blob; project media_id/kind only and the
    // scan must drop the binary column entirely
    val slim = spark.read.parquet(dir).select("media_id", "kind")
    val slimSchema = slim.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
      .linesIterator.find(_.contains("ReadSchema")).get
    assert(!slimSchema.contains("media:binary"), slimSchema)
    assert(df.collect().forall(_.getAs[Int]("n_bytes") >= 4096))
  }

  test("feature extraction: entropy of random bytes ≈ 8 bits, mean ≈ 127.5") {
    val feats = extractFeatures(media).collect()
    assert(feats.length === 30)
    feats.foreach { f =>
      assert(f.byte_entropy > 7.5 && f.byte_entropy <= 8.0, f)
      assert(f.mean_byte > 110 && f.mean_byte < 145, f)
      assert(f.n_bytes >= 4096)
    }
  }

  test("frame sampling emits one row per sampled 256-byte block") {
    val frames = sampleFrames(media.filter(_.media_id == 0L), every = 4).collect()
    val nBytes = media.filter(_.media_id == 0L).head().media.length
    val expected = math.ceil(nBytes / 256.0 / 4).toInt
    assert(frames.length === expected)
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length <= 256))
  }

  test("repartitionBySize evens out payload bytes per task") {
    val df = repartitionBySize(media.toDF(), targetBytesPerPartition = 32 * 1024)
    assert(df.rdd.getNumPartitions >= 2)
    assert(df.count() === 30)
  }
}
