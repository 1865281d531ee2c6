package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media (image/audio/video) as opaque BINARY
  * columns plus typed metadata, with decode / feature-extraction /
  * frame-sampling implemented as batched per-partition transforms.
  *
  * The actual codec is STUBBED (`FakeCodec`) — this container has no
  * image/audio libraries — but everything Spark-side is real and tested:
  * the schema contract, the binary column flow, the partition-batched
  * processing shape (the Scala analog of `mapInPandas`: one iterator per
  * partition, amortized per-batch setup, bounded memory), and the
  * size-aware repartitioning that keeps huge blobs from skewing tasks.
  *
  * At 100 TB: media rows are orders of magnitude wider than text rows, so
  * every transform here (a) never shuffles the binary payload unless the
  * operation requires it, (b) exposes `repartitionBySize` so downstream
  * stages get even task sizes, and (c) projects metadata-only outputs
  * where the payload isn't needed (column pruning drops the blob read
  * entirely when `media` is untouched).
  */
object Multimodal {

  /** Typed media row: the schema contract for a multimodal table. */
  final case class MediaRow(
      media_id: Long, kind: String, media: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      mean_byte: Double, byte_entropy: Double, frames_sampled: Int)

  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val mediaFeatEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** STUB codec — deterministic stand-in for a real image/audio decoder.
    * Replace `decodeFrames` with an actual codec call in production; the
    * signature (bytes → iterator of frame byte-arrays) is the real one. */
  object FakeCodec {
    /** "Decode" count: pretend each 256-byte block is one frame. */
    def decodeFrames(media: Array[Byte], every: Int = 4): Iterator[Array[Byte]] =
      media.grouped(256).grouped(every).map(_.head)
  }

  /** Even out task sizes by payload bytes: media blobs are wildly variable,
    * so row-count partitioning skews executors. One column scan (length
    * only — the blob itself isn't shuffled until the repartition moves it). */
  def repartitionBySize(df: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val totalBytes = Option(df.select(sum(length(col("media")))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L) // sum over zero rows is NULL
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    df.repartition(parts, col("media_id"))
  }

  /** Metadata-only projection: never touches the blob — the parquet scan
    * prunes the binary column entirely (assert via ReadSchema). */
  def metadata(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("kind"), col("width"), col("height"),
      col("sample_rate"), length(col("media")).as("n_bytes"))

  /** Partition-batched feature extraction — the mapInPandas shape: per
    * partition, one-time "codec init", then stream rows through it.
    * Per-row state is O(frame), never O(partition). */
  def extractFeatures(ds: Dataset[MediaRow], frameEvery: Int = 4): Dataset[MediaFeatures] =
    ds.mapPartitions { rows =>
      // one-time per-partition setup (a real codec would init here)
      val codec = FakeCodec
      rows.map { r =>
        val counts = new Array[Long](256)
        var i = 0
        while (i < r.media.length) { counts(r.media(i) & 0xff) += 1; i += 1 }
        val n = r.media.length.toDouble
        var mean = 0.0
        var entropy = 0.0
        var b = 0
        while (b < 256) {
          mean += (counts(b) * b) / n
          if (counts(b) > 0) {
            val p = counts(b) / n
            entropy -= p * math.log(p) / math.log(2)
          }
          b += 1
        }
        val frames = codec.decodeFrames(r.media, frameEvery).size
        MediaFeatures(r.media_id, r.kind, r.media.length.toLong,
          mean, entropy, frames)
      }
    }

  /** Frame sampling as a generator: one output row per sampled frame,
    * payload sliced column-side (no driver involvement). */
  def sampleFrames(ds: Dataset[MediaRow], every: Int = 4): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      FakeCodec.decodeFrames(r.media, every).zipWithIndex.map {
        case (frame, idx) => (r.media_id, idx, frame)
      }
    }.toDF("media_id", "frame_idx", "frame")
  }

  /** Deterministic synthetic media table (test/demo source — stands in for
    * an object-store-backed binary column). */
  def synthetic(spark: SparkSession, n: Int, bytesPerRow: Int = 4096): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rng = new scala.util.Random(i) // per-row seed: deterministic
      val bytes = new Array[Byte](bytesPerRow + (i % 7).toInt * 512)
      rng.nextBytes(bytes)
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      MediaRow(i, kind, bytes, 640, 480, 16000)
    }
  }
}
