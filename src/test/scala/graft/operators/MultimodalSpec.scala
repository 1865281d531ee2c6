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

  test("MJPEG frame sampling emits real, individually-decodable JPEG frames") {
    val vids = syntheticReal(spark, 9).filter(_.kind == "video")
    // every 4th of 8 frames -> 2 rows per video
    val frames = sampleFrames(vids, every = 4).collect()
    assert(frames.length === vids.count() * 2)
    frames.foreach { r =>
      val img = ImageCodec.decode(r.getAs[Array[Byte]]("frame"))
      assert(img.isDefined, "sampled frame must be a decodable JPEG")
      assert(img.get.getWidth === 32 && img.get.getHeight === 24)
    }
    // non-video rows contribute no frames
    assert(sampleFrames(syntheticReal(spark, 9).filter(_.kind == "image")).count() === 0)
  }

  test("MJPEG splitter recovers exact frame boundaries without decoding") {
    val one = syntheticReal(spark, 9).filter(_.media_id == 2L).head() // video row
    val parts = VideoCodec.splitFrames(one.media).toSeq
    assert(parts.length === 8)
    // each recovered span is a complete JPEG: SOI..EOI
    parts.foreach { f =>
      assert((f(0) & 0xff) === 0xff && (f(1) & 0xff) === 0xd8)
      assert((f(f.length - 2) & 0xff) === 0xff && (f(f.length - 1) & 0xff) === 0xd9)
    }
    // splitting is exact: re-concatenation reproduces the stream
    assert(parts.flatten === one.media.toSeq)
    // random bytes contain no frames (skip, don't hallucinate)
    val junk = new Array[Byte](4096)
    new scala.util.Random(1).nextBytes(junk)
    assert(VideoCodec.splitFrames(junk).isEmpty)
    // feature extraction counts real sampled frames for video only
    val feats = extractFeatures(syntheticReal(spark, 9), frameEvery = 4)
      .collect().map(f => f.kind -> f.frames_sampled).toMap
    assert(feats("video") === 2)
    assert(feats("image") === 0 && feats("audio") === 0)
  }

  test("MJPEG splitter is segment-aware: APP1 payload with FFD9 doesn't cut the frame") {
    val img = ImageCodec.resize(new java.awt.image.BufferedImage(
      16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB), 16, 12)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val jpeg = baos.toByteArray
    // inject an EXIF-style APP1 right after SOI whose payload contains a
    // complete-JPEG-looking FF D8 ... FF D9 (the embedded-thumbnail case)
    val payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0,
      0xFF.toByte, 0xD8.toByte, 0x42, 0xFF.toByte, 0xD9.toByte, 0x07)
    val segLen = payload.length + 2
    val withApp1 = jpeg.take(2) ++
      Array(0xFF.toByte, 0xE1.toByte,
        ((segLen >> 8) & 0xff).toByte, (segLen & 0xff).toByte) ++
      payload ++ jpeg.drop(2)
    val frames = VideoCodec.splitFrames(withApp1 ++ withApp1).toSeq
    assert(frames.length === 2, "thumbnail EOI must not terminate the frame")
    assert(frames.forall(_.length === withApp1.length))
    assert(frames.forall(f => ImageCodec.decode(f).isDefined))
  }

  test("real PNG decode: true dimensions, channels, deterministic pixels") {
    val imgs = syntheticReal(spark, 30).filter(_.kind == "image")
    val decoded = decodeImages(imgs.toDF()).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(decoded.nonEmpty)
    imgs.collect().foreach { m =>
      val d = decoded(m.media_id)
      assert(d.getString(1) === "png")
      assert(d.getInt(2) === m.width && d.getInt(3) === m.height)
      assert(d.getInt(4) === 3)
      // gradient fill: mean luma must sit mid-range, identically per rerun
      assert(d.getDouble(5) > 64 && d.getDouble(5) < 192, d)
    }
    val again = decodeImages(imgs.toDF()).collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(again === decoded.map { case (k, v) => k -> v.getDouble(5) })
  }

  test("header parse agrees with full decode on real bytes, without decompressing") {
    val imgs = syntheticReal(spark, 30).filter(_.kind == "image").toDF()
    val full = decodeImages(imgs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val hdr = imageHeaders(imgs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(hdr === full)
  }

  test("header/decode agreement holds for JPEG and GIF too (incl. channels)") {
    import sqlImplicits._
    def encode(fmt: String): Array[Byte] = {
      val img = ImageCodec.resize(new java.awt.image.BufferedImage(
        40, 30, java.awt.image.BufferedImage.TYPE_INT_RGB), 40, 30)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, baos)
      baos.toByteArray
    }
    val df = Seq((1L, encode("jpg")), (2L, encode("gif")))
      .toDF("media_id", "media")
    val full = decodeImages(df).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val hdr = imageHeaders(df).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(hdr === full,
      "header-tier dims/channels must equal ImageIO's decode for JPEG and GIF")
  }

  test("JPEG header parse reads SOF dimensions from real JPEG bytes") {
    val img = ImageCodec.resize(
      new java.awt.image.BufferedImage(33, 21, java.awt.image.BufferedImage.TYPE_INT_RGB),
      33, 21)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val info = ImageCodec.parseHeader(baos.toByteArray)
    assert(info.exists(h => h.format == "jpeg" && h.width == 33 && h.height == 21))
  }

  test("real WAV decode: container facts and PCM RMS of the generated sine") {
    val wavs = syntheticReal(spark, 30).filter(_.kind == "audio")
    val decoded = decodeAudio(wavs.toDF()).collect()
    assert(decoded.length === wavs.count())
    decoded.foreach { r =>
      assert(r.getString(1) === "wav")
      assert(r.getInt(2) === 8000)
      assert(r.getInt(3) === 1)
      assert(r.getLong(4) === 800L)
      // RMS of a 0.5-amplitude sine = 0.5/sqrt(2) ≈ 0.3536
      assert(math.abs(r.getDouble(5) - 0.3536) < 0.01, r)
    }
  }

  test("resize produces decodable thumbnails at the target resolution") {
    val imgs = syntheticReal(spark, 6).filter(_.kind == "image").toDF()
    val thumbs = resizeImages(imgs, 16, 12)
    val redecoded = decodeImages(thumbs.withColumnRenamed("thumb", "media")).collect()
    assert(redecoded.length === imgs.count())
    redecoded.foreach { r =>
      assert(r.getInt(2) === 16 && r.getInt(3) === 12)
    }
  }

  test("malformed blobs are skipped, not thrown (random bytes through every path)") {
    // `synthetic` payloads are random bytes regardless of kind
    val junk = synthetic(spark, 30).toDF()
    assert(decodeImages(junk).count() === 0)
    assert(imageHeaders(junk).count() === 0)
    assert(decodeAudio(junk).count() === 0)
  }

  test("repartitionBySize evens out payload bytes per task") {
    val df = repartitionBySize(media.toDF(), targetBytesPerPartition = 32 * 1024)
    assert(df.rdd.getNumPartitions >= 2)
    assert(df.count() === 30)
  }

  test("aHash: stable under re-encode/resize, separates different images") {
    import sqlImplicits._
    def img(salt: Long) = {
      // a synthetic PNG row's decoded image (ids ≡ 0 mod 3 are images)
      val bytes = syntheticReal(spark, 60).filter(_.kind == "image")
        .collect().find(_.media_id == salt).get.media
      ImageCodec.decode(bytes).get
    }
    val base = img(0L)
    val h = ImageCodec.aHash(base)
    // re-encode round trip: identical pixels → identical hash
    assert(ImageCodec.aHash(
      ImageCodec.decode(ImageCodec.encodePng(base)).get) === h)
    // upscale 2×: perceptual content unchanged → small Hamming distance
    val up = ImageCodec.aHash(ImageCodec.resize(base, base.getWidth * 2, base.getHeight * 2))
    assert(java.lang.Long.bitCount(h ^ up) <= 3,
      s"resize moved the hash ${java.lang.Long.bitCount(h ^ up)} bits")
    // a structurally different image (checkerboard vs gradient) is far
    // away — note a DIFFERENT SALT is not: gradientImage's salt only
    // shifts the blue channel, and aHash's luma field barely sees it
    // (that near-invariance is exactly the robustness the hash is for)
    val board = new java.awt.image.BufferedImage(64, 48,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64)
      board.setRGB(x, y, if (((x / 8) + (y / 8)) % 2 == 0) 0xffffff else 0x000000)
    val other = ImageCodec.aHash(board)
    assert(java.lang.Long.bitCount(h ^ other) > 3)
  }

  test("imageNearDupPairs: banding finds near-dups, no false negatives") {
    import sqlImplicits._
    // corpus: images 0 and 100 are near-identical (100 = 0 upscaled and
    // re-encoded); 0 vs the other gradients are far apart
    val imgs = syntheticReal(spark, 60).filter(_.kind == "image").collect()
    val base = ImageCodec.decode(imgs.find(_.media_id == 0L).get.media).get
    val twin = ImageCodec.encodePng(
      ImageCodec.resize(base, base.getWidth * 2, base.getHeight * 2))
    val rows = imgs.map(r => (r.media_id, r.media)).toSeq :+ (100L, twin)
    val df = rows.toDF("media_id", "media")
    val pairs = imageNearDupPairs(df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 100L),
      s"the planted near-dup must surface: ${pairs.toSeq}")
    // banding completeness: every brute-force pair within the budget is found
    val hs = imageHashes(df).collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb))).toSet
    assert(pairs.toSet === brute, "banded pair set must equal brute force")
  }

  test("incremental near-dup fold ≡ rebuild: new pairs are exactly the " +
       "batch-involved slice of the full pair set; durable store round-trips") {
    import sqlImplicits._
    // gradient images with a planted cross-boundary near-dup: standing
    // image 0's 2× resize arrives IN THE BATCH as id 100, and a planted
    // batch-internal pair (101 ≈ 102, same pixels re-encoded)
    val imgs = syntheticReal(spark, 60).filter(_.kind == "image").collect()
    val base = ImageCodec.decode(imgs.find(_.media_id == 0L).get.media).get
    val standingRows = imgs.map(r => (r.media_id, r.media)).toSeq
    val standing = standingRows.toDF("media_id", "media")
    val batchRows = Seq(
      (100L, ImageCodec.encodePng(
        ImageCodec.resize(base, base.getWidth * 2, base.getHeight * 2))),
      (101L, ImageCodec.encodePng(base)),
      (102L, ImageCodec.encodePng(ImageCodec.resize(base,
        base.getWidth, base.getHeight))))
    val batch = batchRows.toDF("media_id", "media")

    // durable store: save standing hashes, load back (zero re-decode)
    val root = java.nio.file.Files.createTempDirectory("mm_ahash").toString
    saveAHashIndex(spark, imageHashes(standing), root, "spec")
    val loaded = loadAHashIndex(spark, root)
      .getOrElse(fail("aHash store round-trip failed"))

    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val folded = pairSet(
      incrementalImageNearDupPairs(loaded, batch, maxHamming = 3))
    // fold ≡ rebuild: pairs(standing ∪ batch) = pairs(standing) ∪ new,
    // disjointly — the incremental identity every index family certifies
    val full = pairSet(imageNearDupPairs(
      standing.unionByName(batch), maxHamming = 3))
    val old = pairSet(imageNearDupPairs(standing, maxHamming = 3))
    assert(folded === (full -- old), "fold must equal rebuild-minus-standing")
    assert(folded.intersect(old).isEmpty)
    // both planted kinds surface: cross-boundary and batch-internal
    assert(folded.exists(p => p._1 == 0L && p._2 == 100L),
      s"cross-boundary planted pair missing: $folded")
    assert(folded.exists(p => p._1 == 101L && p._2 == 102L),
      s"batch-internal planted pair missing: $folded")
    graft.io.TempRoots.delete(root)
  }

  test("audio energy fingerprint: gain-invariant, planted-pair margin, " +
       "skip-don't-throw on short/undecodable payloads") {
    import sqlImplicits._
    // seed-keyed envelope (the m08 fixture formula's shape): 64 windows
    // of a 440 Hz sine, amplitudes in [0.15, 0.95]
    def wav(seed: Long, gain: Double, flipW: Int): Array[Byte] = {
      def unit(w: Int): Double = {
        var x = seed * 6364136223846793005L + w * 104729L + 1442695040888963407L
        x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL; x ^= (x >>> 33)
        (x >>> 11).toDouble / (1L << 53).toDouble
      }
      val amp = Array.tabulate(64) { w =>
        val a = 0.15 + 0.8 * unit(w)
        if (w == flipW) 1.1 - a else a
      }
      val samples = Array.tabulate[Short](64 * 125) { t =>
        (math.sin(2 * math.Pi * 440.0 * t / 8000) * amp(t / 125) *
          16384 * gain).toShort
      }
      AudioCodec.encodeWav(samples, 8000)
    }
    def fp(b: Array[Byte]): Long = AudioCodec.energyFingerprint(b).get
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

    // global gain leaves the above/below-mean pattern intact (small
    // quantization wiggle allowed at 0.5× gain)
    assert(ham(fp(wav(7, 1.0, -1)), fp(wav(7, 0.5, -1))) <= 2,
      "fingerprint must be (near-)invariant under global gain")
    // planted near-dup (one window reflected) stays well inside budget 6;
    // distinct seeds sit near 32
    (0L until 8L).foreach { s0 =>
      val d = ham(fp(wav(s0, 1.0, -1)), fp(wav(s0, 1.0, (s0 * 31 % 64).toInt)))
      assert(d <= 6, s"planted pair at distance $d, budget 6 (seed $s0)")
    }
    val far = ham(fp(wav(1, 1.0, -1)), fp(wav(2, 1.0, -1)))
    assert(far > 12, s"distinct seeds must be far apart, got $far")
    // malformed-input policy: too-short PCM and garbage both skip
    assert(AudioCodec.energyFingerprint(
      AudioCodec.encodeWav(Array.fill[Short](32)(100), 8000)).isEmpty)
    assert(AudioCodec.energyFingerprint(Array.fill[Byte](64)(42)).isEmpty)

    // the distributed operator drops undecodable rows, keeps the rest
    val rows = Seq((1L, wav(1, 1.0, -1)), (2L, Array.fill[Byte](10)(7)))
      .toDF("media_id", "media")
    val got = audioFingerprints(rows).collect()
    assert(got.map(_.getLong(0)).toSet === Set(1L))
    assert(got.head.getLong(1) === fp(wav(1, 1.0, -1)))
  }

  test("video near-dup: aligned-frame banding finds exactly the planted " +
       "clip pair at full vote; unrelated clips share no close frame") {
    import sqlImplicits._
    def clip(seed: Long, flipBase: Int): Array[Byte] =
      VideoCodec.encodeMjpeg(Iterator.range(0, 8).map { f =>
        val im = new java.awt.image.BufferedImage(64, 64,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 64) {
          var x = 0
          while (x < 64) {
            val b = (y / 8) * 8 + (x / 8)
            var c = {
              var h = (seed + f) * 1103515245L + (y / 8) * 7919L +
                (x / 8) * 104729L + 12345L
              h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
              (h & 0xffffff).toInt
            }
            if (flipBase >= 0 && b == (flipBase + f * 17) % 64) c ^= 0xffffff
            im.setRGB(x, y, c)
            x += 1
          }
          y += 1
        }
        im
      })
    val rows = Seq(
      (0L, clip(100, -1)), (1L, clip(100, 5)), // planted pair 0 ≈ 1
      (2L, clip(200, -1))) // unrelated
      .toDF("media_id", "media")
    val hashes = videoFrameHashes(rows)
    assert(hashes.count() === 24L, "3 clips × 8 frames must hash")
    val pairs = videoNearDupPairs(hashes, maxHamming = 6, minClose = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((0L, 1L, 8L)),
      s"exactly the planted pair at full 8-frame vote, got ${pairs.toSeq}")
    // below the vote floor nothing survives: budget 0 kills the lossy-
    // JPEG-perturbed planted frames too
    assert(videoNearDupPairs(hashes, maxHamming = 0, minClose = 1)
      .filter("id_a <> id_b").count() === 0L)
  }
}
