package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Real (JDK-native, zero-dependency) media codecs for the multimodal
  * column operators: PNG/JPEG/GIF/BMP via `javax.imageio`, WAV/AIFF via
  * `javax.sound.sampled`. Two tiers, chosen by what the query needs:
  *
  *  - HEADER PARSE ([[ImageCodec.parseHeader]]): reads dimensions/channels
  *    straight from the container bytes without decompressing — a few
  *    hundred bytes touched per blob. At 100 TB this is the default tier:
  *    a dimensions/filtering pass must not pay pixel-decode CPU.
  *  - FULL DECODE ([[ImageCodec.decode]] / [[AudioCodec.decode]]): real
  *    pixel/sample access for feature extraction and resizing.
  *
  * Only video has no in-JDK codec; that single kind keeps an explicitly
  * marked stub (see [[Multimodal]]).
  */
object ImageCodec {

  /** Container-level image facts, readable without decompression. */
  final case class ImageInfo(format: String, width: Int, height: Int, channels: Int)

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Header-only parse of PNG / JPEG / GIF — no decompression, no ImageIO
    * reader allocation. Returns None for anything unrecognized or
    * truncated (malformed-input policy: skip, never throw — one corrupt
    * blob in 100 TB must not kill a stage). */
  def parseHeader(bytes: Array[Byte]): Option[ImageInfo] = {
    if (bytes == null || bytes.length < 16) None
    // PNG: 8-byte signature, then IHDR chunk: len(4) 'IHDR' w(4) h(4)
    // bitdepth(1) colortype(1)
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
             bytes(3) == 'G' && bytes.length >= 26) {
      val colorType = bytes(25) & 0xff
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return None
      }
      Some(ImageInfo("png", beInt(bytes, 16), beInt(bytes, 20), channels))
    }
    // JPEG: FF D8, then marker segments; SOFn carries precision h w ncomp
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var p = 2
      while (p + 9 < bytes.length) {
        if ((bytes(p) & 0xff) != 0xff) return None
        val marker = bytes(p + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) p += 2
        else {
          val segLen = beShort(bytes, p + 2)
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof)
            return Some(ImageInfo("jpeg", beShort(bytes, p + 7),
              beShort(bytes, p + 5), bytes(p + 9) & 0xff))
          if (segLen < 2) return None
          p += 2 + segLen
        }
      }
      None
    }
    // GIF: 'GIF8xa', logical screen w/h as LE u16
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') {
      val w = (bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8)
      val h = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
      Some(ImageInfo("gif", w, h, 3))
    }
    else None
  }

  /** Full pixel decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP readers are
    * part of Java SE). None on unrecognized/corrupt bytes. Call
    * `ImageIO.setUseCache(false)` once per partition before streaming rows
    * through this — otherwise every blob round-trips a temp file. */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Mean luminance (ITU-R BT.601 weights) over all pixels, in [0, 255]. */
  def meanLuma(img: BufferedImage): Double = {
    var acc = 0.0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        acc += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    acc / (img.getWidth.toLong * img.getHeight)
  }

  /** Bilinear resize (JDK Graphics2D). */
  def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }
}

object AudioCodec {

  /** Decoded audio facts + sample stats. `rms` is over 16-bit PCM samples
    * normalized to [-1, 1]. */
  final case class AudioInfo(format: String, sampleRate: Int, channels: Int,
                             nFrames: Long, rms: Double)

  /** Full decode of a WAV/AIFF container via javax.sound.sampled: format
    * facts from the header, RMS from the PCM payload. None on
    * unrecognized/corrupt bytes (skip-don't-throw, as with images). */
  def decode(bytes: Array[Byte]): Option[AudioInfo] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val fileFormat = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new ByteArrayInputStream(bytes))
        val data = ais.readAllBytes()
        var acc = 0.0
        var n = 0
        if (fmt.getSampleSizeInBits == 16) {
          var i = 0
          while (i + 1 < data.length) {
            val s =
              if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
              else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
            val x = s / 32768.0
            acc += x * x
            n += 1
            i += 2
          }
        }
        Some(AudioInfo(fileFormat.getType.getExtension,
          fmt.getSampleRate.toInt, fmt.getChannels, ais.getFrameLength,
          if (n == 0) 0.0 else math.sqrt(acc / n)))
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Encode 16-bit mono PCM samples as a WAV container. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val baos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }
}
