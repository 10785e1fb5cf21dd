package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import MediaOps.{ImageCodec, Resize, Crop, Brightness}

class MediaOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def media = {
    import spark.implicits._
    val png = udf((id: Long) => ImageCodec.synthPng(id))
    Seq(1L, 2L, 35L).toDF("doc_id")
      .select(col("doc_id"), png(col("doc_id")).as("payload"))
  }

  test("metadata decodes REAL png header dims and format") {
    val rows = MediaOps.withMetadata(media, col("payload"))
      .select("doc_id", "meta.width", "meta.height", "meta.format", "meta.n_bytes")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4)))
    rows.foreach { case (id, w, h, fmt, n) =>
      assert(w == 16 + (id % 32).toInt, "closed-form synth width")
      assert(h == 8 + (id % 16).toInt)
      assert(fmt == "png")
      assert(n > 0)
    }
  }

  test("png round-trip is pixel-exact; jpeg re-encode decodes to same dims") {
    val img = ImageCodec.synthImage(7L)
    val back = ImageCodec.decode(ImageCodec.encode(img, "png"))
    assert(back.getWidth == img.getWidth && back.getHeight == img.getHeight)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      assert((back.getRGB(x, y) & 0xffffff) == (img.getRGB(x, y) & 0xffffff))
    val j = ImageCodec.decode(ImageCodec.encode(img, "jpeg"))
    assert(j.getWidth == img.getWidth && j.getHeight == img.getHeight)
  }

  test("resize/crop produce exact raster dims; crop clamps at the border") {
    val img = ImageCodec.synthImage(3L) // 19 x 11
    val r = MediaOps.applyOp(img, Resize(256, 128))
    assert(r.getWidth == 256 && r.getHeight == 128)
    val c = MediaOps.applyOp(r, Crop(200, 100, 128, 128))
    assert(c.getWidth == 56 && c.getHeight == 28, "clamped to 256-200 x 128-100")
    // crop content == source region
    for (y <- 0 until 5; x <- 0 until 5)
      assert(c.getRGB(x, y) == r.getRGB(200 + x, 100 + y))
  }

  test("brightness follows the Jimp curve per channel") {
    val img = new java.awt.image.BufferedImage(1, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (100 << 16) | (200 << 8) | 0)
    val up = MediaOps.applyOp(img, Brightness(0.5))
    val p = up.getRGB(0, 0)
    assert(((p >> 16) & 0xff) == 178, "100 + (255-100)*0.5 = 177.5 -> 178")
    assert(((p >> 8) & 0xff) == 228)
    assert((p & 0xff) == 128)
    val down = MediaOps.applyOp(img, Brightness(-0.5))
    val q = down.getRGB(0, 0)
    assert(((q >> 16) & 0xff) == 50 && ((q >> 8) & 0xff) == 100 && (q & 0xff) == 0)
  }

  test("convert re-encodes to the target format; no-codec formats fail closed") {
    val out = MediaOps.convert(media, "bmp")
    val metas = MediaOps.withMetadata(out.select(col("doc_id"), col("payload")),
      col("payload")).select("meta.format").collect()
    metas.foreach(r => assert(r.getString(0) == "bmp"))
    intercept[InvalidCodecException](MediaOps.convert(media, "webp"))
    intercept[InvalidCodecException](MediaOps.convert(media, "flif"))
    intercept[IllegalArgumentException](MediaOps.adjustBrightness(media, 2.0))
  }

  test("fused applyOps == chained single ops (one decode vs many)") {
    val ops = Seq(Resize(64, 48), Crop(8, 8, 32, 16), Brightness(0.25))
    val fused = MediaOps.applyOps(media, ops, Some("png"))
      .select("doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    val chained = MediaOps.convert(
      MediaOps.adjustBrightness(
        MediaOps.crop(MediaOps.resize(media, 64, 48), 8, 8, 32, 16), 0.25), "png")
      .select("doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    fused.foreach { case (id, bytes) =>
      // png is lossless -> identical pixels either way
      val a = ImageCodec.decode(bytes)
      val b = ImageCodec.decode(chained(id))
      assert(a.getWidth == 32 && a.getHeight == 16)
      for (y <- 0 until a.getHeight; x <- 0 until a.getWidth)
        assert((a.getRGB(x, y) & 0xffffff) == (b.getRGB(x, y) & 0xffffff))
    }
  }

  test("frame sampling + REAL thumbnail feature extraction shapes") {
    val out = MediaOps.extractFeatures(MediaOps.sampleFrames(media, 4))
      .select("n_frames", "embedding").collect()
    out.foreach { r =>
      assert(r.getInt(0) == 4)
      val emb = r.getSeq[Float](1)
      assert(emb.length == 16)
      emb.foreach(f => assert(f >= 0f && f <= 1f))
      assert(emb.distinct.length > 1, "real pixels -> non-constant descriptor")
    }
  }

  test("feature extraction matches a hand-computed mean on a flat image") {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    import spark.implicits._
    val df = Seq(1L).toDF("doc_id")
      .withColumn("payload", udf(() => ImageCodec.encode(img, "png")).apply())
    val emb = MediaOps.extractFeatures(df).select("embedding").head().getSeq[Float](0)
    emb.foreach(v => assert(math.abs(v - 128f / 255f) < 1e-3))
  }

  test("mime maps are mutually inverse") {
    MediaOps.Formats.foreach { f =>
      assert(MediaOps.MimeFormat(MediaOps.FormatMime(f)) == f)
    }
  }

  test("REAL audio path: WAV header metadata, PCM samples, sine RMS, features") {
    import spark.implicits._
    val bytes = MediaOps.AudioCodec.synthWav(7L)
    val (rate, ch, frames) = MediaOps.AudioCodec.meta(bytes)
    assert(rate == 8000 && ch == 1 && frames == 800 + 7 * 8)
    val s7 = MediaOps.AudioCodec.samples(bytes)
    assert(s7.length == frames)
    // analytic sine RMS = amp / sqrt(2)
    val rms = MediaOps.AudioCodec.rms(s7)
    assert(math.abs(rms - 8192.0 / 32768.0 / math.sqrt(2.0)) < 0.01, rms)
    val wav = org.apache.spark.sql.functions.udf((id: Long) => MediaOps.AudioCodec.synthWav(id))
    val df = Seq(1L, 2L, 103L).toDF("doc_id")
      .select(col("doc_id"), wav(col("doc_id")).as("payload"))
    val out = MediaOps.extractAudioFeatures(
      MediaOps.withAudioMetadata(df, col("payload")), k = 8)
      .select("doc_id", "audio_meta.sample_rate", "audio_meta.n_frames",
        "audio_meta.duration_ms", "audio_embedding").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 8000)
      assert(r.getLong(2) == 800 + (id % 100) * 8)
      assert(r.getLong(3) == (800 + (id % 100) * 8) / 8)
      val emb = r.getSeq[Float](4)
      assert(emb.length == 8)
      emb.foreach(v => assert(v >= 0f && v <= 1f))
    }
    intercept[Exception](MediaOps.AudioCodec.meta("not a wav".getBytes("UTF-8")))
  }

  test("audio resample: exact frame-count law, RMS preserved, identity at same rate") {
    import spark.implicits._
    val bytes = MediaOps.AudioCodec.synthWav(7L) // 8000 Hz, 856 frames
    val s = MediaOps.AudioCodec.samples(bytes)
    // same-rate resample is the identity
    assert(MediaOps.AudioCodec.resample(s, 8000, 8000) eq s)
    // 2:1 decimation: floor(n*to/from) frames, RMS still the sine law
    val half = MediaOps.AudioCodec.resample(s, 8000, 4000)
    assert(half.length == s.length / 2)
    assert(math.abs(MediaOps.AudioCodec.rms(half) - 8192.0 / 32768.0 / math.sqrt(2.0)) < 0.02)
    // non-integer ratio keeps the exact count formula
    val up = MediaOps.AudioCodec.resample(s, 8000, 11025)
    assert(up.length == (s.length.toLong * 11025 / 8000).toInt)
    // wav re-encode round-trips the new header
    val wavOut = MediaOps.AudioCodec.encodeWav(half, 4000)
    assert(MediaOps.AudioCodec.meta(wavOut) == ((4000, 1, half.length.toLong)))
    // DataFrame op end to end
    val wav = org.apache.spark.sql.functions.udf((id: Long) => MediaOps.AudioCodec.synthWav(id))
    val df = Seq(1L, 103L).toDF("doc_id")
      .select(col("doc_id"), wav(col("doc_id")).as("payload"))
    MediaOps.resampleAudio(df, 4000)
      .select("doc_id", "audio_meta.sample_rate", "audio_meta.n_frames").collect()
      .foreach { r =>
        assert(r.getInt(1) == 4000)
        assert(r.getLong(2) == (800 + (r.getLong(0) % 100) * 8) / 2)
      }
  }

  test("EXIF orientation: APP1 splice parses back; raster remap is exact") {
    val jpeg = ImageCodec.synthJpeg(3L) // 19 x 11
    assert(MediaOps.Exif.orientation(jpeg) == 1, "no EXIF -> upright")
    assert(MediaOps.Exif.orientation(ImageCodec.synthPng(3L)) == 1, "non-JPEG -> upright")
    (1 to 8).foreach { o =>
      val tagged = MediaOps.Exif.withOrientation(jpeg, o)
      assert(MediaOps.Exif.orientation(tagged) == o)
      // the spliced payload still decodes (APP1 is transparent to ImageIO)
      val img = ImageCodec.decode(tagged)
      assert(img.getWidth == 19 && img.getHeight == 11)
    }
    // some writers store orientation as LONG (type 4) — honored; entries
    // with a non-1 count or an offset-stored type fall back to upright
    // instead of misreading the value field
    def tagged(typ: Int, count: Int, value: Int): Array[Byte] = {
      val tiff = Array[Byte](
        'I', 'I', 0x2A, 0, 8, 0, 0, 0,
        1, 0,
        0x12, 0x01, typ.toByte, 0, count.toByte, 0, 0, 0,
        value.toByte, 0, 0, 0,
        0, 0, 0, 0)
      val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
      val len = payload.length + 2
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload ++ jpeg.drop(2)
    }
    assert(MediaOps.Exif.orientation(tagged(typ = 4, count = 1, value = 6)) == 6,
      "LONG-typed orientation honored")
    assert(MediaOps.Exif.orientation(tagged(typ = 3, count = 2, value = 6)) == 1,
      "multi-count entry -> upright")
    assert(MediaOps.Exif.orientation(tagged(typ = 1, count = 1, value = 6)) == 1,
      "BYTE-typed entry -> upright")
    // pixel law for rotate-90-CW (orientation 6): src (x,y) -> dst (h-1-y, x)
    val img = ImageCodec.synthImage(3L)
    val rot = MediaOps.Exif.applyOrientation(img, 6)
    assert(rot.getWidth == 11 && rot.getHeight == 19)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      assert(rot.getRGB(img.getHeight - 1 - y, x) == img.getRGB(x, y))
    // mirror-horizontal (2) keeps dims; transpose (5) swaps them
    assert(MediaOps.Exif.applyOrientation(img, 2).getWidth == 19)
    val tr = MediaOps.Exif.applyOrientation(img, 5)
    assert(tr.getWidth == 11 && tr.getHeight == 19)
    assert(tr.getRGB(5, 7) == img.getRGB(7, 5))
  }

  test("normalizeOrientation: dims swap for transposed tags, column carries the tag") {
    import spark.implicits._
    val tagged = org.apache.spark.sql.functions.udf { (id: Long) =>
      MediaOps.Exif.withOrientation(ImageCodec.synthJpeg(id), (1 + id % 8).toInt)
    }
    val df = Seq(0L, 3L, 4L, 5L, 7L).toDF("doc_id")
      .select(col("doc_id"), tagged(col("doc_id")).as("payload"))
    MediaOps.normalizeOrientation(df)
      .select("doc_id", "exif_orientation", "meta.width", "meta.height").collect()
      .foreach { r =>
        val id = r.getLong(0)
        val o = (1 + id % 8).toInt
        val (w, h) = (16 + (id % 32).toInt, 8 + (id % 16).toInt)
        assert(r.getInt(1) == o)
        if (o >= 5) assert(r.getInt(2) == h && r.getInt(3) == w)
        else assert(r.getInt(2) == w && r.getInt(3) == h)
      }
  }

  test("EXIF orientation: corrupt IFD offset falls back upright, never indexes negative") {
    val jpeg = ImageCodec.synthJpeg(3L)
    def corruptOffset(off: Long): Array[Byte] = {
      val tiff = Array[Byte]('I', 'I', 0x2A, 0,
        (off & 0xff).toByte, ((off >> 8) & 0xff).toByte,
        ((off >> 16) & 0xff).toByte, ((off >> 24) & 0xff).toByte)
      val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
      val len = payload.length + 2
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload ++ jpeg.drop(2)
    }
    // 0x80000000 wraps negative through .toInt; 0xFFFFFFF0 lands far past
    // the buffer — both must fall back to upright, not throw
    assert(MediaOps.Exif.orientation(corruptOffset(0x80000000L)) == 1)
    assert(MediaOps.Exif.orientation(corruptOffset(0xFFFFFFF0L)) == 1)
  }

  test("webp/avif convert fails CLOSED like the reference's InvalidFormat") {
    // the reference's ImageFormat enum lists webp/avif but throws
    // InvalidFormat without the native sibling package
    // (/root/reference/src/EncodeTools.ts:301-310); the engine mirrors the
    // shape exactly: known-but-codec-less formats raise at PLAN time
    // (driver), before any task runs, and unknown formats raise the
    // closed-world error — pinned here so the documented N/A stays loud
    // rather than silently converting to png
    for (f <- Seq("webp", "avif")) {
      val e = intercept[InvalidCodecException](MediaOps.convert(media, f))
      assert(e.getMessage.contains(s"no JVM codec for '$f'"))
    }
    val unknown = intercept[InvalidCodecException](MediaOps.convert(media, "xpm"))
    assert(unknown.getMessage.contains("unknown image format"))
    // the executor-side kernel fails closed too (defense in depth for
    // callers that bypass applyOps)
    val img = ImageCodec.synthImage(5L)
    intercept[InvalidCodecException](ImageCodec.encode(img, "webp"))
  }
}
