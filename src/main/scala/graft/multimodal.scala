package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines, mirroring the reference's image operator family
  * (cropImage/resizeImage/adjustImageBrightness/convertImage/
  * getImageMetadata, /root/reference/src/EncodeTools.ts:1761-1893).
  *
  * Media payloads are opaque `binary` columns + a typed metadata struct
  * (width, height, format, n_bytes). Pixel work is REAL: decode/encode via
  * `javax.imageio` (png/jpeg/gif/bmp/tiff ship with every JDK — the same
  * formats as the reference's `ImageFormatMimeTypes`, EncodeTools.ts:379-386,
  * minus webp/avif which have no JDK codec and fail closed). Brightness
  * follows the Jimp curve the reference delegates to: factor<0 scales each
  * channel by (1+factor), factor>0 interpolates toward 255.
  *
  * Scale notes: metadata reads only the image HEADER (no pixel decode);
  * chained transforms should go through [[applyOps]], which decodes once,
  * applies every op on the raster, and encodes once — the per-op
  * decode/re-encode of the individual helpers is API parity, not the hot
  * path. All UDFs are per-row pure functions → embarrassingly parallel,
  * no shuffle.
  *
  * STUB BOUNDARY (documented, narrow): video frame extraction and the
  * vision-encoder embedding have no in-JDK codec/model; [[sampleFrames]]
  * keeps a deterministic byte-slice stand-in and [[extractFeatures]]
  * computes a REAL 16-dim grayscale thumbnail descriptor (mean-pooled 4x4)
  * rather than a fake hash.
  */
object MediaOps {

  val Formats: Seq[String] = Seq("png", "jpeg", "gif", "bmp", "tiff", "webp", "avif")
  /** Formats with an in-JVM ImageIO codec. */
  val JvmFormats: Set[String] = Set("png", "jpeg", "gif", "bmp", "tiff")
  val FormatMime: Map[String, String] = Formats.map(f =>
    f -> (if (f == "jpeg") "image/jpeg" else s"image/$f")).toMap
  val MimeFormat: Map[String, String] = FormatMime.map(_.swap)

  // ---------------- executor-side image kernels (pure JVM, no Spark) ------

  object ImageCodec {
    def decode(bytes: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null)
        throw new InvalidCodecException("undecodable image payload")
      // normalize to RGB so every downstream encoder (incl. jpeg) accepts it
      if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else {
        val rgb = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
        val g = rgb.createGraphics()
        g.drawImage(img, 0, 0, null)
        g.dispose()
        rgb
      }
    }

    def encode(img: BufferedImage, format: String): Array[Byte] = {
      if (!JvmFormats.contains(format))
        throw new InvalidCodecException(s"no JVM codec for image format '$format'")
      val out = new ByteArrayOutputStream()
      val ok = ImageIO.write(img, format, out)
      if (!ok) throw new InvalidCodecException(s"ImageIO rejected format '$format'")
      out.toByteArray
    }

    /** (width, height, format) from the payload HEADER only — no pixel
      * decode, so metadata over billions of rows costs header-parse time.
      */
    def meta(bytes: Array[Byte]): (Int, Int, String) = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new InvalidCodecException("unknown image container")
        val r = readers.next()
        r.setInput(iis)
        try {
          val fmt = r.getFormatName.toLowerCase match {
            case "jpg" | "jpeg" => "jpeg"
            case "tif" | "tiff" => "tiff"
            case f => f
          }
          (r.getWidth(0), r.getHeight(0), fmt)
        } finally r.dispose()
      } finally iis.close()
    }

    /** Deterministic synthetic image keyed by id — test/bench fixture with
      * closed-form dims (width = 16 + id%32, height = 8 + id%16) so oracles
      * can state the expected metadata in plain SQL.
      */
    def synthImage(id: Long): BufferedImage = {
      val w = 16 + (id % 32).toInt
      val h = 8 + (id % 16).toInt
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = (x * 7 + id) % 256
          val g = (y * 13 + id * 3) % 256
          val b = (x * y + id * 5) % 256
          img.setRGB(x, y, ((r.toInt & 0xff) << 16) | ((g.toInt & 0xff) << 8) | (b.toInt & 0xff))
          x += 1
        }
        y += 1
      }
      img
    }

    def synthPng(id: Long): Array[Byte] = encode(synthImage(id), "png")
    def synthJpeg(id: Long): Array[Byte] = encode(synthImage(id), "jpeg")
  }

  /** Minimal EXIF reader/writer for the orientation tag — enough to
    * normalize camera rotation at scan time. Parses the JPEG APP1 segment's
    * TIFF IFD0 per the public EXIF 2.3 / TIFF 6.0 layout; non-JPEG or
    * EXIF-less payloads report orientation 1 (upright).
    */
  object Exif {
    val OrientationTag = 0x0112

    def orientation(bytes: Array[Byte]): Int = {
      if (bytes.length < 4 ||
        (bytes(0) & 0xff) != 0xFF || (bytes(1) & 0xff) != 0xD8) return 1
      var i = 2
      while (i + 4 <= bytes.length && (bytes(i) & 0xff) == 0xFF) {
        val marker = bytes(i + 1) & 0xff
        if (marker >= 0xD0 && marker <= 0xD9) i += 2 // standalone markers
        else {
          val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
          if (marker == 0xE1 && i + 10 <= bytes.length &&
            bytes(i + 4) == 'E' && bytes(i + 5) == 'x' && bytes(i + 6) == 'i' &&
            bytes(i + 7) == 'f' && bytes(i + 8) == 0 && bytes(i + 9) == 0) {
            val t = i + 10 // TIFF header
            if (t + 8 > bytes.length) return 1
            val little = bytes(t) == 'I' && bytes(t + 1) == 'I'
            def u16(p: Int): Int =
              if (little) (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
              else ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
            def u32(p: Int): Long =
              if (little) (u16(p).toLong) | (u16(p + 2).toLong << 16)
              else (u16(p).toLong << 16) | u16(p + 2).toLong
            // offset arithmetic in Long: a corrupt IFD offset like
            // 0x80000000 would wrap negative through .toInt and index the
            // array at a negative position instead of falling back upright
            val ifdL = t.toLong + u32(t + 4)
            if (ifdL < 0 || ifdL + 2 > bytes.length) return 1
            val ifd = ifdL.toInt
            val n = u16(ifd)
            var e = 0
            while (e < n) {
              val ep = ifd + 2 + e * 12
              if (ep + 12 > bytes.length) return 1
              if (u16(ep) == OrientationTag) {
                // honor the entry's type + count before trusting the value
                // field: 3=SHORT (first 2 bytes inline), 4=LONG (u32
                // inline); anything else (offset-stored, multi-count,
                // exotic writer) falls back to upright rather than
                // misreading garbage
                val typ = u16(ep + 2)
                val count = u32(ep + 4)
                val o =
                  if (count != 1L) -1
                  else if (typ == 3) u16(ep + 8)
                  else if (typ == 4) u32(ep + 8).toInt
                  else -1
                return if (o >= 1 && o <= 8) o else 1
              }
              e += 1
            }
            return 1
          }
          if (marker == 0xDA) return 1 // SOS: entropy data follows, stop
          i += 2 + len
        }
      }
      1
    }

    /** Splice a minimal EXIF APP1 (one IFD0 entry: orientation) right after
      * SOI — the test-vector constructor (ImageIO writes no EXIF itself).
      */
    def withOrientation(jpeg: Array[Byte], o: Int): Array[Byte] = {
      require(o >= 1 && o <= 8, s"orientation $o")
      require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xFF && (jpeg(1) & 0xff) == 0xD8,
        "not a JPEG payload")
      val tiff = Array[Byte](
        'I', 'I', 0x2A, 0, 8, 0, 0, 0, // II, magic 42, IFD0 at offset 8
        1, 0, // one entry
        0x12, 0x01, 3, 0, 1, 0, 0, 0, // tag 0x0112, type SHORT, count 1
        o.toByte, 0, 0, 0, // value
        0, 0, 0, 0) // next-IFD = none
      val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
      val len = payload.length + 2
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload ++ jpeg.drop(2)
    }

    /** Undo the stored orientation so the raster reads upright: the eight
      * EXIF cases as one pixel remap (dims swap for 5-8).
      */
    def applyOrientation(img: BufferedImage, o: Int): BufferedImage = {
      if (o <= 1 || o > 8) return img
      val w = img.getWidth
      val h = img.getHeight
      val swap = o >= 5
      val out = new BufferedImage(if (swap) h else w, if (swap) w else h,
        BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (tx, ty) = o match {
            case 2 => (w - 1 - x, y) // mirror horizontal
            case 3 => (w - 1 - x, h - 1 - y) // rotate 180
            case 4 => (x, h - 1 - y) // mirror vertical
            case 5 => (y, x) // transpose
            case 6 => (h - 1 - y, x) // rotate 90 CW
            case 7 => (h - 1 - y, w - 1 - x) // transverse
            case _ => (y, w - 1 - x) // 8: rotate 270 CW
          }
          out.setRGB(tx, ty, img.getRGB(x, y))
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** One raster-level operation; chains fuse via [[applyOps]]. */
  sealed trait ImageOp extends Serializable
  final case class Resize(w: Int, h: Int) extends ImageOp
  final case class Crop(x: Int, y: Int, w: Int, h: Int) extends ImageOp
  final case class Brightness(factor: Double) extends ImageOp {
    require(factor >= -1.0 && factor <= 1.0, s"brightness factor $factor")
  }

  private[graft] def applyOp(img: BufferedImage, op: ImageOp): BufferedImage = op match {
    case Resize(w, h) =>
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      out
    case Crop(x, y, w, h) =>
      // real bounds clamping (cropImage, EncodeTools.ts:1761-1766)
      val x0 = math.max(0, math.min(x, img.getWidth - 1))
      val y0 = math.max(0, math.min(y, img.getHeight - 1))
      val cw = math.max(1, math.min(w, img.getWidth - x0))
      val ch = math.max(1, math.min(h, img.getHeight - y0))
      val sub = img.getSubimage(x0, y0, cw, ch)
      val out = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics(); g.drawImage(sub, 0, 0, null); g.dispose()
      out
    case Brightness(f) =>
      val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
      def adj(v: Int): Int = {
        val d = if (f < 0) v * (1.0 + f) else v + (255.0 - v) * f
        math.max(0, math.min(255, d.round.toInt))
      }
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          out.setRGB(x, y,
            (adj((p >> 16) & 0xff) << 16) | (adj((p >> 8) & 0xff) << 8) | adj(p & 0xff))
          x += 1
        }
        y += 1
      }
      out
  }

  // ---------------- DataFrame operators ----------------

  private def metaStruct(widthC: Column, heightC: Column, formatC: Column,
                         payloadC: Column) =
    struct(widthC.as("width"), heightC.as("height"), formatC.as("format"),
      length(payloadC).as("n_bytes"))

  /** Attach the typed metadata struct (real header-decoded width/height and
    * detected format) to a binary media column — `getImageMetadata`
    * (EncodeTools.ts:1884-1893).
    */
  def withMetadata(df: DataFrame, payload: Column): DataFrame = {
    val m = udf((b: Array[Byte]) => ImageCodec.meta(b))
    df.withColumn("_m", m(payload))
      .withColumn("meta",
        metaStruct(col("_m._1"), col("_m._2"), col("_m._3"), payload))
      .drop("_m")
  }

  /** Fused transform chain: ONE decode, every raster op, ONE encode (to
    * `toFormat` or the payload's detected format). This is the scale path
    * for multi-op pipelines.
    */
  def applyOps(df: DataFrame, ops: Seq[ImageOp], toFormat: Option[String] = None): DataFrame = {
    toFormat.foreach { f =>
      if (!Formats.contains(f)) throw new InvalidCodecException(s"unknown image format '$f'")
      if (!JvmFormats.contains(f)) throw new InvalidCodecException(s"no JVM codec for '$f'")
    }
    val t = udf { (b: Array[Byte]) =>
      val fmt = toFormat.getOrElse(ImageCodec.meta(b)._3)
      val out = ops.foldLeft(ImageCodec.decode(b))(applyOp)
      ImageCodec.encode(out, fmt)
    }
    withMetadata(df.withColumn("payload", t(col("payload"))), col("payload"))
  }

  /** resizeImage (EncodeTools.ts:1795-1800): explicit dims, format kept. */
  def resize(df: DataFrame, newW: Int, newH: Int): DataFrame =
    applyOps(df, Seq(Resize(newW, newH)))

  /** cropImage (EncodeTools.ts:1761-1766) with bounds clamping. */
  def crop(df: DataFrame, x: Int, y: Int, w: Int, h: Int): DataFrame =
    applyOps(df, Seq(Crop(x, y, w, h)))

  /** adjustImageBrightness (EncodeTools.ts:1829-1834): factor in [-1, 1],
    * Jimp curve.
    */
  def adjustBrightness(df: DataFrame, factor: Double): DataFrame =
    applyOps(df, Seq(Brightness(factor)))

  /** convertImage (EncodeTools.ts:1859-1863) via the MIME maps; unknown
    * formats fail closed like InvalidFormat (EncodeTools.ts:301-310).
    */
  def convert(df: DataFrame, toFormat: String): DataFrame =
    applyOps(df, Seq.empty, Some(toFormat))

  /** Normalize EXIF camera rotation at scan time: read the orientation tag,
    * remap the raster upright, re-encode (EXIF-less). Adds the tag value as
    * `exif_orientation` and refreshes the metadata struct (dims swap for
    * the transposed orientations 5-8). Per-row pure kernel — no shuffle.
    */
  def normalizeOrientation(df: DataFrame): DataFrame = {
    val o = udf((b: Array[Byte]) => Exif.orientation(b))
    val fix = udf { (b: Array[Byte], o: Int) =>
      if (o <= 1) b
      else {
        val fmt = ImageCodec.meta(b)._3
        ImageCodec.encode(Exif.applyOrientation(ImageCodec.decode(b), o), fmt)
      }
    }
    val tagged = df.withColumn("exif_orientation", o(col("payload")))
      .withColumn("payload", fix(col("payload"), col("exif_orientation")))
    withMetadata(tagged, col("payload"))
  }

  /** Frame sampling for video-like payloads: deterministic k-of-n byte
    * slices as "frames" (the partitioning/batch shape of a real frame
    * sampler; no video codec ships in the JDK — documented stub).
    */
  def sampleFrames(df: DataFrame, k: Int): DataFrame = {
    val frames = udf { (b: Array[Byte]) =>
      val n = math.max(b.length, 1)
      (0 until k).map { i =>
        val off = (n.toLong * i / k).toInt
        val len = math.min(64, n - off)
        java.util.Arrays.copyOfRange(b, off, off + math.max(len, 0))
      }.toArray
    }
    df.withColumn("frames", frames(col("payload")))
      .withColumn("n_frames", size(col("frames")))
  }

  // ---------------- audio (REAL javax.sound.sampled WAV path) ------------

  /** Audio kernels over PCM WAV payloads — the JDK parses WAV/AIFF/AU
    * natively, so metadata, sample access and feature extraction are REAL
    * (no stub), with the same opaque-binary-column plumbing as images.
    */
  object AudioCodec {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

    /** (sample_rate, channels, n_frames) from the container header. */
    def meta(bytes: Array[Byte]): (Int, Int, Long) = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try (in.getFormat.getSampleRate.toInt, in.getFormat.getChannels, in.getFrameLength)
      finally in.close()
    }

    /** Signed 16-bit mono PCM samples (fails closed on other layouts). */
    def samples(bytes: Array[Byte]): Array[Short] = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
          f.getEncoding != AudioFormat.Encoding.PCM_SIGNED)
          throw new InvalidCodecException(
            s"expected 16-bit mono PCM, got $f")
        val raw = in.readAllBytes()
        val out = new Array[Short](raw.length / 2)
        var i = 0
        while (i < out.length) {
          val lo = raw(2 * i) & 0xff
          val hi = raw(2 * i + 1)
          out(i) = (if (f.isBigEndian) ((lo << 8) | (hi & 0xff)) else ((hi << 8) | lo)).toShort
          i += 1
        }
        out
      } finally in.close()
    }

    /** Deterministic synthetic WAV keyed by id: 16-bit mono PCM sine,
      * closed-form rate/frames/amplitude so oracles can state expected
      * metadata and RMS in plain SQL.
      */
    def synthWav(id: Long): Array[Byte] = {
      val rate = 8000
      val nFrames = 800 + (id % 100).toInt * 8 // 100-199 ms
      val amp = 8192.0
      val freq = 200.0 + (id % 20) * 50.0
      val pcm = new Array[Byte](nFrames * 2)
      var i = 0
      while (i < nFrames) {
        val v = (amp * math.sin(2 * math.Pi * freq * i / rate)).round.toInt
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Root-mean-square level of the samples, normalized to [0,1]. */
    def rms(s: Array[Short]): Double = {
      if (s.isEmpty) return 0.0
      var acc = 0.0
      var i = 0
      while (i < s.length) { val v = s(i) / 32768.0; acc += v * v; i += 1 }
      math.sqrt(acc / s.length)
    }

    /** Encode 16-bit mono PCM samples as a little-endian WAV container. */
    def encodeWav(s: Array[Short], rate: Int): Array[Byte] = {
      val pcm = new Array[Byte](s.length * 2)
      var i = 0
      while (i < s.length) {
        pcm(2 * i) = (s(i) & 0xff).toByte
        pcm(2 * i + 1) = ((s(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, s.length.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Linear-interpolation resampler. Output frame count is the exact
      * integer formula floor(n * to / from), so downstream oracles can state
      * it in plain SQL.
      */
    def resample(s: Array[Short], from: Int, to: Int): Array[Short] = {
      require(from > 0 && to > 0, s"rates $from -> $to")
      if (from == to) return s
      val nOut = ((s.length.toLong * to) / from).toInt
      val out = new Array[Short](nOut)
      var i = 0
      while (i < nOut) {
        val pos = i.toDouble * from / to
        val i0 = pos.toInt
        val frac = pos - i0
        val v0: Double = if (i0 < s.length) s(i0) else 0
        val v1: Double = if (i0 + 1 < s.length) s(i0 + 1) else v0
        out(i) = (v0 + (v1 - v0) * frac).round.toShort
        i += 1
      }
      out
    }
  }

  /** Attach (sample_rate, channels, n_frames, duration_ms, n_bytes) —
    * header-only parse, the audio analog of [[withMetadata]].
    */
  def withAudioMetadata(df: DataFrame, payload: Column): DataFrame = {
    val m = udf((b: Array[Byte]) => AudioCodec.meta(b))
    df.withColumn("_a", m(payload))
      .withColumn("audio_meta", struct(
        col("_a._1").as("sample_rate"),
        col("_a._2").as("channels"),
        col("_a._3").as("n_frames"),
        (col("_a._3") * 1000L / col("_a._1")).cast("long").as("duration_ms"),
        length(payload).as("n_bytes")))
      .drop("_a")
  }

  /** Resample WAV payloads to a target rate (decode -> linear-interp
    * resample -> re-encode), attaching the refreshed metadata struct.
    * Per-row pure kernel — no shuffle, scales embarrassingly.
    */
  def resampleAudio(df: DataFrame, toRate: Int): DataFrame = {
    val r = udf { (b: Array[Byte]) =>
      val (rate, _, _) = AudioCodec.meta(b)
      AudioCodec.encodeWav(AudioCodec.resample(AudioCodec.samples(b), rate, toRate), toRate)
    }
    withAudioMetadata(df.withColumn("payload", r(col("payload"))), col("payload"))
  }

  /** REAL audio feature extraction: per-window RMS energy profile over k
    * equal windows — the classic loudness envelope descriptor,
    * downstream-ANN-compatible like the image thumbnail.
    */
  def extractAudioFeatures(df: DataFrame, k: Int = 8): DataFrame = {
    val feat = udf { (b: Array[Byte]) =>
      val s = AudioCodec.samples(b)
      Array.tabulate(k) { w =>
        val lo = (s.length.toLong * w / k).toInt
        val hi = (s.length.toLong * (w + 1) / k).toInt
        AudioCodec.rms(java.util.Arrays.copyOfRange(s, lo, math.max(hi, lo))).toFloat
      }
    }
    df.withColumn("audio_embedding", feat(col("payload")))
  }

  /** REAL pixel feature extraction: mean-pooled 4x4 grayscale thumbnail,
    * flattened to a 16-dim float embedding in [0,1] — the classic tiny
    * descriptor; downstream ANN-compatible. (A production vision encoder
    * slots in here; the schema/batching contract is identical.)
    */
  def extractFeatures(df: DataFrame): DataFrame = {
    val feat = udf { (b: Array[Byte]) =>
      val img = ImageCodec.decode(b)
      val gw = 4; val gh = 4
      val acc = new Array[Double](gw * gh)
      val cnt = new Array[Long](gw * gh)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          val gray = (((p >> 16) & 0xff) * 299L + ((p >> 8) & 0xff) * 587L +
            (p & 0xff) * 114L) / 1000.0
          val cell = math.min(gh - 1, y * gh / img.getHeight) * gw +
            math.min(gw - 1, x * gw / img.getWidth)
          acc(cell) += gray
          cnt(cell) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(gw * gh)(i =>
        if (cnt(i) == 0) 0f else (acc(i) / cnt(i) / 255.0).toFloat)
    }
    df.withColumn("embedding", feat(col("payload")))
  }
}
