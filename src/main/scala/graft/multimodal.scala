package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines, mirroring the reference's image operator family
  * (cropImage/resizeImage/adjustImageBrightness/convertImage/
  * getImageMetadata, /root/reference/src/EncodeTools.ts:1761-1893).
  *
  * Media payloads are opaque `binary` columns + a typed metadata struct
  * (width, height, format, n_bytes). The Spark-side plumbing — schema,
  * batch shape, partition-local transforms, format dispatch via the same
  * MIME-map discipline as the reference (`ImageFormatMimeTypes`,
  * EncodeTools.ts:379-386) — is real and tested.
  *
  * STUB BOUNDARY: this sandbox ships no image/audio codecs, so the actual
  * pixel decode (the reference delegates to Jimp) is replaced by
  * `StubCodec`, a deterministic pure function of the payload bytes. Every
  * transform's metadata arithmetic (crop bounds, resize dims, brightness
  * clamping) is real; swap `StubCodec` for a JNI/ImageIO decoder to go to
  * production.
  */
object MediaOps {

  val Formats: Seq[String] = Seq("png", "jpeg", "webp", "avif", "tiff", "gif")
  val FormatMime: Map[String, String] = Formats.map(f =>
    f -> (if (f == "jpeg") "image/jpeg" else s"image/$f")).toMap
  val MimeFormat: Map[String, String] = FormatMime.map(_.swap)

  /** Deterministic stand-in for a real image decoder: derives dimensions
    * and a "pixel digest" purely from the payload bytes. ??? in spirit —
    * replace with a real codec outside the sandbox.
    */
  object StubCodec {
    def width(bytes: Array[Byte]): Int =
      64 + (math.abs(Checksum.xxh64(bytes, 1L)) % 1024).toInt
    def height(bytes: Array[Byte]): Int =
      64 + (math.abs(Checksum.xxh64(bytes, 2L)) % 1024).toInt
    def pixelDigest(bytes: Array[Byte]): Long = Checksum.xxh64(bytes, 3L)

    /** "Re-encode" after a transform: deterministic new payload whose
      * content commits to the op + params (so lineage is verifiable).
      */
    def transform(bytes: Array[Byte], op: String, params: String): Array[Byte] = {
      val tag = s"$op($params)".getBytes("UTF-8")
      val out = new Array[Byte](bytes.length + tag.length)
      System.arraycopy(bytes, 0, out, 0, bytes.length)
      System.arraycopy(tag, 0, out, bytes.length, tag.length)
      out
    }
  }

  /** Attach the typed metadata struct to a binary media column —
    * `getImageMetadata` (EncodeTools.ts:1884-1893).
    */
  def withMetadata(df: DataFrame, payload: Column, format: Column): DataFrame = {
    val w = udf((b: Array[Byte]) => StubCodec.width(b))
    val h = udf((b: Array[Byte]) => StubCodec.height(b))
    df.withColumn("meta", struct(
      w(payload).as("width"),
      h(payload).as("height"),
      format.as("format"),
      length(payload).as("n_bytes")))
  }

  /** Resize: metadata arithmetic is real; pixel work is the stub. Mirrors
    * resizeImage (EncodeTools.ts:1795-1800): explicit dims, format kept.
    */
  def resize(df: DataFrame, newW: Int, newH: Int): DataFrame = {
    val t = udf((b: Array[Byte]) => StubCodec.transform(b, "resize", s"$newW,$newH"))
    df.withColumn("payload", t(col("payload")))
      .withColumn("meta", struct(
        lit(newW).as("width"), lit(newH).as("height"),
        col("meta.format").as("format"),
        length(col("payload")).as("n_bytes")))
  }

  /** Crop with real bounds clamping (cropImage, EncodeTools.ts:1761-1766). */
  def crop(df: DataFrame, x: Int, y: Int, w: Int, h: Int): DataFrame = {
    val t = udf((b: Array[Byte]) => StubCodec.transform(b, "crop", s"$x,$y,$w,$h"))
    df.withColumn("payload", t(col("payload")))
      .withColumn("meta", struct(
        least(lit(w), greatest(col("meta.width") - x, lit(0))).as("width"),
        least(lit(h), greatest(col("meta.height") - y, lit(0))).as("height"),
        col("meta.format").as("format"),
        length(col("payload")).as("n_bytes")))
  }

  /** Brightness factor with clamping (adjustImageBrightness,
    * EncodeTools.ts:1829-1834): factor in [-1, 1].
    */
  def adjustBrightness(df: DataFrame, factor: Double): DataFrame = {
    require(factor >= -1.0 && factor <= 1.0, s"brightness factor $factor")
    val t = udf((b: Array[Byte]) => StubCodec.transform(b, "brightness", f"$factor%.3f"))
    df.withColumn("payload", t(col("payload")))
      .withColumn("meta", struct(
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        length(col("payload")).as("n_bytes")))
  }

  /** Format conversion via the MIME maps (convertImage,
    * EncodeTools.ts:1859-1863); unknown formats fail closed like
    * InvalidFormat (EncodeTools.ts:301-310).
    */
  def convert(df: DataFrame, toFormat: String): DataFrame = {
    if (!Formats.contains(toFormat))
      throw new InvalidCodecException(s"unknown image format '$toFormat'")
    val t = udf((b: Array[Byte]) => StubCodec.transform(b, "convert", toFormat))
    df.withColumn("payload", t(col("payload")))
      .withColumn("meta", struct(
        col("meta.width").as("width"), col("meta.height").as("height"),
        lit(toFormat).as("format"),
        length(col("payload")).as("n_bytes")))
  }

  /** Frame sampling for video-like payloads: deterministic k-of-n byte
    * slices as "frames" (the partitioning/batch shape of a real frame
    * sampler, with the decoder stubbed).
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

  /** Feature extraction stub: fixed-width deterministic "embedding" from
    * payload bytes (real pipelines put a vision encoder here; the schema,
    * batching and downstream ANN compatibility are what we exercise).
    */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val feat = udf { (b: Array[Byte]) =>
      Array.tabulate(dim)(i =>
        (Checksum.xxh64(b, 100L + i) % 1000).toFloat / 1000f)
    }
    df.withColumn("embedding", feat(col("payload")))
  }
}
