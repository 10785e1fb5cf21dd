package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class MediaOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def media = {
    import spark.implicits._
    val df = Seq(
      (1L, "payload-one-bytes"), (2L, "x"), (3L, "another fake image payload"))
      .toDF("doc_id", "t")
      .select(col("doc_id"), col("t").cast("binary").as("payload"))
    MediaOps.withMetadata(df, col("payload"), lit("png"))
  }

  test("metadata is deterministic and sane") {
    val m1 = media.select("doc_id", "meta.width", "meta.height", "meta.n_bytes")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    val m2 = media.select("doc_id", "meta.width", "meta.height", "meta.n_bytes")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(m1 == m2)
    m1.foreach { case (_, w, h, n) =>
      assert(w >= 64 && w < 64 + 1024 && h >= 64 && h < 64 + 1024 && n > 0)
    }
  }

  test("resize/crop/brightness/convert update metadata correctly") {
    val out = MediaOps.convert(
      MediaOps.adjustBrightness(
        MediaOps.crop(MediaOps.resize(media, 256, 256), 200, 200, 128, 128),
        -0.5),
      "webp").select("meta.width", "meta.height", "meta.format").collect()
    out.foreach { r =>
      assert(r.getInt(0) == 56, "crop clamps to 256-200")
      assert(r.getInt(1) == 56)
      assert(r.getString(2) == "webp")
    }
    intercept[InvalidCodecException](MediaOps.convert(media, "bmp"))
    intercept[IllegalArgumentException](MediaOps.adjustBrightness(media, 2.0))
  }

  test("frame sampling + feature extraction shapes") {
    val out = MediaOps.extractFeatures(MediaOps.sampleFrames(media, 4), dim = 8)
      .select("n_frames", "embedding").collect()
    out.foreach { r =>
      assert(r.getInt(0) == 4)
      assert(r.getSeq[Float](1).length == 8)
      r.getSeq[Float](1).foreach(f => assert(f >= -1f && f <= 1f))
    }
  }

  test("mime maps are mutually inverse") {
    MediaOps.Formats.foreach { f =>
      assert(MediaOps.MimeFormat(MediaOps.FormatMime(f)) == f)
    }
  }
}
