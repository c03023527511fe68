package graft

import org.apache.spark.sql.functions._

import graft.config.DownloadConfig
import graft.operators.{Multimodal, Resizer}

/** Multimodal column plumbing: real image decode path + stubbed
  * audio/video kernels with real schema/fan-out.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def jpg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    Resizer.encode(img, "jpg", 90)
  }

  test("image meta: real decode fills dims + format; junk tagged") {
    val df = Seq((1L, jpg(64, 48)), (2L, "not an image".getBytes)).toDF("id", "payload")
    val rows = Multimodal.withImageMeta(df, "payload")
      .select("id", "image_meta.*").orderBy("id").collect()
    assert(rows(0).getInt(1) == 64 && rows(0).getInt(2) == 48)
    assert(rows(0).getString(3) == "jpg" && rows(0).isNullAt(5))
    assert(rows(1).getString(5) == "decode failed")
  }

  test("image resize over binary column via mapPartitions") {
    val df = Seq((1L, jpg(500, 300))).toDF("id", "payload")
    val out = Multimodal.resizeImages(df, "payload",
      DownloadConfig(resizeMode = "border", imageSize = 128))
    val bytes = out.select("resized").collect()(0).getAs[Array[Byte]](0)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 128 && img.getHeight == 128)
  }

  test("audio features: deterministic stub with real schema") {
    val df = Seq((1L, Array.fill[Byte](64000)(7))).toDF("id", "payload")
    val r = Multimodal.withAudioFeatures(df, "payload")
      .select("audio_features.*").collect()(0)
    assert(r.getInt(0) == 64000)
    assert(r.getDouble(1) == 2.0)       // 64000 bytes / 32000 Bps
    assert(r.getBoolean(3), "stub is marked")
  }

  test("video frame sampling fans out frame rows with schema") {
    val df = Seq((1L, Array.fill[Byte](350000)(1))).toDF("id", "payload")
    val frames = Multimodal.sampleVideoFrames(df, "payload").collect()
    assert(frames.length == 3, "350KB → 3 estimated frames")
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2))
    assert(frames.forall(_.getAs[Boolean]("stubbed")))
  }
}
