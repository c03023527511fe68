package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Resizer

/** Multimodal column operators: image / audio / video payloads as
  * opaque `binary` columns with typed metadata structs.
  *
  * The Spark-side plumbing — schemas, batch iteration shape
  * (`mapPartitions` over rows, the JVM analog of `mapInPandas`
  * batches), partitioning — is real and tested. The media kernels
  * split two ways:
  *  - images: REAL decode/resize via the [[Resizer]] (ImageIO);
  *  - audio/video: the container lacks any codec library, so frame
  *    sampling and feature extraction are deterministic STUBS
  *    (`stubbed = true` in the output struct) — the contract is the
  *    schema + plumbing, with the kernel swappable for javacv/ffmpeg.
  */
object Multimodal {

  /** image metadata struct derived by REAL decode. */
  case class ImageMeta(width: Option[Int], height: Option[Int], format: Option[String],
                       n_bytes: Option[Int], decode_error: Option[String])

  /** Decode image metadata with ImageIO; pure function → typed UDF. */
  def withImageMeta(df: DataFrame, binaryCol: String, out: String = "image_meta"): DataFrame = {
    val f = udf((bytes: Array[Byte]) => {
      if (bytes == null) ImageMeta(None, None, None, None, Some("no payload"))
      else try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null)
          ImageMeta(None, None, Resizer.sniffFormat(bytes), Some(bytes.length), Some("decode failed"))
        else
          ImageMeta(Some(img.getWidth), Some(img.getHeight),
            Resizer.sniffFormat(bytes), Some(bytes.length), None)
      } catch {
        case e: Throwable => ImageMeta(None, None, None, Some(bytes.length), Some(e.getMessage))
      }
    })
    df.withColumn(out, f(col(binaryCol)))
  }

  /** Audio features (stub kernel, real plumbing). */
  case class AudioFeatures(n_bytes: Option[Int], duration_sec_est: Option[Double],
                           fingerprint: Option[Long], stubbed: Boolean)

  /** STUB audio feature extraction: deterministic fake features
    * (byte-length-derived duration estimate + polynomial fingerprint).
    * Swap the body for a real codec (javacv) without touching the
    * plumbing: schema, batching, and partitioning stay identical.
    */
  def withAudioFeatures(df: DataFrame, binaryCol: String, out: String = "audio_features"): DataFrame = {
    val f = udf((bytes: Array[Byte]) => {
      if (bytes == null) AudioFeatures(None, None, None, stubbed = true)
      else {
        // ??? real decode — stub: assume 16kHz 16-bit mono PCM estimate
        val dur = bytes.length / 32000.0
        var h = 1125899906842597L
        var i = 0
        while (i < math.min(bytes.length, 4096)) { h = h * 31 + bytes(i); i += 1 }
        AudioFeatures(Some(bytes.length), Some(dur), Some(h), stubbed = true)
      }
    })
    df.withColumn(out, f(col(binaryCol)))
  }

  /** Video frame-sample plumbing: emits one row per sampled frame
    * index with a frame payload column. Frame extraction itself is a
    * STUB (frame payload = null, `stubbed = true`); the row fan-out,
    * schema, and partition shape are the real contract.
    */
  def sampleVideoFrames(df: DataFrame, binaryCol: String, everyNthSecond: Double = 1.0,
                        maxFrames: Int = 8): DataFrame = {
    val base = df.withColumn("_n_frames_est",
      least(greatest((octet_length(col(binaryCol)) / 100000).cast("int"), lit(1)), lit(maxFrames)))
    base.select(col("*"),
        posexplode(sequence(lit(0), col("_n_frames_est") - 1)).as(Seq("frame_idx", "_f")))
      .drop("_f", "_n_frames_est")
      .withColumn("frame_time_sec", col("frame_idx") * everyNthSecond)
      .withColumn("frame_payload", lit(null).cast(BinaryType))  // ??? real frame decode
      .withColumn("stubbed", lit(true))
  }

  /** Batched image resize over the payload column via the REAL
    * resizer — the `mapInPandas`-shaped path: one task thread per
    * partition, payloads processed in a streaming iterator.
    */
  def resizeImages(df: DataFrame, binaryCol: String, cfg: graft.config.DownloadConfig,
                   out: String = "resized"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(out, BinaryType, nullable = true))
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val res = Resizer.resizeBytes(r.getAs[Array[Byte]](idx), cfg)
        Row.fromSeq(r.toSeq :+ res.payload)
      }
    }(Encoders.row(outSchema))
  }
}
