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

  /** Audio features: REAL header parse for RIFF/WAVE payloads,
    * deterministic stub for everything else (`stubbed = true`).
    */
  case class AudioFeatures(n_bytes: Option[Int], duration_sec_est: Option[Double],
                           sample_rate: Option[Int], channels: Option[Int],
                           bits_per_sample: Option[Int],
                           fingerprint: Option[Long], stubbed: Boolean)

  /** Parsed `fmt ` + `data` chunks of a RIFF/WAVE container, or None
    * if the payload is not a well-formed WAV. PCM (format 1) and IEEE
    * float (format 3) are accepted — duration is EXACT from the data
    * chunk length (`dataLen / byteRate`), no codec needed; compressed
    * WAV formats (ADPCM, mp3-in-wav) are rejected → stub path.
    */
  private[graft] def parseWavHeader(b: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    def u16(o: Int) = ((b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8))
    def u32(o: Int) = ((b(o) & 0xFF).toLong | ((b(o + 1) & 0xFF).toLong << 8) |
      ((b(o + 2) & 0xFF).toLong << 16) | ((b(o + 3) & 0xFF).toLong << 24))
    def tag(o: Int, s: String) = b.length >= o + 4 && s.indices.forall(i => b(o + i) == s(i).toByte)
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    // chunk walk: fmt and data can appear in any order with extension
    // chunks (LIST, fact) between them. The offset is a Long: a
    // crafted u32 chunk size near 2^31 must walk the cursor PAST the
    // payload (ending the loop), never wrap it negative into an AIOOBE
    var offL = 12L
    var fmt: Option[(Int, Int, Int, Long)] = None // (format, channels, rate, byteRate)
    var dataLen: Option[Long] = None
    while (offL + 8 <= b.length && (fmt.isEmpty || dataLen.isEmpty)) {
      val off = offL.toInt
      val size = u32(off + 4)
      if (tag(off, "fmt ") && off + 24 <= b.length) {
        fmt = Some((u16(off + 8), u16(off + 10), u32(off + 12).toInt, u32(off + 16)))
      } else if (tag(off, "data")) {
        // size may overrun a truncated payload — clamp to real bytes
        dataLen = Some(math.min(size, (b.length - off - 8).toLong))
      }
      offL += 8 + size + (size & 1) // chunks are word-aligned
    }
    for {
      (format, ch, rate, byteRate) <- fmt
      dl <- dataLen
      if (format == 1 || format == 3) && ch > 0 && rate > 0 && byteRate > 0
    } yield {
      val bits = (byteRate * 8 / (rate.toLong * ch)).toInt
      (rate, ch, bits, dl.toDouble / byteRate)
    }
  }

  /** Parsed `COMM` chunk of an AIFF container (big-endian sibling of
    * WAV): (sampleRate, channels, bits, durationSec). The sample rate
    * is an 80-bit IEEE 754 extended float per the AIFF spec — decoded
    * exactly for the realistic exponent range.
    */
  private[graft] def parseAiffHeader(b: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    def u16(o: Int) = ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    def u32(o: Int) = ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    def tag(o: Int, s: String) = b.length >= o + 4 && s.indices.forall(i => b(o + i) == s(i).toByte)
    if (b.length < 38 || !tag(0, "FORM") || !(tag(8, "AIFF") || tag(8, "AIFC"))) return None
    // Long cursor: huge crafted chunk sizes end the walk instead of
    // wrapping negative (same rationale as the WAV walk above)
    var offL = 12L
    while (offL + 8 <= b.length) {
      val off = offL.toInt
      val size = u32(off + 4)
      if (tag(off, "COMM") && off + 8 + 18 <= b.length) {
        val ch = u16(off + 8)
        val nFrames = u32(off + 10)
        val bits = u16(off + 14)
        // 80-bit extended float: 1 sign + 15 exponent (bias 16383) +
        // 64-bit mantissa with explicit integer bit
        val exp = u16(off + 16) & 0x7FFF
        val mantHi = u32(off + 18)
        val mantLo = u32(off + 22)
        val mant = (mantHi.toDouble * 4294967296.0) + mantLo.toDouble
        val rate = mant * math.pow(2.0, exp - 16383 - 63)
        val rateI = math.round(rate).toInt
        return if (ch > 0 && rateI > 0) Some((rateI, ch, bits, nFrames.toDouble / rateI)) else None
      }
      offL += 8 + size + (size & 1)
    }
    None
  }

  /** Audio feature extraction: WAV/PCM payloads are REALLY parsed
    * (sample rate, channels, bit depth, exact duration — a pure
    * header read, no codec dependency, `stubbed = false`); any other
    * format falls back to the deterministic stub estimate
    * (`stubbed = true`) — swap that branch for a real codec (javacv)
    * without touching the plumbing: schema, batching, and
    * partitioning stay identical.
    */
  def withAudioFeatures(df: DataFrame, binaryCol: String, out: String = "audio_features"): DataFrame = {
    val f = udf((bytes: Array[Byte]) => {
      if (bytes == null) AudioFeatures(None, None, None, None, None, None, stubbed = true)
      else {
        var h = 1125899906842597L
        var i = 0
        while (i < math.min(bytes.length, 4096)) { h = h * 31 + bytes(i); i += 1 }
        parseWavHeader(bytes).orElse(parseAiffHeader(bytes)) match {
          case Some((rate, ch, bits, dur)) =>
            AudioFeatures(Some(bytes.length), Some(dur), Some(rate), Some(ch), Some(bits),
              Some(h), stubbed = false)
          case None =>
            // stub estimate: assume 16kHz 16-bit mono PCM
            AudioFeatures(Some(bytes.length), Some(bytes.length / 32000.0),
              None, None, None, Some(h), stubbed = true)
        }
      }
    })
    df.withColumn(out, f(col(binaryCol)))
  }

  /** Video container metadata (real header parse, stub-free for MP4). */
  case class VideoMeta(n_bytes: Option[Int], container: Option[String],
                       duration_sec: Option[Double], timescale: Option[Int],
                       stubbed: Boolean)

  /** Parse an ISO BMFF (MP4/MOV) `moov/mvhd` box for (duration_sec,
    * timescale) — a pure big-endian box walk, no codec needed. Returns
    * None unless the payload is a well-formed MP4 with an mvhd box.
    */
  private[graft] def parseMp4Duration(b: Array[Byte]): Option[(Double, Int)] = {
    def u32(o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) | ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def typ(o: Int): String = new String(b, o + 4, 4, "US-ASCII")
    // walk boxes in [start, end) looking for `name`; returns (payload
    // offset, payload end) of the first match
    def find(start: Int, end: Int, name: String): Option[(Int, Int)] = {
      var off = start
      while (off + 8 <= end) {
        val size0 = u32(off)
        val (size, hdr) =
          if (size0 == 1 && off + 16 <= end) (u64(off + 8), 16)
          else if (size0 == 0) ((end - off).toLong, 8) // box extends to EOF
          else (size0, 8)
        if (size < hdr || off + size > end || size > Int.MaxValue) return None
        if (typ(off) == name) return Some((off + hdr, off + size.toInt))
        off += size.toInt
      }
      None
    }
    if (b.length < 16) return None
    // MP4 sanity: a leading ftyp (or styp) box
    val head = typ(0)
    if (head != "ftyp" && head != "styp") return None
    for {
      (moovStart, moovEnd) <- find(0, b.length, "moov")
      (mvhd, mvhdEnd) <- find(moovStart, moovEnd, "mvhd")
      if mvhd + 4 <= mvhdEnd
      version = b(mvhd) & 0xFF
      result <- version match {
        // timescale must also fit the Int it is reported as — a u32
        // above 2^31 would otherwise narrow to a negative value
        case 0 if mvhd + 20 <= mvhdEnd =>
          val scale = u32(mvhd + 12); val dur = u32(mvhd + 16)
          if (scale > 0 && scale <= Int.MaxValue) Some((dur.toDouble / scale, scale.toInt)) else None
        case 1 if mvhd + 32 <= mvhdEnd =>
          val scale = u32(mvhd + 20); val dur = u64(mvhd + 24)
          if (scale > 0 && scale <= Int.MaxValue) Some((dur.toDouble / scale, scale.toInt)) else None
        case _ => None
      }
    } yield result
  }

  /** Video metadata extraction: MP4/MOV containers are REALLY parsed
    * (mvhd duration + timescale, `stubbed = false`); other containers
    * keep the stub estimate, swappable for a real demuxer.
    */
  def withVideoMeta(df: DataFrame, binaryCol: String, out: String = "video_meta"): DataFrame = {
    val f = udf((bytes: Array[Byte]) => {
      if (bytes == null) VideoMeta(None, None, None, None, stubbed = true)
      else parseMp4Duration(bytes) match {
        case Some((dur, scale)) =>
          VideoMeta(Some(bytes.length), Some("mp4"), Some(dur), Some(scale), stubbed = false)
        case None =>
          // stub estimate: ~1 Mbit/s payload
          VideoMeta(Some(bytes.length), None, Some(bytes.length / 125000.0), None, stubbed = true)
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
