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

  test("audio features: deterministic stub for non-WAV payloads") {
    val df = Seq((1L, Array.fill[Byte](64000)(7))).toDF("id", "payload")
    val r = Multimodal.withAudioFeatures(df, "payload")
      .select("audio_features.*").collect()(0)
    assert(r.getInt(0) == 64000)
    assert(r.getDouble(1) == 2.0)       // 64000 bytes / 32000 Bps
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), "no parsed fields for non-WAV")
    assert(r.getBoolean(6), "stub is marked")
  }

  /** Golden WAV: 16 kHz, mono, 16-bit PCM, exactly 1.0 s (16000
    * samples = 32000 data bytes). Byte-for-byte canonical RIFF layout.
    */
  private def goldenWav(rate: Int = 16000, channels: Int = 1, bits: Int = 16,
                        nSamples: Int = 16000): Array[Byte] = {
    val dataLen = nSamples * channels * bits / 8
    val byteRate = rate * channels * bits / 8
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                      // PCM
      .putShort(channels.toShort)
      .putInt(rate).putInt(byteRate)
      .putShort((channels * bits / 8).toShort)
      .putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) { // 440 Hz-ish sine so bytes aren't constant
      val v = (math.sin(i * 2 * math.Pi * 440 / rate) * 16384).toShort
      bb.putShort(v); i += 1
    }
    bb.array()
  }

  test("audio features: WAV header really parsed — exact duration, stubbed=false") {
    val df = Seq((1L, goldenWav()), (2L, goldenWav(rate = 44100, channels = 2, nSamples = 22050)))
      .toDF("id", "payload")
    val rows = Multimodal.withAudioFeatures(df, "payload")
      .select(col("id"), col("audio_features.*")).orderBy("id").collect()
    val r1 = rows(0)
    assert(r1.getDouble(2) == 1.0, "16000 samples at 16kHz = exactly 1.0s")
    assert(r1.getInt(3) == 16000 && r1.getInt(4) == 1 && r1.getInt(5) == 16)
    assert(!r1.getBoolean(7), "WAV path is NOT stubbed")
    val r2 = rows(1)
    assert(r2.getDouble(2) == 0.5, "22050 stereo samples at 44.1kHz = exactly 0.5s")
    assert(r2.getInt(3) == 44100 && r2.getInt(4) == 2 && r2.getInt(5) == 16)
    assert(!r2.getBoolean(7))
  }

  /** Golden AIFF: FORM/AIFF with a COMM chunk — 44.1 kHz (the 80-bit
    * extended-float encoding of 44100 is exp=0x400E, mantissa
    * 0xAC44_0000_0000_0000), stereo, 16-bit, 22050 frames = 0.5 s.
    */
  private def goldenAiff(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 18) // big-endian default
    bb.put("FORM".getBytes("US-ASCII")).putInt(4 + 8 + 18)
      .put("AIFF".getBytes("US-ASCII"))
      .put("COMM".getBytes("US-ASCII")).putInt(18)
      .putShort(2)                       // channels
      .putInt(22050)                     // numSampleFrames
      .putShort(16)                      // bits
      .putShort(0x400E.toShort)          // 80-bit float: exponent
      .putInt(0xAC440000)                // mantissa hi (44100 << 16)
      .putInt(0)                         // mantissa lo
    bb.array()
  }

  test("audio features: AIFF COMM chunk really parsed (80-bit rate decode)") {
    val df = Seq((1L, goldenAiff())).toDF("id", "payload")
    val r = Multimodal.withAudioFeatures(df, "payload")
      .select("audio_features.*").collect()(0)
    assert(r.getDouble(1) == 0.5, "22050 frames at 44.1kHz = exactly 0.5s")
    assert(r.getInt(2) == 44100 && r.getInt(3) == 2 && r.getInt(4) == 16)
    assert(!r.getBoolean(6), "AIFF path is NOT stubbed")
  }

  test("WAV parse rejects truncated and compressed-format payloads") {
    assert(Multimodal.parseWavHeader(goldenWav().take(30)).isEmpty, "truncated header")
    val adpcm = {
      val w = goldenWav()
      w(20) = 2 // format tag 2 = ADPCM — not parseable without a codec
      w
    }
    assert(Multimodal.parseWavHeader(adpcm).isEmpty, "compressed WAV → stub path")
  }

  test("chunk walks survive crafted near-2^31 chunk sizes (no Int overflow)") {
    // a chunk size of 0x7FFFFFF0 must end the walk (cursor past EOF),
    // never wrap the offset negative into an AIOOBE
    val wav = java.nio.ByteBuffer.allocate(100).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(92).put("WAVE".getBytes("US-ASCII"))
      .put("JUNK".getBytes("US-ASCII")).putInt(0x7FFFFFF0)
      .array()
    assert(Multimodal.parseWavHeader(wav).isEmpty, "WAV walk returns None, no crash")
    val aiff = java.nio.ByteBuffer.allocate(100) // big-endian default
      .put("FORM".getBytes("US-ASCII")).putInt(92).put("AIFF".getBytes("US-ASCII"))
      .put("JUNK".getBytes("US-ASCII")).putInt(0x7FFFFFF0)
      .array()
    assert(Multimodal.parseAiffHeader(aiff).isEmpty, "AIFF walk returns None, no crash")
  }

  /** Minimal well-formed MP4: ftyp + moov(mvhd v0) with timescale
    * 1000, duration 2500 → exactly 2.5 s.
    */
  private def goldenMp4(timescale: Int = 1000, duration: Int = 2500): Array[Byte] = {
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(name.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ Array.fill[Byte](4)(0))
    val mvhdPayload = java.nio.ByteBuffer.allocate(100)
      .putInt(0)                 // version 0 + flags
      .putInt(0).putInt(0)       // ctime, mtime
      .putInt(timescale).putInt(duration)
      .array()
    val moov = box("moov", box("mvhd", mvhdPayload))
    ftyp ++ moov
  }

  test("video meta: MP4 mvhd really parsed — exact duration, stubbed=false") {
    val df = Seq((1L, goldenMp4()), (2L, Array.fill[Byte](250000)(3)))
      .toDF("id", "payload")
    val rows = Multimodal.withVideoMeta(df, "payload")
      .select(col("id"), col("video_meta.*")).orderBy("id").collect()
    val mp4 = rows(0)
    assert(mp4.getString(2) == "mp4" && mp4.getDouble(3) == 2.5 && mp4.getInt(4) == 1000)
    assert(!mp4.getBoolean(5), "MP4 container parse is NOT stubbed")
    val other = rows(1)
    assert(other.isNullAt(2) && other.getDouble(3) == 2.0, "stub estimate for non-MP4")
    assert(other.getBoolean(5))
  }

  test("MP4 parse rejects truncated/garbage payloads") {
    assert(Multimodal.parseMp4Duration(goldenMp4().take(20)).isEmpty)
    assert(Multimodal.parseMp4Duration("not a video at all".getBytes).isEmpty)
    assert(Multimodal.parseMp4Duration(goldenMp4(timescale = 0)).isEmpty, "zero timescale")
  }

  test("video frame sampling fans out frame rows with schema") {
    val df = Seq((1L, Array.fill[Byte](350000)(1))).toDF("id", "payload")
    val frames = Multimodal.sampleVideoFrames(df, "payload").collect()
    assert(frames.length == 3, "350KB → 3 estimated frames")
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2))
    assert(frames.forall(_.getAs[Boolean]("stubbed")))
  }
}
