package graft

import graft.operators.Multimodal

/** Deterministic seeded fuzz over every binary parser: 100 TB of
  * crawled data WILL present these with garbage, truncations, and
  * adversarial bit patterns, and the contract everywhere is TOTALITY —
  * return None / the stub estimate, never throw, never hang, never
  * allocate unboundedly. Three corpora per parser:
  *  (1) pure random bytes at assorted sizes,
  *  (2) golden fixtures with random single-byte mutations (valid
  *      framing, corrupted interiors — the hardest class), and
  *  (3) golden fixtures truncated at every prefix length.
  * All seeds fixed — failures reproduce exactly.
  */
class ParserFuzzSpec extends SparkSpec {

  private val rng = new scala.util.Random(20260814L)

  private def goldenWav(): Array[Byte] = {
    val n = 256
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + n * 2).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes).putInt(n * 2)
    (0 until n).foreach(i => bb.putShort((math.sin(i * 0.3) * 10000).toShort))
    bb.array()
  }

  private def mutations(golden: Array[Byte], count: Int): Iterator[Array[Byte]] =
    Iterator.tabulate(count) { _ =>
      val m = golden.clone()
      val flips = 1 + rng.nextInt(4)
      (0 until flips).foreach { _ =>
        m(rng.nextInt(m.length)) = (rng.nextInt(256) - 128).toByte
      }
      m
    }

  private def truncations(golden: Array[Byte]): Iterator[Array[Byte]] =
    Iterator.range(0, golden.length, math.max(1, golden.length / 96))
      .map(golden.take)

  private def randoms(count: Int): Iterator[Array[Byte]] =
    Iterator.tabulate(count) { i =>
      val b = new Array[Byte](i % 512 + 1)
      rng.nextBytes(b)
      b
    }

  /** Drive one parser through all three corpora; the assertion is
    * simply that every call RETURNS (any throw fails the test).
    */
  private def total[T](name: String, golden: Array[Byte], parse: Array[Byte] => T): Unit = {
    (randoms(300) ++ mutations(golden, 400) ++ truncations(golden))
      .foreach { b =>
        try parse(b)
        catch {
          case e: Throwable =>
            fail(s"$name threw ${e.getClass.getSimpleName}: ${e.getMessage} " +
              s"on ${b.length} bytes (prefix ${b.take(16).map("%02x".format(_)).mkString})")
        }
      }
  }

  test("decodePcm is total under fuzz (WAV golden)") {
    total("decodePcm/wav", goldenWav(), Multimodal.decodePcm(_))
  }

  test("decodePcm is total under fuzz (AIFF golden)") {
    val n = 64
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 18 + 8 + 8 + n * 2)
    bb.put("FORM".getBytes).putInt(4 + 8 + 18 + 8 + 8 + n * 2).put("AIFF".getBytes)
      .put("COMM".getBytes).putInt(18).putShort(1).putInt(n).putShort(16)
      .putShort(0x400B.toShort).putInt(0xFA000000).putInt(0)
      .put("SSND".getBytes).putInt(8 + n * 2).putInt(0).putInt(0)
    (0 until n).foreach(i => bb.putShort((i * 321).toShort))
    total("decodePcm/aiff", bb.array(), Multimodal.decodePcm(_))
  }

  test("FLAC frame decoder is total under fuzz") {
    // a small real container: STREAMINFO + one CONSTANT frame
    val golden = {
      // hand-rolled: reuse the layout MultimodalSpec's fixtures use
      val si = new Array[Byte](34)
      si(10) = 0x01; si(11) = 0xF4.toByte; si(12) = 0x01 // 8000 Hz, mono... rate 20 bits
      si(13) = 0xF0.toByte
      si(17) = 0x10 // 16 total samples
      val head = Array[Byte]('f', 'L', 'a', 'C', 0x80.toByte, 0, 0, 34) ++ si
      // frame: sync+header built byte-precise (see MultimodalSpec);
      // here a mutated/truncated stream only needs to be REJECTED
      // gracefully, so a hand-approximate frame body is fine
      val frame = Array[Byte](0xFF.toByte, 0xF8.toByte, 0x69.toByte, 0x08, 0x00, 0x0F,
        0x42, 0x00, 0x00, 0x00, 0x00, 0x00)
      head ++ frame
    }
    total("decodePcm/flac", golden, Multimodal.decodePcm(_))
  }

  test("MP4 demux + frame metadata parsers are total under fuzz") {
    // minimal mp4: ftyp + mdat + moov skeleton (mutations will shred it)
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(name.getBytes).put(payload)
      bb.array()
    }
    def be32(vs: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length); vs.foreach(bb.putInt); bb.array()
    }
    val stbl = box("stbl",
      box("stsd", be32(0, 1) ++ be32(16) ++ "jpeg".getBytes ++ Array.fill[Byte](8)(0)) ++
        box("stts", be32(0, 1, 2, 1000)) ++ box("stsc", be32(0, 1, 1, 2, 1)) ++
        box("stsz", be32(0, 0, 2, 40, 40)) ++ box("stco", be32(0, 1, 16)))
    val mdia = box("mdia",
      box("mdhd", be32(0, 0, 0, 1000, 2000) ++ Array.fill[Byte](4)(0)) ++
        box("hdlr", be32(0, 0) ++ "vide".getBytes ++ Array.fill[Byte](13)(0)) ++
        box("minf", stbl))
    val golden = box("ftyp", "isom".getBytes ++ Array.fill[Byte](4)(0)) ++
      box("mdat", Array.fill[Byte](80)(3)) ++
      box("moov", box("mvhd", be32(0, 0, 0, 1000, 2000) ++ Array.fill[Byte](80)(0)) ++
        box("trak", mdia))
    total("parseMp4Samples", golden, (b: Array[Byte]) => Multimodal.parseMp4Samples(b))
    total("parseMp4Duration", golden, (b: Array[Byte]) => Multimodal.parseMp4Duration(b))
  }

  test("SPS / MP3 / MKV / FLAC-streaminfo parsers are total under fuzz") {
    val sps = Array[Byte](0x67, 66, 0, 30, (0xAC & 0xFF).toByte, 0x1B, 0x58.toByte, 0x21)
    total("parseH264SpsDims", sps, (b: Array[Byte]) => Multimodal.parseH264SpsDims(b))
    val mp3 = {
      val frame = new Array[Byte](417)
      frame(0) = 0xFF.toByte; frame(1) = 0xFB.toByte; frame(2) = 0x90.toByte; frame(3) = 0x40
      Array.fill(3)(frame).flatten
    }
    total("parseMp3", mp3, (b: Array[Byte]) => Multimodal.parseMp3(b))
    total("Mp3Bitstream.parseFrames", mp3,
      (b: Array[Byte]) => graft.operators.Mp3Bitstream.parseFrames(b))
    total("Mp3Bitstream.stats", mp3,
      (b: Array[Byte]) => graft.operators.Mp3Bitstream.stats(b))
    val mkv = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte, 0x84.toByte, 0x42, 0x82.toByte, 0x84.toByte, 'w', 'e', 'b', 'm')
    total("parseMkvDuration", mkv, (b: Array[Byte]) => Multimodal.parseMkvDuration(b))
    total("parseFlacStreamInfo", Array[Byte]('f', 'L', 'a', 'C', 0x80.toByte, 0, 0, 34) ++ new Array[Byte](34),
      (b: Array[Byte]) => Multimodal.parseFlacStreamInfo(b))
    total("parseWavHeader", goldenWav(), (b: Array[Byte]) => Multimodal.parseWavHeader(b))
    total("parseAiffHeader", goldenWav(), (b: Array[Byte]) => Multimodal.parseAiffHeader(b))
  }
}
