package graft

import graft.operators.{Mp3Bitstream, Multimodal}
import org.apache.spark.sql.functions._

/** Layer III side-info parse + CRC verification against hand-built
  * golden frames (encoder side lives only in this test, field-by-field
  * off the public frame syntax — the FLAC fixture discipline).
  */
class Mp3BitstreamSpec extends SparkSpec {
  import spark.implicits._

  /** MSB-first bit writer for composing side-info blocks. */
  private final class BitWriter {
    private val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def put(v: Int, n: Int): this.type = {
      (n - 1 to 0 by -1).foreach(i => bits += ((v >> i) & 1))
      this
    }
    def bytes: Array[Byte] = {
      require(bits.length % 8 == 0, s"${bits.length} bits")
      bits.grouped(8).map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    }
  }

  /** Mono MPEG-1 Layer III side info with planted values:
    * granule 0 long-block (global_gain 210), granule 1 short-block
    * (block_type 2, global_gain 100).
    */
  private def mono17SideInfo(): Array[Byte] = {
    val w = new BitWriter
    w.put(5, 9)   // main_data_begin
    w.put(0, 5)   // private
    w.put(0, 4)   // scfsi
    // granule 0: long block
    w.put(123, 12).put(45, 9).put(210, 8).put(7, 4).put(0, 1)
    w.put(1, 5).put(2, 5).put(3, 5).put(4, 4).put(3, 3) // tables + regions
    w.put(0, 1).put(1, 1).put(0, 1) // preflag, scalefac_scale, count1
    // granule 1: window switching, short blocks
    w.put(200, 12).put(10, 9).put(100, 8).put(2, 4).put(1, 1)
    w.put(2, 2).put(0, 1)            // block_type=2, mixed=0
    w.put(4, 5).put(5, 5)            // tables x2
    w.put(1, 3).put(2, 3).put(3, 3)  // subblock gains
    w.put(0, 1).put(0, 1).put(1, 1)
    val b = w.bytes
    assert(b.length == 17)
    b
  }

  /** One 417-byte MPEG-1 mono 128 kbps 44.1 kHz frame; CRC present
    * unless `protection = false`; optionally corrupt the side info
    * AFTER computing the CRC.
    */
  private def mpeg1Frame(protection: Boolean = true, corrupt: Boolean = false): Array[Byte] = {
    val f = new Array[Byte](417)
    f(0) = 0xFF.toByte
    f(1) = (if (protection) 0xFA else 0xFB).toByte
    f(2) = 0x90.toByte // 128 kbps, 44.1 kHz, no padding
    f(3) = 0xC0.toByte // mono
    val side = mono17SideInfo()
    val sideOff = if (protection) 6 else 4
    side.copyToArray(f, sideOff)
    if (protection) {
      val crc = Mp3Bitstream.crc16(f, Seq((2, 4), (sideOff, sideOff + 17)))
      f(4) = (crc >> 8).toByte; f(5) = crc.toByte
    }
    if (corrupt) f(sideOff + 3) = (f(sideOff + 3) ^ 0x40).toByte
    f
  }

  /** One 208-byte MPEG-2 (LSF) mono 64 kbps 22.05 kHz frame, no CRC. */
  private def lsfFrame(): Array[Byte] = {
    val f = new Array[Byte](208)
    f(0) = 0xFF.toByte; f(1) = 0xF3.toByte // version=2, layer III, no CRC
    f(2) = 0x80.toByte                     // 64 kbps LSF, 22.05 kHz
    f(3) = 0xC0.toByte
    val w = new BitWriter
    w.put(17, 8)  // main_data_begin (8 bits in LSF)
    w.put(0, 1)   // private (mono)
    w.put(321, 12).put(99, 9).put(180, 8).put(300, 9).put(0, 1)
    w.put(7, 5).put(8, 5).put(9, 5).put(2, 4).put(1, 3)
    w.put(1, 1).put(0, 1) // scalefac_scale, count1 (no preflag in LSF)
    val side = w.bytes
    assert(side.length == 9)
    side.copyToArray(f, 4)
    f
  }

  test("golden MPEG-1 frames: side info fields, CRC verdict, aggregate stats") {
    val payload = mpeg1Frame() ++ mpeg1Frame()
    val fs = Mp3Bitstream.parseFrames(payload).get
    assert(fs.length == 2)
    val f0 = fs(0)
    assert(f0.version == 3 && f0.sampleRate == 44100 && f0.channels == 1 && f0.bitrateKbps == 128)
    assert(f0.crcOk.contains(true), "stored CRC must verify")
    assert(f0.mainDataBegin == 5)
    val Vector(g0, g1) = f0.granules
    assert(g0 == Mp3Bitstream.Granule(123, 45, 210, windowSwitching = false, 0, mixedBlock = false))
    assert(g1 == Mp3Bitstream.Granule(200, 10, 100, windowSwitching = true, 2, mixedBlock = false))
    val st = Mp3Bitstream.stats(payload).get
    assert(st.frames == 2 && st.crcProtected == 2 && st.crcValid == 2)
    assert(st.gainMean == 155.0 && st.gainStd == 55.0) // gains 210,100 per frame
    assert(st.shortBlockFrac == 0.5, "granule 1 of each frame is short-block")
    assert(!st.vbr)
  }

  test("a corrupted side-info bit fails the CRC; protection-off frames carry no verdict") {
    val corrupted = mpeg1Frame(corrupt = true) ++ mpeg1Frame()
    val fs = Mp3Bitstream.parseFrames(corrupted).get
    assert(fs(0).crcOk.contains(false) && fs(1).crcOk.contains(true))
    assert(Mp3Bitstream.stats(corrupted).get.crcValid == 1)
    val noCrc = mpeg1Frame(protection = false) ++ mpeg1Frame(protection = false)
    val fs2 = Mp3Bitstream.parseFrames(noCrc).get
    assert(fs2.forall(_.crcOk.isEmpty))
    val st2 = Mp3Bitstream.stats(noCrc).get
    assert(st2.crcProtected == 0 && st2.crcValid == 0)
    // the corrupted bit sits inside granule 0's fields — the parse
    // still returns the (corrupted) values, CRC is the verdict
    assert(fs(0).granules(0) !=
      Mp3Bitstream.Granule(123, 45, 210, windowSwitching = false, 0, mixedBlock = false))
  }

  test("LSF (MPEG-2) layout: 8-bit main_data_begin, one granule, 9-bit scalefac_compress") {
    val fs = Mp3Bitstream.parseFrames(lsfFrame() ++ lsfFrame()).get
    assert(fs.length == 2)
    val f = fs(0)
    assert(f.version == 2 && f.sampleRate == 22050 && f.bitrateKbps == 64)
    assert(f.mainDataBegin == 17)
    assert(f.granules == Vector(
      Mp3Bitstream.Granule(321, 99, 180, windowSwitching = false, 0, mixedBlock = false)))
  }

  test("acceptance mirrors the metadata walk: one frame or garbage is None") {
    assert(Mp3Bitstream.parseFrames(mpeg1Frame()).isEmpty, "one frame is not evidence")
    assert(Mp3Bitstream.parseFrames("not an mp3 payload at all".getBytes).isEmpty)
    assert(Mp3Bitstream.parseFrames(Array.empty[Byte]).isEmpty)
  }

  /** Parameterized side-info writer for the generative round-trip:
    * tables/regions/scfsi pinned to zero (the parser skips them), the
    * signal-bearing fields planted from the generator.
    */
  private def frameWith(grans: Seq[Mp3Bitstream.Granule], stereo: Boolean): Array[Byte] = {
    val w = new BitWriter
    w.put(0, 9)                           // main_data_begin
    w.put(0, if (stereo) 3 else 5)        // private bits
    w.put(0, if (stereo) 8 else 4)        // scfsi
    grans.foreach { g =>
      w.put(g.part23Length, 12).put(g.bigValues, 9).put(g.globalGain, 8)
      w.put(0, 4)                         // scalefac_compress
      w.put(if (g.windowSwitching) 1 else 0, 1)
      if (g.windowSwitching) {
        w.put(g.blockType, 2).put(if (g.mixedBlock) 1 else 0, 1)
        w.put(0, 5).put(0, 5)             // table_select x2
        w.put(0, 3).put(0, 3).put(0, 3)   // subblock gains
      } else {
        w.put(0, 5).put(0, 5).put(0, 5)   // table_select x3
        w.put(0, 4).put(0, 3)             // region counts
      }
      w.put(0, 1).put(0, 1).put(0, 1)     // preflag, scalefac_scale, count1
    }
    val side = w.bytes
    assert(side.length == (if (stereo) 32 else 17))
    val f = new Array[Byte](417)
    f(0) = 0xFF.toByte; f(1) = 0xFA.toByte; f(2) = 0x90.toByte
    f(3) = (if (stereo) 0x00 else 0xC0).toByte
    side.copyToArray(f, 6)
    val crc = Mp3Bitstream.crc16(f, Seq((2, 4), (6, 6 + side.length)))
    f(4) = (crc >> 8).toByte; f(5) = crc.toByte
    f
  }

  test("generative round-trip: random granule fields survive write→parse, mono and stereo") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val granGen = for {
      p23 <- Gen.choose(0, 4095)
      bv <- Gen.choose(0, 511)
      gg <- Gen.choose(0, 255)
      ws <- Gen.oneOf(true, false)
      bt <- Gen.choose(1, 3) // block_type 0 is reserved under switching
      mixed <- Gen.oneOf(true, false)
    } yield Mp3Bitstream.Granule(p23, bv, gg, ws,
      if (ws) bt else 0, if (ws) mixed else false)
    for (seed <- 1L to 20L) {
      val stereo = seed % 2 == 0
      val n = if (stereo) 4 else 2 // 2 granules × channels
      val grans = sample(Gen.listOfN(n, granGen), seed)
      val payload = frameWith(grans, stereo) ++ frameWith(grans, stereo)
      val fs = Mp3Bitstream.parseFrames(payload).get
      assert(fs.length == 2 && fs.head.channels == (if (stereo) 2 else 1))
      assert(fs.head.granules == grans.toVector, s"seed $seed stereo=$stereo")
      assert(fs.head.crcOk.contains(true), s"seed $seed CRC")
    }
  }

  test("withMp3Bitstream: struct plumbing over a binary column") {
    val mp3 = mpeg1Frame() ++ mpeg1Frame() ++ mpeg1Frame()
    val df = Seq((1L, mp3), (2L, "plain text".getBytes)).toDF("id", "payload")
    val rows = Multimodal.withMp3Bitstream(df, "payload")
      .select(col("id"), col("mp3_bitstream.*")).orderBy("id").collect()
    assert(rows(0).getAs[Boolean]("is_mp3"))
    assert(rows(0).getAs[Int]("frames") == 3)
    assert(rows(0).getAs[Double]("gain_mean") == 155.0)
    assert(rows(0).getAs[Double]("short_block_frac") == 0.5)
    assert(rows(0).getAs[Boolean]("vbr") == false)
    assert(!rows(1).getAs[Boolean]("is_mp3"))
    assert(rows(1).isNullAt(rows(1).fieldIndex("frames")))
  }
}
