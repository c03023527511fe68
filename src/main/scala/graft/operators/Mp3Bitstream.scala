package graft.operators

/** MPEG Layer III bitstream-domain analysis WITHOUT sample decode —
  * everything in the frame that is algorithmic public spec (ISO
  * 11172-3 §2.4 frame syntax / CRC; ISO 13818-3 LSF layout) and needs
  * none of the spec's designed constant tables.
  *
  * Full Layer III SAMPLE decode is formally out of scope in this
  * container (DEVIATIONS #9): the Huffman code tables (Annex B.7) and
  * the synthesis prototype window (Annex B.3) are ~2k of arbitrary
  * designed constants that exist only as data in the standard — unlike
  * FLAC, whose decode path is fully algorithmic (Rice codes, fixed
  * predictors, CRC polynomials) and therefore reconstructible and
  * self-verifying from the spec text. A misremembered table decodes
  * confidently into silently-wrong samples with no in-container ground
  * truth to catch it; the honest contract keeps sample features NULL
  * for lossy audio.
  *
  * What IS real here, per frame:
  *  - the 4-byte header fields (version/bitrate/rate/mode/padding);
  *  - CRC-16 verification when the protection bit is set — polynomial
  *    x^16+x^15+x^2+1 (0x8005), init 0xFFFF, over header bytes 2-3 +
  *    the whole side-info block, exactly the spec's coverage;
  *  - the full side-info parse (MPEG-1 17/32-byte and LSF 9/17-byte
  *    layouts): main_data_begin, scfsi, and per-granule-channel
  *    part2_3_length / big_values / global_gain / scalefac_compress /
  *    window switching (block_type, mixed_block, subblock_gain) /
  *    region counts / preflag / scalefac_scale / count1 table.
  *
  * From those fields fall out real signals no header walk gives:
  *  - `global_gain` is the per-granule spectral scale (the decoder
  *    multiplies the spectrum by 2^((gg-210)/4)), so its trajectory is
  *    a LOUDNESS proxy measured from the bitstream;
  *  - `block_type == 2` granules are the encoder's transient response,
  *    so the short-block fraction is a TRANSIENT-DENSITY signal;
  *  - per-frame bitrate indices distinguish CBR from VBR exactly.
  */
object Mp3Bitstream {

  /** One granule-channel's side info (the fields with signal value). */
  final case class Granule(part23Length: Int, bigValues: Int, globalGain: Int,
                           windowSwitching: Boolean, blockType: Int,
                           mixedBlock: Boolean)

  /** One frame: header facts + CRC verdict + its granule-channels.
    * `crcOk = None` when the frame carries no CRC (protection off).
    */
  final case class Frame(version: Int, // 3=MPEG-1, 2=MPEG-2, 0=MPEG-2.5
                         sampleRate: Int, channels: Int, bitrateKbps: Int,
                         crcOk: Option[Boolean], mainDataBegin: Int,
                         granules: Vector[Granule])

  private val V1Bit = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val V2Bit = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  private val V1Rates = Array(44100, 48000, 32000)

  /** MSB-first bit reader over a byte slice. */
  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start * 8L
    private val limit = end * 8L
    def remaining: Long = limit - pos
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIdx = (pos >> 3).toInt
        val bitIdx = 7 - (pos & 7).toInt
        v = (v << 1) | ((b(byteIdx) >> bitIdx) & 1)
        pos += 1
        i += 1
      }
      v
    }
  }

  /** CRC-16 with polynomial 0x8005, MSB-first, init 0xFFFF — the ISO
    * 11172-3 §2.4.3.1 protection scheme. Covers header bytes 2-3 plus
    * the side-info block (Layers differ only in coverage length; this
    * is the Layer III coverage).
    */
  private[graft] def crc16(b: Array[Byte], ranges: Seq[(Int, Int)]): Int = {
    var crc = 0xFFFF
    ranges.foreach { case (from, until) =>
      var i = from
      while (i < until) {
        crc ^= (b(i) & 0xFF) << 8
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
                else (crc << 1) & 0xFFFF
          k += 1
        }
        i += 1
      }
    }
    crc
  }

  /** Parse the side info at `off` (first byte after header+CRC) for a
    * frame with `version` and `channels`; returns (mainDataBegin,
    * granule-channels in (gr,ch) order) or None if the payload is too
    * short. Layout: MPEG-1 is 2 granules with 4-bit scfsi per channel;
    * LSF (MPEG-2/2.5) is 1 granule, 9-bit scalefac_compress, no scfsi.
    */
  private[operators] def parseSideInfo(b: Array[Byte], off: Int, version: Int,
                                       channels: Int): Option[(Int, Vector[Granule])] = {
    val mpeg1 = version == 3
    val sideBytes = sideInfoBytes(version, channels)
    if (off + sideBytes > b.length) return None
    val r = new BitReader(b, off, off + sideBytes)
    val mainDataBegin = r.bits(if (mpeg1) 9 else 8)
    if (mpeg1) { r.bits(if (channels == 1) 5 else 3); r.bits(4 * channels) } // private + scfsi
    else r.bits(if (channels == 1) 1 else 2) // private bits only
    val nGranules = if (mpeg1) 2 else 1
    val out = Vector.newBuilder[Granule]
    var gr = 0
    while (gr < nGranules) {
      var ch = 0
      while (ch < channels) {
        val part23 = r.bits(12)
        val bigValues = r.bits(9)
        val globalGain = r.bits(8)
        r.bits(if (mpeg1) 4 else 9) // scalefac_compress
        val ws = r.bits(1) == 1
        var blockType = 0
        var mixed = false
        if (ws) {
          blockType = r.bits(2)
          mixed = r.bits(1) == 1
          r.bits(5); r.bits(5)          // table_select x2
          r.bits(3); r.bits(3); r.bits(3) // subblock_gain x3
        } else {
          r.bits(5); r.bits(5); r.bits(5) // table_select x3
          r.bits(4); r.bits(3)            // region0/region1 counts
        }
        if (mpeg1) r.bits(1) // preflag (LSF derives it from scalefac_compress)
        r.bits(1); r.bits(1) // scalefac_scale, count1table_select
        out += Granule(part23, bigValues, globalGain, ws, blockType, mixed)
        ch += 1
      }
      gr += 1
    }
    Some((mainDataBegin, out.result()))
  }

  private[operators] def sideInfoBytes(version: Int, channels: Int): Int =
    if (version == 3) { if (channels == 1) 17 else 32 }
    else { if (channels == 1) 9 else 17 }

  /** Walk the payload's Layer III frames (ID3v2 skip, strict sync —
    * the same walk discipline as `Multimodal.parseMp3`) and parse each
    * frame's side info + verify its CRC when present. Acceptance
    * mirrors parseMp3: >= 2 fully-contained frames, else None.
    * `maxFrames` bounds per-row work (a 10-minute VBR stream is ~24k
    * frames; 4096 frames ≈ 1.8 minutes of 44.1 kHz audio — plenty for
    * a trajectory signal, constant cost per row).
    */
  def parseFrames(b: Array[Byte], maxFrames: Int = 4096): Option[Vector[Frame]] = {
    var off = 0L
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) | ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      off = 10L + sz
    }
    val frames = Vector.newBuilder[Frame]
    var fullFrames = 0
    var cont = true
    while (cont && off + 4 <= b.length && fullFrames < maxFrames) {
      val o = off.toInt
      val h1 = b(o + 1) & 0xFF
      if ((b(o) & 0xFF) == 0xFF && (h1 & 0xE0) == 0xE0) {
        val version = (h1 >> 3) & 3
        val layer = (h1 >> 1) & 3
        val protection = (h1 & 1) == 0 // bit CLEAR means CRC present
        val h2 = b(o + 2) & 0xFF
        val brIdx = (h2 >> 4) & 0xF
        val srIdx = (h2 >> 2) & 3
        val padding = (h2 >> 1) & 1
        if (version != 1 && layer == 1 && brIdx != 0 && brIdx != 15 && srIdx != 3) {
          val rate = version match {
            case 3 => V1Rates(srIdx)
            case 2 => V1Rates(srIdx) / 2
            case _ => V1Rates(srIdx) / 4
          }
          val kbps = if (version == 3) V1Bit(brIdx) else V2Bit(brIdx)
          val spf = if (version == 3) 1152 else 576
          val flen = spf / 8 * kbps * 1000 / rate + padding
          if (flen <= 4) cont = false
          else {
            if (off + flen <= b.length) {
              val channels = if (((b(o + 3) >> 6) & 3) == 3) 1 else 2
              val sideOff = o + 4 + (if (protection) 2 else 0)
              parseSideInfo(b, sideOff, version, channels) match {
                case Some((mdb, grans)) =>
                  val crcOk =
                    if (!protection) None
                    else {
                      val stored = ((b(o + 4) & 0xFF) << 8) | (b(o + 5) & 0xFF)
                      val computed = crc16(b, Seq((o + 2, o + 4),
                        (sideOff, sideOff + sideInfoBytes(version, channels))))
                      Some(stored == computed)
                    }
                  frames += Frame(version, rate, channels, kbps, crcOk, mdb, grans)
                  fullFrames += 1
                case None => cont = false
              }
            }
            off += flen
          }
        } else cont = false
      } else cont = false
    }
    val fs = frames.result()
    if (fs.length >= 2) Some(fs) else None
  }

  /** Aggregate bitstream-domain features over the walked frames. */
  final case class Mp3Stats(frames: Int, crcProtected: Int, crcValid: Int,
                            gainMean: Double, gainStd: Double,
                            shortBlockFrac: Double, vbr: Boolean)

  def stats(b: Array[Byte], maxFrames: Int = 4096): Option[Mp3Stats] =
    parseFrames(b, maxFrames).map { fs =>
      val gains = fs.flatMap(_.granules.map(_.globalGain.toDouble))
      val n = gains.length.toDouble
      val mean = gains.sum / n
      val std = math.sqrt(gains.map(g => (g - mean) * (g - mean)).sum / n)
      val shorts = fs.flatMap(_.granules).count(g => g.windowSwitching && g.blockType == 2)
      Mp3Stats(
        frames = fs.length,
        crcProtected = fs.count(_.crcOk.isDefined),
        crcValid = fs.count(_.crcOk.contains(true)),
        gainMean = mean, gainStd = std,
        shortBlockFrac = shorts.toDouble / fs.map(_.granules.length).sum,
        vbr = fs.map(_.bitrateKbps).distinct.length > 1)
    }
}
