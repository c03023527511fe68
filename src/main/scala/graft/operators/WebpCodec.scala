package graft.operators

import java.awt.image.BufferedImage
import scala.collection.mutable.ArrayBuffer

/** Lossless WebP (VP8L) codec, written from the public "WebP Lossless
  * Bitstream Specification" — no JVM webp codec exists offline, and
  * the reference treats webp as the best-practice storage format
  * (`README.md:200-207`, encode at `resizer.py:224-227`).
  *
  * Encoder subset: no transforms, no color cache, one Huffman group;
  * per-channel canonical Huffman codes built from the image histogram
  * (entropy coding — real compression on real images), literal-only
  * stream (no LZ77 backrefs). Every emitted bitstream is fully
  * spec-conformant and decodable by any webp decoder.
  *
  * The decoder reads back the same subset (used for round-trip tests
  * and as a fallback when ImageIO can't decode a webp payload).
  */
object WebpCodec {

  /** Spec order in which code-length-code lengths are stored. */
  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // ---------------------------------------------------------------- bit io

  private final class BitWriter {
    private val out = new ArrayBuffer[Byte]()
    private var acc = 0L
    private var n = 0
    /** LSB-first: the first written bit is the LSB of the first byte. */
    def writeBits(v: Long, bits: Int): Unit = {
      acc |= (v & ((1L << bits) - 1)) << n
      n += bits
      while (n >= 8) { out += (acc & 0xFF).toByte; acc >>>= 8; n -= 8 }
    }
    def toBytes: Array[Byte] = {
      val res = out.clone()
      if (n > 0) res += (acc & 0xFF).toByte
      res.toArray
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var bit = 0
    def readBits(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) {
        // uniform descriptive failure for truncated/crafted payloads
        // instead of a raw ArrayIndexOutOfBoundsException
        if (pos >= data.length)
          throw new IllegalStateException("truncated VP8L stream")
        val b = (data(pos) >> bit) & 1
        v |= b << i
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
  }

  // ------------------------------------------------------------- huffman

  /** Huffman code lengths from a histogram, depth-limited by count
    * halving (converges to a balanced tree, depth ≤ ceil(log2 n) ≤
    * maxLen for our alphabets). Resulting codes are COMPLETE (kraft
    * sum = 1) whenever ≥ 2 symbols are present — required by VP8L
    * table builders. Deterministic tie-breaks (by node index).
    */
  private[operators] def buildCodeLengths(hist: Array[Long], maxLen: Int): Array[Int] = {
    val n = hist.length
    val present = (0 until n).filter(hist(_) > 0)
    val lengths = new Array[Int](n)
    if (present.isEmpty) return lengths
    if (present.size == 1) { lengths(present.head) = 1; return lengths }
    var counts = hist.clone()
    var done = false
    while (!done) {
      java.util.Arrays.fill(lengths, 0)
      // tree build: nodes 0..n-1 are leaves; internals appended
      val weight = ArrayBuffer[Long]()
      val parent = ArrayBuffer[Int]()
      val pq = new java.util.PriorityQueue[Int](11,
        (a: Int, b: Int) => {
          val c = java.lang.Long.compare(weight(a), weight(b))
          if (c != 0) c else Integer.compare(a, b)
        })
      val leafOf = new Array[Int](n)
      present.foreach { s =>
        leafOf(s) = weight.length
        weight += counts(s); parent += -1
        pq.add(leafOf(s))
      }
      while (pq.size > 1) {
        val a = pq.poll(); val b = pq.poll()
        val m = weight.length
        weight += weight(a) + weight(b); parent += -1
        parent(a) = m; parent(b) = m
        pq.add(m)
      }
      var maxDepth = 0
      present.foreach { s =>
        var d = 0
        var p = parent(leafOf(s))
        while (p != -1) { d += 1; p = parent(p) }
        lengths(s) = d
        if (d > maxDepth) maxDepth = d
      }
      if (maxDepth <= maxLen) done = true
      else counts = counts.map(c => if (c > 0) math.max(1L, c >> 1) else 0L)
    }
    lengths
  }

  /** Canonical codes (DEFLATE convention: by length then symbol), each
    * bit-reversed for the LSB-first writer — the decoder reads codes
    * bit by bit from the low end.
    */
  private[operators] def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = lengths.max
    val codes = new Array[Int](lengths.length)
    if (maxLen == 0) return codes
    val blCount = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    for (l <- 1 to maxLen) { code = (code + blCount(l - 1)) << 1; nextCode(l) = code }
    for (s <- lengths.indices if lengths(s) > 0) {
      val c = nextCode(lengths(s)); nextCode(lengths(s)) += 1
      // reverse within length
      var rev = 0; var i = 0
      while (i < lengths(s)) { rev = (rev << 1) | ((c >> i) & 1); i += 1 }
      codes(s) = rev
    }
    codes
  }

  /** Code-length sequence as (clSymbol, extraBits, extraVal) triples:
    * zero runs via codes 17 (3-10) / 18 (11-138), nonzero lengths
    * literal. Trailing zeros are emitted too (we always write the
    * use-max-symbol bit as 0).
    */
  private def lengthSeq(lengths: Array[Int]): Seq[(Int, Int, Int)] = {
    val seq = ArrayBuffer[(Int, Int, Int)]()
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) == 0) {
        var run = 0
        while (i + run < lengths.length && lengths(i + run) == 0) run += 1
        i += run
        while (run >= 11) { val take = math.min(run, 138); seq += ((18, 7, take - 11)); run -= take }
        if (run >= 3) { seq += ((17, 3, run - 3)); run = 0 }
        while (run > 0) { seq += ((0, 0, 0)); run -= 1 }
      } else {
        seq += ((lengths(i), 0, 0))
        i += 1
      }
    }
    seq.toSeq
  }

  /** Write one Huffman code (the "simple" form for ≤ 2 symbols, full
    * code-length-coded form otherwise).
    */
  private def writeHuffmanCode(b: BitWriter, hist: Array[Long]): Array[Int] = {
    val present = hist.indices.filter(hist(_) > 0)
    require(present.nonEmpty)
    if (present.size <= 2 && present.forall(_ < 256)) {
      b.writeBits(1, 1)                         // simple
      b.writeBits(present.size - 1, 1)          // num_symbols - 1
      val s0 = present.head
      if (s0 <= 1) { b.writeBits(0, 1); b.writeBits(s0, 1) }
      else { b.writeBits(1, 1); b.writeBits(s0, 8) }
      if (present.size == 2) b.writeBits(present(1), 8)
      val lens = new Array[Int](hist.length)
      if (present.size == 2) { lens(present.head) = 1; lens(present(1)) = 1 }
      // single symbol: zero-bit code (length 0 everywhere)
      val codes = new Array[Int](hist.length)
      if (present.size == 2) codes(present(1)) = 1
      // stash lengths for the symbol writer via codesWithLen convention
      symbolTable(lens, codes)
    } else {
      var lens = buildCodeLengths(hist, 15)
      var seq = lengthSeq(lens)
      var clHist = new Array[Long](19)
      seq.foreach { case (s, _, _) => clHist(s) += 1 }
      if (clHist.count(_ > 0) < 2) {
        // uniform complete code (e.g. all 256 literals at length 8):
        // a 1-symbol code-length code would be incomplete, which VP8L
        // rejects. Perturb kraft-neutrally: one symbol up to L-1, two
        // symbols down to L+1 (-3·2^-L + 2·2^-(L+1) + 2^-(L-1) = 0).
        val l = lens(present.head)
        lens = lens.clone()
        lens(present.head) = l - 1
        lens(present(present.size - 2)) = l + 1
        lens(present(present.size - 1)) = l + 1
        seq = lengthSeq(lens)
        clHist = new Array[Long](19)
        seq.foreach { case (s, _, _) => clHist(s) += 1 }
      }
      val clLens = buildCodeLengths(clHist, 7)
      val clCodes = canonicalCodes(clLens)
      b.writeBits(0, 1)                         // not simple
      b.writeBits(15, 4)                        // num_code_lengths = 4 + 15 = 19
      ClOrder.foreach(s => b.writeBits(clLens(s), 3))
      b.writeBits(0, 1)                         // no max_symbol shortcut
      seq.foreach { case (s, eb, ev) =>
        writeCodeBits(b, clCodes(s), clLens(s))
        if (eb > 0) b.writeBits(ev, eb)
      }
      symbolTable(lens, canonicalCodes(lens))
    }
  }

  /** Pack (len, code) as len<<16|code per symbol for the pixel loop. */
  private def symbolTable(lens: Array[Int], codes: Array[Int]): Array[Int] =
    Array.tabulate(lens.length)(i => (lens(i) << 16) | codes(i))

  private def writeCodeBits(b: BitWriter, revCode: Int, len: Int): Unit =
    if (len > 0) b.writeBits(revCode.toLong, len)

  private def writeSym(b: BitWriter, table: Array[Int], sym: Int): Unit = {
    val e = table(sym)
    writeCodeBits(b, e & 0xFFFF, e >>> 16)
  }

  // ------------------------------------------------------------- encoder

  /** Encode a BufferedImage as lossless WebP (VP8L). */
  def encodeLossless(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    require(w <= 16384 && h <= 16384, s"VP8L dimension limit is 16384, got ${w}x$h")
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val gHist = new Array[Long](280)
    val rHist = new Array[Long](256)
    val bHist = new Array[Long](256)
    val aHist = new Array[Long](256)
    var alphaUsed = false
    px.foreach { p =>
      val a = (p >>> 24) & 0xFF
      gHist((p >>> 8) & 0xFF) += 1
      rHist((p >>> 16) & 0xFF) += 1
      bHist(p & 0xFF) += 1
      aHist(a) += 1
      if (a != 255) alphaUsed = true
    }
    val dHist = new Array[Long](40); dHist(0) = 1  // distance code: unused, 1-symbol

    val bw = new BitWriter
    bw.writeBits(0x2F, 8)                       // VP8L signature byte
    bw.writeBits((w - 1).toLong, 14)
    bw.writeBits((h - 1).toLong, 14)
    bw.writeBits(if (alphaUsed) 1 else 0, 1)
    bw.writeBits(0, 3)                          // version
    bw.writeBits(0, 1)                          // no transforms
    bw.writeBits(0, 1)                          // no color cache
    bw.writeBits(0, 1)                          // one huffman group
    val gT = writeHuffmanCode(bw, gHist)
    val rT = writeHuffmanCode(bw, rHist)
    val bT = writeHuffmanCode(bw, bHist)
    val aT = writeHuffmanCode(bw, aHist)
    writeHuffmanCode(bw, dHist)
    px.foreach { p =>
      writeSym(bw, gT, (p >>> 8) & 0xFF)
      writeSym(bw, rT, (p >>> 16) & 0xFF)
      writeSym(bw, bT, p & 0xFF)
      writeSym(bw, aT, (p >>> 24) & 0xFF)
    }
    riff(bw.toBytes)
  }

  private def riff(vp8l: Array[Byte]): Array[Byte] = {
    val chunkLen = vp8l.length
    val padded = chunkLen + (chunkLen & 1)
    val total = 4 + 8 + padded
    val out = java.nio.ByteBuffer.allocate(8 + total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(total)
    out.put("WEBP".getBytes("US-ASCII"))
    out.put("VP8L".getBytes("US-ASCII")).putInt(chunkLen)
    out.put(vp8l)
    if ((chunkLen & 1) == 1) out.put(0.toByte)
    out.array()
  }

  // ------------------------------------------------------------- decoder

  def isLosslessWebp(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 20 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P' &&
      bytes(12) == 'V' && bytes(13) == 'P' && bytes(14) == '8' && bytes(15) == 'L'

  private final class Decoder(lens: Array[Int], codes: Array[Int]) {
    // (len, lsb-first accumulated code) -> symbol
    private val table = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
    private var maxLen = 0
    private var single = -1
    for (s <- lens.indices) {
      if (lens(s) > 0) {
        table.put((lens(s).toLong << 32) | (codes(s) & 0xFFFFFFFFL), s)
        if (lens(s) > maxLen) maxLen = lens(s)
      }
    }
    def setSingle(sym: Int): Unit = single = sym
    def read(r: BitReader): Int = {
      if (maxLen == 0) {
        require(single >= 0, "empty huffman code")
        return single  // zero-bit single-symbol code
      }
      var code = 0
      var len = 0
      while (len < maxLen) {
        code |= r.readBits(1) << len
        len += 1
        val hit = table.get((len.toLong << 32) | (code & 0xFFFFFFFFL))
        if (hit != null) return hit.intValue()
      }
      throw new IllegalStateException("invalid huffman code in VP8L stream")
    }
  }

  private def readHuffmanCode(r: BitReader, alphabet: Int): Decoder = {
    if (r.readBits(1) == 1) {  // simple
      val numSymbols = r.readBits(1) + 1
      val first8 = r.readBits(1)
      val s0 = r.readBits(if (first8 == 1) 8 else 1)
      if (numSymbols == 1) {
        val d = new Decoder(new Array[Int](alphabet), new Array[Int](alphabet))
        d.setSingle(s0)
        d
      } else {
        val s1 = r.readBits(8)
        val lens = new Array[Int](alphabet); lens(s0) = 1; lens(s1) = 1
        val codes = new Array[Int](alphabet); codes(s0) = 0; codes(s1) = 1
        new Decoder(lens, codes)
      }
    } else {
      val numCl = 4 + r.readBits(4)
      val clLens = new Array[Int](19)
      for (i <- 0 until numCl) clLens(ClOrder(i)) = r.readBits(3)
      val clDec = new Decoder(clLens, canonicalCodes(clLens))
      var maxSymbol =
        if (r.readBits(1) == 1) {
          val nbits = 2 + 2 * r.readBits(3)
          2 + r.readBits(nbits)
        } else alphabet
      val lens = new Array[Int](alphabet)
      var sym = 0
      var prev = 8
      while (sym < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clDec.read(r)
        if (cl < 16) {
          lens(sym) = cl; sym += 1
          if (cl != 0) prev = cl
        } else if (cl == 16) {
          val rep = 3 + r.readBits(2)
          for (_ <- 0 until rep if sym < alphabet) { lens(sym) = prev; sym += 1 }
        } else if (cl == 17) {
          sym += 3 + r.readBits(3)
        } else {
          sym += 11 + r.readBits(7)
        }
      }
      new Decoder(lens, canonicalCodes(lens))
    }
  }

  /** Decode the lossless subset this encoder emits (no transforms, no
    * color cache, single group, literal-only). Throws on anything else.
    */
  def decodeLossless(bytes: Array[Byte]): BufferedImage = {
    require(isLosslessWebp(bytes), "not a VP8L webp")
    val r = new BitReader(bytes, 20)  // skip RIFF(12) + 'VP8L'(4) + size(4)
    require(r.readBits(8) == 0x2F, "bad VP8L signature")
    val w = r.readBits(14) + 1
    val h = r.readBits(14) + 1
    // allocation guard for untrusted headers: a crafted 16384x16384
    // header would demand a 1 GiB pixel array before any pixel decodes
    require(w.toLong * h <= (1L << 26),
      s"VP8L dimensions ${w}x$h exceed the fallback decoder's 64M-pixel cap")
    r.readBits(1)  // alpha hint
    require(r.readBits(3) == 0, "bad VP8L version")
    require(r.readBits(1) == 0, "transforms unsupported by subset decoder")
    require(r.readBits(1) == 0, "color cache unsupported by subset decoder")
    require(r.readBits(1) == 0, "meta huffman unsupported by subset decoder")
    val gD = readHuffmanCode(r, 280)
    val rD = readHuffmanCode(r, 256)
    val bD = readHuffmanCode(r, 256)
    val aD = readHuffmanCode(r, 256)
    readHuffmanCode(r, 40)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      val g = gD.read(r)
      require(g < 256, "backref/cache codes unsupported by subset decoder")
      val red = rD.read(r)
      val blue = bD.read(r)
      val alpha = aD.read(r)
      px(i) = (alpha << 24) | (red << 16) | (g << 8) | blue
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }
}
