package graft.operators

import java.awt.image.BufferedImage
import scala.collection.mutable.ArrayBuffer

/** Lossless WebP (VP8L) codec, written from the public "WebP Lossless
  * Bitstream Specification" — no JVM webp codec exists offline, and
  * the reference treats webp as the best-practice storage format
  * (`README.md:200-207`, encode at `resizer.py:224-227`).
  *
  * Encoder: subtract-green transform + per-tile predictor transform
  * (all 14 spec modes, best mode per 16x16 tile by absolute-residual
  * cost) + color cache + LZ77 backreferences over the residual pixel
  * stream, with per-channel canonical Huffman codes built from the
  * token histograms. Every emitted bitstream is fully spec-conformant
  * and decodable by any webp decoder. (Distances are always encoded
  * as raw codes `distance + 120` — the spec's optional 120-entry
  * short-distance neighbor map is never emitted, which the spec
  * permits for any distance.)
  *
  * The decoder reads back the same subset (used for round-trip tests
  * and as a fallback when ImageIO can't decode a webp payload): both
  * transforms, color cache, backrefs with raw distance codes. It
  * rejects color-transform / color-indexing transforms, meta prefix
  * groups and short-distance codes with descriptive errors.
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

  // ----------------------------------------------------- pixel arithmetic

  /** Per-channel floor average of two packed ARGB pixels (SWAR). */
  @inline private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Per-channel (a + b) mod 256. */
  private def addPx(a: Int, b: Int): Int = {
    val s0 = (((a >>> 24) & 0xff) + ((b >>> 24) & 0xff)) & 0xff
    val s1 = (((a >>> 16) & 0xff) + ((b >>> 16) & 0xff)) & 0xff
    val s2 = (((a >>> 8) & 0xff) + ((b >>> 8) & 0xff)) & 0xff
    val s3 = ((a & 0xff) + (b & 0xff)) & 0xff
    (s0 << 24) | (s1 << 16) | (s2 << 8) | s3
  }

  /** Per-channel (a - b) mod 256. */
  private def subPx(a: Int, b: Int): Int = {
    val s0 = (((a >>> 24) & 0xff) - ((b >>> 24) & 0xff)) & 0xff
    val s1 = (((a >>> 16) & 0xff) - ((b >>> 16) & 0xff)) & 0xff
    val s2 = (((a >>> 8) & 0xff) - ((b >>> 8) & 0xff)) & 0xff
    val s3 = ((a & 0xff) - (b & 0xff)) & 0xff
    (s0 << 24) | (s1 << 16) | (s2 << 8) | s3
  }

  /** Spec Select predictor: p = L + T - TL per channel; the candidate
    * (L or T) with the smaller channel-wise L1 distance to p wins.
    */
  private def select(l: Int, t: Int, tl: Int): Int = {
    var pL = 0; var pT = 0
    var sh = 0
    while (sh < 32) {
      val lc = (l >>> sh) & 0xff; val tc = (t >>> sh) & 0xff; val tlc = (tl >>> sh) & 0xff
      val p = lc + tc - tlc
      pL += math.abs(p - lc); pT += math.abs(p - tc)
      sh += 8
    }
    if (pL < pT) l else t
  }

  /** Spec ClampAddSubtractFull: clamp(L + T - TL) per channel. */
  private def casFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0; var sh = 0
    while (sh < 32) {
      val v = clip255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
      out |= v << sh; sh += 8
    }
    out
  }

  /** Spec ClampAddSubtractHalf: a = avg2(L,T); clamp(a + (a-TL)/2)
    * per channel, with C-style truncation toward zero for the /2.
    */
  private def casHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    var out = 0; var sh = 0
    while (sh < 32) {
      val a = (ave >>> sh) & 0xff; val b = (tl >>> sh) & 0xff
      val v = clip255(a + (a - b) / 2)
      out |= v << sh; sh += 8
    }
    out
  }

  /** The 14 spec predictor modes over (L, T, TL, TR). */
  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int = (mode: @annotation.switch) match {
    case 0  => 0xff000000
    case 1  => l
    case 2  => t
    case 3  => tr
    case 4  => tl
    case 5  => avg2(avg2(l, tr), t)
    case 6  => avg2(l, tl)
    case 7  => avg2(l, t)
    case 8  => avg2(tl, t)
    case 9  => avg2(t, tr)
    case 10 => avg2(avg2(l, tl), avg2(t, tr))
    case 11 => select(l, t, tl)
    case 12 => casFull(l, t, tl)
    case 13 => casHalf(l, t, tl)
    case _  => throw new IllegalStateException(s"invalid VP8L predictor mode $mode")
  }

  /** Predicted value for pixel (x,y) given the reconstructed-so-far
    * raster `px`. Spec border rules: (0,0) → opaque black; top row →
    * L; left column → T. For the rightmost column, TR is the leftmost
    * pixel of the same row — which in a flat raster is exactly
    * px(idx - w + 1), so no special case is needed.
    */
  private def predAt(px: Array[Int], w: Int, x: Int, y: Int, mode: Int): Int = {
    val idx = y * w + x
    if (x == 0 && y == 0) 0xff000000
    else if (y == 0) px(idx - 1)
    else if (x == 0) px(idx - w)
    else predict(mode, px(idx - 1), px(idx - w), px(idx - w - 1), px(idx - w + 1))
  }

  /** In-place subtract-green transform: r -= g, b -= g (mod 256). */
  private def subtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >>> 8) & 0xff
      val r = (((p >>> 16) & 0xff) - g) & 0xff
      val b = ((p & 0xff) - g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** In-place inverse of [[subtractGreen]]. */
  private def addGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >>> 8) & 0xff
      val r = (((p >>> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** Forward predictor transform: choose the best of the 14 modes per
    * tile (sum over pixels/channels of min(r, 256-r), the wrap-aware
    * residual magnitude), then emit mod-256 residuals. Prediction uses
    * the ORIGINAL pixels — valid because lossless reconstruction is
    * exact, so the decoder's reconstructed neighbors equal these.
    * Returns (mode sub-image as ARGB pixels with mode in green,
    * residual raster).
    */
  private def forwardPredictor(px: Array[Int], w: Int, h: Int, tileBits: Int): (Array[Int], Array[Int]) = {
    val tile = 1 << tileBits
    val tw = (w + tile - 1) >> tileBits
    val th = (h + tile - 1) >> tileBits
    val modes = new Array[Int](tw * th)
    val res = new Array[Int](w * h)
    var ty = 0
    while (ty < th) {
      var tx = 0
      while (tx < tw) {
        val x0 = tx << tileBits; val y0 = ty << tileBits
        val x1 = math.min(x0 + tile, w); val y1 = math.min(y0 + tile, h)
        var best = 0; var bestCost = Long.MaxValue
        var m = 0
        while (m < 14) {
          var cost = 0L
          var y = y0
          while (y < y1 && cost < bestCost) {
            var x = x0
            while (x < x1) {
              val r = subPx(px(y * w + x), predAt(px, w, x, y, m))
              var sh = 0
              while (sh < 32) {
                val c = (r >>> sh) & 0xff
                cost += math.min(c, 256 - c)
                sh += 8
              }
              x += 1
            }
            y += 1
          }
          if (cost < bestCost) { bestCost = cost; best = m }
          m += 1
        }
        modes(ty * tw + tx) = 0xff000000 | (best << 8)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            res(y * w + x) = subPx(px(y * w + x), predAt(px, w, x, y, best))
            x += 1
          }
          y += 1
        }
        tx += 1
      }
      ty += 1
    }
    (modes, res)
  }

  /** In-place inverse predictor transform over a residual raster. */
  private def inversePredictor(res: Array[Int], w: Int, h: Int, tileBits: Int, modes: Array[Int]): Unit = {
    val tw = (w + (1 << tileBits) - 1) >> tileBits
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val mode = (modes((y >> tileBits) * tw + (x >> tileBits)) >>> 8) & 0xff
        val idx = y * w + x
        res(idx) = addPx(res(idx), predAt(res, w, x, y, mode))
        x += 1
      }
      y += 1
    }
  }

  // -------------------------------------------------- lz77 + color cache

  @inline private def cacheIdx(p: Int, bits: Int): Int =
    (0x1e35a7bd * p) >>> (32 - bits)

  /** VP8L prefix coding of a value ≥ 1: codes 0-3 are values 1-4;
    * code c ≥ 4 has extra_bits = (c-2)>>1 and covers
    * [(2+(c&1))<<extra_bits + 1, …]. Returns (code, extraBits, extra).
    */
  private def prefixEncode(v: Int): (Int, Int, Int) = {
    if (v <= 4) (v - 1, 0, 0)
    else {
      val u = v - 1
      val n = 31 - Integer.numberOfLeadingZeros(u)  // u ≥ 4 → n ≥ 2
      val rem = u - (1 << n)
      if (rem < (1 << (n - 1))) (2 * n, n - 1, v - (1 << n) - 1)
      else (2 * n + 1, n - 1, v - 3 * (1 << (n - 1)) - 1)
    }
  }

  private def prefixDecode(code: Int, r: BitReader): Int =
    if (code < 4) code + 1
    else {
      val eb = (code - 2) >> 1
      val off = (2 + (code & 1)) << eb
      off + 1 + r.readBits(eb)
    }

  // token encoding inside a Long: kind in bits 63-62
  //   0 = literal pixel (low 32 bits), 1 = cache index (low bits),
  //   2 = backref: length in bits 44-32, distance in low 32.
  private val KindLiteral = 0L
  private val KindCache = 1L << 62
  private val KindBackref = 2L << 62

  private val MaxLen = 4096
  private val MinMatch = 4
  /** Raw distance codes are distance+120 and the 40-code prefix table
    * tops out at 2^20, so the window is bounded accordingly.
    */
  private val MaxDist = (1 << 20) - 121

  /** Greedy LZ77 + color-cache tokenizer over a pixel raster. The
    * cache simulation mirrors the decoder exactly: every produced
    * pixel (literal, cache hit, or backref-copied) is inserted.
    */
  private def tokenize(px: Array[Int], cacheBits: Int): ArrayBuffer[Long] = {
    val n = px.length
    val tokens = new ArrayBuffer[Long](n / 2 + 16)
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val cacheUsed = if (cacheSize > 0) new Array[Boolean](cacheSize) else null
    val HBits = 16
    val head = Array.fill(1 << HBits)(-1)
    val prev = new Array[Int](math.max(n - 1, 1))
    @inline def hash2(i: Int): Int = {
      val v = (px(i).toLong & 0xffffffffL) | (px(i + 1).toLong << 32)
      ((v * 0x9e3779b97f4a7c15L) >>> (64 - HBits)).toInt
    }
    @inline def insertPos(i: Int): Unit =
      if (i + 1 < n) { val hh = hash2(i); prev(i) = head(hh); head(hh) = i }
    @inline def insertCache(p: Int): Unit =
      if (cache != null) { val ci = cacheIdx(p, cacheBits); cache(ci) = p; cacheUsed(ci) = true }
    var i = 0
    while (i < n) {
      var bestLen = 0
      var bestDist = 0
      if (i + 1 < n) {
        var cand = head(hash2(i))
        var chain = 0
        while (cand >= 0 && chain < 64) {
          if (i - cand <= MaxDist) {
            val maxL = math.min(MaxLen, n - i)
            var l = 0
            while (l < maxL && px(cand + l) == px(i + l)) l += 1
            if (l > bestLen) { bestLen = l; bestDist = i - cand }
          }
          cand = prev(cand)
          chain += 1
        }
      }
      if (bestLen >= MinMatch) {
        tokens += KindBackref | (bestLen.toLong << 32) | (bestDist.toLong & 0xffffffffL)
        var k = 0
        while (k < bestLen) {
          insertCache(px(i + k))
          insertPos(i + k)
          k += 1
        }
        i += bestLen
      } else {
        val p = px(i)
        var emitted = false
        if (cache != null) {
          val ci = cacheIdx(p, cacheBits)
          if (cacheUsed(ci) && cache(ci) == p) {
            tokens += KindCache | ci.toLong
            emitted = true
          }
        }
        if (!emitted) tokens += KindLiteral | (p.toLong & 0xffffffffL)
        insertCache(p)
        insertPos(i)
        i += 1
      }
    }
    tokens
  }

  /** Write one entropy-coded pixel raster: color-cache info, (top
    * level only) the meta-prefix bit, five Huffman codes, then the
    * token stream. Mirrors [[decodePixels]].
    */
  private def writePixels(bw: BitWriter, px: Array[Int], cacheBits: Int, metaBit: Boolean): Unit = {
    if (cacheBits > 0) { bw.writeBits(1, 1); bw.writeBits(cacheBits, 4) }
    else bw.writeBits(0, 1)
    if (metaBit) bw.writeBits(0, 1)  // no meta prefix codes
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val tokens = tokenize(px, cacheBits)
    val gHist = new Array[Long](280 + cacheSize)
    val rHist = new Array[Long](256)
    val bHist = new Array[Long](256)
    val aHist = new Array[Long](256)
    val dHist = new Array[Long](40)
    tokens.foreach { t =>
      (t >>> 62).toInt match {
        case 0 =>
          val p = t.toInt
          gHist((p >>> 8) & 0xff) += 1
          rHist((p >>> 16) & 0xff) += 1
          bHist(p & 0xff) += 1
          aHist((p >>> 24) & 0xff) += 1
        case 1 =>
          gHist(280 + t.toInt) += 1
        case _ =>
          val len = ((t >> 32) & 0x1fff).toInt
          val dist = t.toInt
          gHist(256 + prefixEncode(len)._1) += 1
          dHist(prefixEncode(dist + 120)._1) += 1
      }
    }
    // the first token is always a literal, so r/b/a are never empty;
    // the distance code can be (no backrefs) — give it a 1-symbol code
    if (dHist.forall(_ == 0)) dHist(0) = 1
    val gT = writeHuffmanCode(bw, gHist)
    val rT = writeHuffmanCode(bw, rHist)
    val bT = writeHuffmanCode(bw, bHist)
    val aT = writeHuffmanCode(bw, aHist)
    val dT = writeHuffmanCode(bw, dHist)
    tokens.foreach { t =>
      (t >>> 62).toInt match {
        case 0 =>
          val p = t.toInt
          writeSym(bw, gT, (p >>> 8) & 0xff)
          writeSym(bw, rT, (p >>> 16) & 0xff)
          writeSym(bw, bT, p & 0xff)
          writeSym(bw, aT, (p >>> 24) & 0xff)
        case 1 =>
          writeSym(bw, gT, 280 + t.toInt)
        case _ =>
          val len = ((t >> 32) & 0x1fff).toInt
          val dist = t.toInt
          val (lc, le, lv) = prefixEncode(len)
          writeSym(bw, gT, 256 + lc)
          if (le > 0) bw.writeBits(lv, le)
          val (dc, de, dv) = prefixEncode(dist + 120)
          writeSym(bw, dT, dc)
          if (de > 0) bw.writeBits(dv, de)
      }
    }
  }

  // ------------------------------------------------------------- encoder

  private val TileBits = 4  // 16x16 predictor tiles

  /** Encode a BufferedImage as lossless WebP (VP8L). */
  def encodeLossless(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    require(w <= 16384 && h <= 16384, s"VP8L dimension limit is 16384, got ${w}x$h")
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val alphaUsed = px.exists(p => (p >>> 24) != 0xff)

    val bw = new BitWriter
    bw.writeBits(0x2F, 8)                       // VP8L signature byte
    bw.writeBits((w - 1).toLong, 14)
    bw.writeBits((h - 1).toLong, 14)
    bw.writeBits(if (alphaUsed) 1 else 0, 1)
    bw.writeBits(0, 3)                          // version

    // transforms, listed in forward-application order (the decoder
    // inverts them in reverse read order): subtract-green, predictor
    bw.writeBits(1, 1); bw.writeBits(2, 2)      // SUBTRACT_GREEN
    subtractGreen(px)
    bw.writeBits(1, 1); bw.writeBits(0, 2)      // PREDICTOR_TRANSFORM
    bw.writeBits(TileBits - 2, 3)
    val (modes, res) = forwardPredictor(px, w, h, TileBits)
    writePixels(bw, modes, cacheBits = 0, metaBit = false)
    bw.writeBits(0, 1)                          // no more transforms

    val cacheBits = if (w * h >= 64) 8 else 0
    writePixels(bw, res, cacheBits, metaBit = true)
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

  /** Decode one entropy-coded pixel raster (the inverse of
    * [[writePixels]]): color-cache info, (top level only) the meta
    * bit, five Huffman codes, then literals / backrefs / cache hits.
    */
  private def decodePixels(r: BitReader, w: Int, h: Int, metaBit: Boolean): Array[Int] = {
    val cacheBits = if (r.readBits(1) == 1) r.readBits(4) else 0
    require(cacheBits <= 11, s"invalid VP8L color cache size $cacheBits")
    if (metaBit)
      require(r.readBits(1) == 0, "meta huffman unsupported by subset decoder")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val gD = readHuffmanCode(r, 280 + cacheSize)
    val rD = readHuffmanCode(r, 256)
    val bD = readHuffmanCode(r, 256)
    val aD = readHuffmanCode(r, 256)
    val dD = readHuffmanCode(r, 40)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val px = new Array[Int](w * h)
    val n = px.length
    var i = 0
    while (i < n) {
      val g = gD.read(r)
      if (g < 256) {
        val red = rD.read(r)
        val blue = bD.read(r)
        val alpha = aD.read(r)
        val p = (alpha << 24) | (red << 16) | (g << 8) | blue
        px(i) = p
        if (cache != null) cache(cacheIdx(p, cacheBits)) = p
        i += 1
      } else if (g < 280) {
        val len = prefixDecode(g - 256, r)
        val dc = prefixDecode(dD.read(r), r)
        if (dc <= 120)
          throw new IllegalStateException(
            "VP8L short-distance codes unsupported by subset decoder")
        val dist = dc - 120
        require(dist <= i, "invalid VP8L backref distance")
        require(i + len <= n, "invalid VP8L backref length")
        var k = 0
        while (k < len) {
          val p = px(i - dist + k)
          px(i + k) = p
          if (cache != null) cache(cacheIdx(p, cacheBits)) = p
          k += 1
        }
        i += len
      } else {
        val ci = g - 280
        require(cache != null && ci < cacheSize, "invalid VP8L color cache index")
        px(i) = cache(ci)
        i += 1
      }
    }
    px
  }

  /** Decode the lossless subset this encoder emits (subtract-green +
    * predictor transforms, color cache, raw-distance backrefs, single
    * prefix group). Throws descriptively on anything else.
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
    var sawSubtractGreen = false
    var predBits = -1
    var predModes: Array[Int] = null
    val order = ArrayBuffer[Int]()
    while (r.readBits(1) == 1) {
      r.readBits(2) match {
        case 2 =>
          require(!sawSubtractGreen, "duplicate subtract-green transform")
          sawSubtractGreen = true
          order += 2
        case 0 =>
          require(predBits < 0, "duplicate predictor transform")
          predBits = r.readBits(3) + 2
          val tw = (w + (1 << predBits) - 1) >> predBits
          val th = (h + (1 << predBits) - 1) >> predBits
          predModes = decodePixels(r, tw, th, metaBit = false)
          order += 0
        case t =>
          throw new IllegalStateException(
            s"VP8L transform type $t unsupported by subset decoder")
      }
    }
    val px = decodePixels(r, w, h, metaBit = true)
    // inverse transforms in reverse read order
    order.reverseIterator.foreach {
      case 0 => inversePredictor(px, w, h, predBits, predModes)
      case _ => addGreen(px)
    }
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }
}
