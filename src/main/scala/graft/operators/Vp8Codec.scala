package graft.operators

import java.awt.image.BufferedImage
import scala.collection.mutable.ArrayBuffer

import Vp8Tables._

/** From-scratch VP8 intra-frame (lossy webp) encoder + verifying
  * decoder, written from the public bitstream spec (RFC 6386).
  *
  * Closes the reference-parity gap around `encode_format="webp"`:
  * img2dataset's webp output is LOSSY (Pillow/libwebp at
  * `encode_quality`, default 95 — `resizer.py:224-227`), while this
  * repo previously shipped only the lossless VP8L path
  * ([[WebpCodec]]). This encoder produces real DCT-quantized lossy
  * frames with the quality knob mapped to the VP8 quantizer index.
  *
  * Scope (encoder): key frames only, 4:2:0, 16x16 intra prediction
  * modes (DC/V/H/TM) + 8x8 chroma modes, one token partition, loop
  * filter disabled, no segmentation. That is a fully valid VP8
  * bitstream subset — every feature left out is signalled off in the
  * frame header, not assumed. The decoder accepts the same subset
  * (B_PRED streams are rejected with a clear error) and exists so
  * round-trip/PSNR tests can run in this offline sandbox, where no
  * other webp codec is available. See [[Vp8Tables]] for the
  * probability-table fidelity note.
  */
object Vp8Codec {

  // ------------------------------------------------------------------
  // Boolean arithmetic coder (RFC 6386 §7)
  // ------------------------------------------------------------------

  private[graft] final class BoolEncoder {
    private val buf = new ArrayBuffer[Byte](1 << 12)
    private var low: Long = 0L
    private var range: Int = 255
    private var count: Int = -24

    def bool(prob: Int, bit: Boolean): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit) { low += split; range -= split }
      else range = split
      var shift = Norm(range)
      range <<= shift
      count += shift
      if (count >= 0) {
        val offset = shift - count
        // offset >= 1 always: count was negative before this call and
        // shift <= 7, so the carry probe below never shifts by -1.
        if (((low << (offset - 1)) & 0x80000000L) != 0L) {
          var x = buf.length - 1
          while (x >= 0 && buf(x) == -1) { buf(x) = 0; x -= 1 }
          if (x >= 0) buf(x) = (buf(x) + 1).toByte
        }
        buf += ((low >> (24 - offset)) & 0xff).toByte
        low = (low << offset) & 0xffffff
        shift = count
        count -= 8
      }
      low = (low << shift) & 0xffffffffL
    }

    /** n-bit unsigned literal, MSB first, each bit at probability 128. */
    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, ((v >> i) & 1) != 0); i -= 1 }
    }

    /** Encode `leaf` through `tree` with per-node `probs`. */
    def tree(tree: Array[Int], probs: Array[Int], leaf: Int): Unit = {
      var i = 0
      var done = false
      while (!done) {
        // find which branch leads to the leaf: walk greedily by
        // precomputed containment — trees here are tiny, so a simple
        // recursive containment test is fine.
        val left = tree(i)
        val right = tree(i + 1)
        if (contains(tree, left, leaf)) {
          bool(probs(i >> 1), bit = false)
          if (left <= 0) done = true else i = left
        } else {
          bool(probs(i >> 1), bit = true)
          if (right <= 0) done = true else i = right
          if (right <= 0 && -right != leaf)
            throw new IllegalStateException(s"leaf $leaf not in tree")
        }
      }
    }

    private def contains(t: Array[Int], node: Int, leaf: Int): Boolean =
      if (node <= 0) -node == leaf
      else contains(t, t(node), leaf) || contains(t, t(node + 1), leaf)

    def finish(): Array[Byte] = {
      var i = 0
      while (i < 32) { bool(128, bit = false); i += 1 }
      buf.toArray
    }

    def size: Int = buf.length
  }

  private[graft] final class BoolDecoder(data: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var value: Int = 0
    private var range: Int = 255
    private var bits: Int = 0
    // prime the 16-bit big-endian window
    value = (nextByte() << 8) | nextByte()

    private def nextByte(): Int =
      if (pos < end) { val b = data(pos) & 0xff; pos += 1; b } else 0

    def bool(prob: Int): Boolean = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val big = split << 8
      val bit = value >= big
      if (bit) { range -= split; value -= big }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bits += 1
        if (bits == 8) { bits = 0; value |= nextByte() }
      }
      bit
    }

    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | (if (bool(128)) 1 else 0); i += 1 }
      v
    }

    def tree(tree: Array[Int], probs: Array[Int]): Int = {
      var i = 0
      while (true) {
        val next = if (bool(probs(i >> 1))) tree(i + 1) else tree(i)
        if (next <= 0) return -next
        i = next
      }
      throw new IllegalStateException("unreachable")
    }
  }

  // ------------------------------------------------------------------
  // Transforms (RFC 6386 §14.3/§14.4; forward pair from the spec's
  // reference encoder shape, verified against the inverse by tests)
  // ------------------------------------------------------------------

  /** Forward 4x4 DCT over a row-major residual block, in place semantics
    * (input untouched, returns coefficients).
    */
  private[graft] def fdct4x4(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    val out = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows
      val o = i * 4
      val a1 = (in(o) + in(o + 3)) * 8
      val b1 = (in(o + 1) + in(o + 2)) * 8
      val c1 = (in(o + 1) - in(o + 2)) * 8
      val d1 = (in(o) - in(o + 3)) * 8
      tmp(o) = a1 + b1
      tmp(o + 2) = a1 - b1
      tmp(o + 1) = (c1 * 2217 + d1 * 5352 + 14500) >> 12
      tmp(o + 3) = (d1 * 2217 - c1 * 5352 + 7500) >> 12
      i += 1
    }
    i = 0
    while (i < 4) { // columns
      val a1 = tmp(i) + tmp(i + 12)
      val b1 = tmp(i + 4) + tmp(i + 8)
      val c1 = tmp(i + 4) - tmp(i + 8)
      val d1 = tmp(i) - tmp(i + 12)
      out(i) = (a1 + b1 + 7) >> 4
      out(i + 8) = (a1 - b1 + 7) >> 4
      out(i + 4) = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (if (d1 != 0) 1 else 0)
      out(i + 12) = (d1 * 2217 - c1 * 5352 + 51000) >> 16
      i += 1
    }
    out
  }

  /** Inverse 4x4 DCT (RFC 6386 §14.3, exact). */
  private[graft] def idct4x4(in: Array[Int]): Array[Int] = {
    val c1 = 20091 // cospi8sqrt2minus1, Q16
    val c2 = 35468 // sinpi8sqrt2, Q16
    val tmp = new Array[Int](16)
    val out = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a1 = in(i) + in(i + 8)
      val b1 = in(i) - in(i + 8)
      val t1 = (in(i + 4) * c2) >> 16
      val t2 = in(i + 12) + ((in(i + 12) * c1) >> 16)
      val cc = t1 - t2
      val t3 = in(i + 4) + ((in(i + 4) * c1) >> 16)
      val t4 = (in(i + 12) * c2) >> 16
      val dd = t3 + t4
      tmp(i) = a1 + dd
      tmp(i + 12) = a1 - dd
      tmp(i + 4) = b1 + cc
      tmp(i + 8) = b1 - cc
      i += 1
    }
    i = 0
    while (i < 4) { // rows
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 2)
      val b1 = tmp(o) - tmp(o + 2)
      val t1 = (tmp(o + 1) * c2) >> 16
      val t2 = tmp(o + 3) + ((tmp(o + 3) * c1) >> 16)
      val cc = t1 - t2
      val t3 = tmp(o + 1) + ((tmp(o + 1) * c1) >> 16)
      val t4 = (tmp(o + 3) * c2) >> 16
      val dd = t3 + t4
      out(o) = (a1 + dd + 4) >> 3
      out(o + 3) = (a1 - dd + 4) >> 3
      out(o + 1) = (b1 + cc + 4) >> 3
      out(o + 2) = (b1 - cc + 4) >> 3
      i += 1
    }
    out
  }

  /** Forward Walsh-Hadamard for the 16 luma DCs (encoder side). */
  private[graft] def fwht4x4(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    val out = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows
      val o = i * 4
      val a1 = (in(o) + in(o + 2)) << 2
      val d1 = (in(o + 1) + in(o + 3)) << 2
      val c1 = (in(o + 1) - in(o + 3)) << 2
      val b1 = (in(o) - in(o + 2)) << 2
      tmp(o) = a1 + d1 + (if (a1 != 0) 1 else 0)
      tmp(o + 1) = b1 + c1
      tmp(o + 2) = b1 - c1
      tmp(o + 3) = a1 - d1
      i += 1
    }
    i = 0
    while (i < 4) { // columns
      val a1 = tmp(i) + tmp(i + 8)
      val d1 = tmp(i + 4) + tmp(i + 12)
      val c1 = tmp(i + 4) - tmp(i + 12)
      val b1 = tmp(i) - tmp(i + 8)
      var a2 = a1 + d1
      var b2 = b1 + c1
      var c2 = b1 - c1
      var d2 = a1 - d1
      if (a2 < 0) a2 += 1
      if (b2 < 0) b2 += 1
      if (c2 < 0) c2 += 1
      if (d2 < 0) d2 += 1
      out(i) = (a2 + 3) >> 3
      out(i + 4) = (b2 + 3) >> 3
      out(i + 8) = (c2 + 3) >> 3
      out(i + 12) = (d2 + 3) >> 3
      i += 1
    }
    out
  }

  /** Inverse Walsh-Hadamard (RFC 6386 §14.3, exact). */
  private[graft] def iwht4x4(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    val out = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a1 = in(i) + in(i + 12)
      val b1 = in(i + 4) + in(i + 8)
      val c1 = in(i + 4) - in(i + 8)
      val d1 = in(i) - in(i + 12)
      tmp(i) = a1 + b1
      tmp(i + 4) = c1 + d1
      tmp(i + 8) = a1 - b1
      tmp(i + 12) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) { // rows
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 3)
      val b1 = tmp(o + 1) + tmp(o + 2)
      val c1 = tmp(o + 1) - tmp(o + 2)
      val d1 = tmp(o) - tmp(o + 3)
      out(o) = (a1 + b1 + 3) >> 3
      out(o + 1) = (c1 + d1 + 3) >> 3
      out(o + 2) = (a1 - b1 + 3) >> 3
      out(o + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // Quantization (RFC 6386 §14.1)
  // ------------------------------------------------------------------

  private[graft] final case class Quantizers(
      y1dc: Int, y1ac: Int, y2dc: Int, y2ac: Int, uvdc: Int, uvac: Int)

  private[graft] def quantizers(qi: Int): Quantizers = {
    val q = math.max(0, math.min(127, qi))
    val dc = DcQLookup(q)
    val ac = AcQLookup(q)
    Quantizers(
      y1dc = dc,
      y1ac = ac,
      y2dc = dc * 2,
      y2ac = math.max(8, ac * 155 / 100),
      uvdc = math.min(dc, 132),
      uvac = ac)
  }

  /** encode_quality (0-100, reference default 95) -> VP8 qindex. */
  private[graft] def qualityToQIndex(quality: Int): Int = {
    val q = math.max(0, math.min(100, quality))
    math.max(0, math.min(127, math.round((100 - q) * 1.27f)))
  }

  @inline private def quantize(v: Int, q: Int): Int = {
    val a = math.abs(v)
    val lvl0 = (a + (q >> 1)) / q
    val lvl = math.min(lvl0, 2047 + 67) // cat6 ceiling
    if (v < 0) -lvl else lvl
  }

  // ------------------------------------------------------------------
  // Planes + prediction
  // ------------------------------------------------------------------

  /** A padded plane with stride `w`; recon starts undefined and is
    * filled macroblock by macroblock in both encoder and decoder.
    */
  private final class Plane(val w: Int, val h: Int) {
    val px = new Array[Int](w * h)
    @inline def apply(x: Int, y: Int): Int = px(y * w + x)
    @inline def update(x: Int, y: Int, v: Int): Unit = px(y * w + x) = v
  }

  @inline private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Build the 16x16 (or 8x8) prediction for mode `mode` at block
    * origin (bx, by) of size `size`, reading reconstructed neighbors
    * from `p`. Off-frame edges use the spec defaults (above=127,
    * left=129).
    */
  private def predictBlock(p: Plane, bx: Int, by: Int, size: Int, mode: Int): Array[Int] = {
    val out = new Array[Int](size * size)
    val hasAbove = by > 0
    val hasLeft = bx > 0
    def above(i: Int): Int = if (hasAbove) p(bx + i, by - 1) else 127
    def left(i: Int): Int = if (hasLeft) p(bx - 1, by + i) else 129
    val aboveLeft: Int =
      if (!hasAbove) 127
      else if (!hasLeft) 129
      else p(bx - 1, by - 1)
    mode match {
      case DcPred =>
        val dc =
          if (hasAbove && hasLeft) {
            var s = 0; var i = 0
            while (i < size) { s += above(i) + left(i); i += 1 }
            (s + size) / (2 * size)
          } else if (hasAbove) {
            var s = 0; var i = 0
            while (i < size) { s += above(i); i += 1 }
            (s + size / 2) / size
          } else if (hasLeft) {
            var s = 0; var i = 0
            while (i < size) { s += left(i); i += 1 }
            (s + size / 2) / size
          } else 128
        java.util.Arrays.fill(out, dc)
      case VPred =>
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) { out(y * size + x) = above(x); x += 1 }
          y += 1
        }
      case HPred =>
        var y = 0
        while (y < size) {
          val l = left(y)
          var x = 0
          while (x < size) { out(y * size + x) = l; x += 1 }
          y += 1
        }
      case TmPred =>
        var y = 0
        while (y < size) {
          val l = left(y)
          var x = 0
          while (x < size) {
            out(y * size + x) = clamp255(l + above(x) - aboveLeft)
            x += 1
          }
          y += 1
        }
      case m => throw new IllegalArgumentException(s"unsupported intra mode $m")
    }
    out
  }

  // ------------------------------------------------------------------
  // Coefficient token coding (RFC 6386 §13)
  // ------------------------------------------------------------------

  /** Encode one 4x4 block's quantized coefficients (natural order in
    * `coefs`), scanning zigzag from `first`. Returns true if the block
    * has any nonzero coefficient.
    */
  private def encodeCoefs(
      b: BoolEncoder, coefs: Array[Int], first: Int, plane: Int, ctx0: Int): Boolean = {
    var eob = first
    var i = first
    while (i < 16) {
      if (coefs(Zigzag(i)) != 0) eob = i + 1
      i += 1
    }
    var c = first
    var ctx = ctx0
    var prevZero = false
    while (c < eob) {
      val v = coefs(Zigzag(c))
      val probs = DefaultCoefProbs(plane)(CoefBands(c))(ctx)
      val a = math.abs(v)
      val token =
        if (a == 0) ZeroToken
        else if (a == 1) OneToken
        else if (a == 2) TwoToken
        else if (a == 3) ThreeToken
        else if (a == 4) FourToken
        else if (a <= 6) Cat1
        else if (a <= 10) Cat2
        else if (a <= 18) Cat3
        else if (a <= 34) Cat4
        else if (a <= 66) Cat5
        else Cat6
      encodeToken(b, probs, token, startAt2 = prevZero)
      if (token >= Cat1) {
        val cat = token - Cat1
        val extra = a - CatBase(cat)
        val cp = CatProbs(cat)
        var k = CatBits(cat) - 1
        var j = 0
        while (k >= 0) { b.bool(cp(j), ((extra >> k) & 1) != 0); j += 1; k -= 1 }
      }
      if (a != 0) b.bool(128, v < 0)
      ctx = if (a == 0) 0 else if (a == 1) 1 else 2
      prevZero = a == 0
      c += 1
    }
    if (eob < 16) {
      val probs = DefaultCoefProbs(plane)(CoefBands(eob))(ctx)
      // EOB can never follow a ZERO token, and eob-after-zero cannot
      // happen here: eob is one past the last nonzero coefficient.
      encodeToken(b, probs, EobToken, startAt2 = false)
    }
    eob > first
  }

  /** Walk [[Vp8Tables.CoefTree]] emitting the token; `startAt2` skips
    * the EOB branch (mandatory right after a ZERO token).
    */
  private def encodeToken(b: BoolEncoder, probs: Array[Int], token: Int, startAt2: Boolean): Unit = {
    // Explicit paths beat a generic tree walk here: the coefficient
    // tree is coded on every coefficient of every block.
    @inline def bit(node: Int, v: Boolean): Unit = b.bool(probs(node), v)
    if (!startAt2) bit(0, token != EobToken)
    if (token == EobToken) return
    bit(1, token != ZeroToken)
    if (token == ZeroToken) return
    bit(2, token != OneToken)
    if (token == OneToken) return
    // node 6 at probs index 3: left subtree = {TWO,THREE,FOUR}
    val smallGroup = token <= FourToken
    bit(3, !smallGroup)
    if (smallGroup) {
      bit(4, token != TwoToken)
      if (token == TwoToken) return
      bit(5, token == FourToken)
    } else {
      val cats12 = token == Cat1 || token == Cat2
      bit(6, !cats12)
      if (cats12) bit(7, token == Cat2)
      else {
        val cats34 = token == Cat3 || token == Cat4
        bit(8, !cats34)
        if (cats34) bit(9, token == Cat4)
        else bit(10, token == Cat6)
      }
    }
  }

  /** Decode one block's coefficients into `coefs` (natural order).
    * Returns true if any nonzero.
    */
  private def decodeCoefs(
      d: BoolDecoder, coefs: Array[Int], first: Int, plane: Int, ctx0: Int): Boolean = {
    java.util.Arrays.fill(coefs, 0)
    var c = first
    var ctx = ctx0
    var prevZero = false
    var any = false
    while (c < 16) {
      val probs = DefaultCoefProbs(plane)(CoefBands(c))(ctx)
      var i = if (prevZero) 2 else 0
      var token = -1
      while (token < 0) {
        val next = if (d.bool(probs(i >> 1))) CoefTree(i + 1) else CoefTree(i)
        if (next <= 0) token = -next else i = next
      }
      if (token == EobToken) return any
      val a =
        if (token <= FourToken) token
        else {
          val cat = token - Cat1
          val cp = CatProbs(cat)
          var extra = 0
          var j = 0
          while (j < CatBits(cat)) {
            extra = (extra << 1) | (if (d.bool(cp(j))) 1 else 0)
            j += 1
          }
          CatBase(cat) + extra
        }
      val v = if (a != 0 && d.bool(128)) -a else a
      coefs(Zigzag(c)) = v
      if (a != 0) any = true
      ctx = if (a == 0) 0 else if (a == 1) 1 else 2
      prevZero = a == 0
      c += 1
    }
    any
  }

  // ------------------------------------------------------------------
  // Color conversion (BT.601 studio range, the webp convention)
  // ------------------------------------------------------------------

  private def toYuv420(img: BufferedImage): (Plane, Plane, Plane, Int, Int) = {
    val w = img.getWidth
    val h = img.getHeight
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val yP = new Plane(mbW * 16, mbH * 16)
    val uP = new Plane(mbW * 8, mbH * 8)
    val vP = new Plane(mbW * 8, mbH * 8)
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    val yFull = new Array[Int](w * h)
    val uFull = new Array[Int](w * h)
    val vFull = new Array[Int](w * h)
    var i = 0
    while (i < rgb.length) {
      val p = rgb(i)
      val r = (p >> 16) & 0xff
      val g = (p >> 8) & 0xff
      val b = p & 0xff
      yFull(i) = clamp255(((66 * r + 129 * g + 25 * b + 128) >> 8) + 16)
      uFull(i) = clamp255(((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128)
      vFull(i) = clamp255(((112 * r - 94 * g - 18 * b + 128) >> 8) + 128)
      i += 1
    }
    // copy + replicate edges into the padded planes
    var y = 0
    while (y < yP.h) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < yP.w) {
        val sx = math.min(x, w - 1)
        yP(x, y) = yFull(sy * w + sx)
        x += 1
      }
      y += 1
    }
    // 2x2 average subsample, clamped at odd edges
    y = 0
    while (y < uP.h) {
      var x = 0
      while (x < uP.w) {
        val sx0 = math.min(2 * x, w - 1)
        val sx1 = math.min(2 * x + 1, w - 1)
        val sy0 = math.min(2 * y, h - 1)
        val sy1 = math.min(2 * y + 1, h - 1)
        uP(x, y) = (uFull(sy0 * w + sx0) + uFull(sy0 * w + sx1) +
          uFull(sy1 * w + sx0) + uFull(sy1 * w + sx1) + 2) >> 2
        vP(x, y) = (vFull(sy0 * w + sx0) + vFull(sy0 * w + sx1) +
          vFull(sy1 * w + sx0) + vFull(sy1 * w + sx1) + 2) >> 2
        x += 1
      }
      y += 1
    }
    (yP, uP, vP, w, h)
  }

  private def fromYuv420(yP: Plane, uP: Plane, vP: Plane, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val rgb = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = yP(x, y) - 16
        val d = uP(x / 2, y / 2) - 128
        val e = vP(x / 2, y / 2) - 128
        val r = clamp255((298 * c + 409 * e + 128) >> 8)
        val g = clamp255((298 * c - 100 * d - 208 * e + 128) >> 8)
        val b = clamp255((298 * c + 516 * d + 128) >> 8)
        rgb(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, rgb, 0, w)
    img
  }

  // ------------------------------------------------------------------
  // Encoder
  // ------------------------------------------------------------------

  /** One macroblock's quantized data: 24 4x4 blocks (16 Y, 4 U, 4 V)
    * plus the Y2 block, each 16 coefficients in natural order.
    */
  private final class MbData {
    val y2 = new Array[Int](16)
    val blocks: Array[Array[Int]] = Array.fill(24)(new Array[Int](16))
    var yMode = DcPred
    var uvMode = DcPred
    var skip = false
  }

  private def sad(a: Array[Int], plane: Plane, bx: Int, by: Int, size: Int): Long = {
    var s = 0L
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        s += math.abs(a(y * size + x) - plane(bx + x, by + y))
        x += 1
      }
      y += 1
    }
    s
  }

  /** Encode `img` as a lossy webp (VP8 key frame in a RIFF container)
    * at `quality` (0-100, the reference's `encode_quality` scale).
    */
  def encodeLossy(img: BufferedImage, quality: Int = 95): Array[Byte] = {
    val (src, srcU, srcV, w, h) = toYuv420(img)
    require(w <= 0x3fff && h <= 0x3fff, s"VP8 dimensions limited to 16383 ($w x $h)")
    val mbW = src.w / 16
    val mbH = src.h / 16
    val rec = new Plane(src.w, src.h)
    val recU = new Plane(srcU.w, srcU.h)
    val recV = new Plane(srcV.w, srcV.h)
    val q = quantizers(qualityToQIndex(quality))
    val mbs = new Array[MbData](mbW * mbH)

    // --- analysis + reconstruction pass -----------------------------
    val res = new Array[Int](16)
    var mby = 0
    while (mby < mbH) {
      var mbx = 0
      while (mbx < mbW) {
        val mb = new MbData
        mbs(mby * mbW + mbx) = mb
        val bx = mbx * 16
        val by = mby * 16

        // luma mode decision on reconstructed neighbors
        var bestMode = DcPred
        var bestSad = Long.MaxValue
        var bestPred: Array[Int] = null
        var m = DcPred
        while (m <= TmPred) {
          val pr = predictBlock(rec, bx, by, 16, m)
          val s = sad(pr, src, bx, by, 16)
          if (s < bestSad) { bestSad = s; bestMode = m; bestPred = pr }
          m += 1
        }
        mb.yMode = bestMode
        val yPred = bestPred

        // forward transform 16 luma subblocks; collect DCs for Y2
        val dcs = new Array[Int](16)
        val yCoefs = new Array[Array[Int]](16)
        var sb = 0
        while (sb < 16) {
          val ox = (sb & 3) * 4
          val oy = (sb >> 2) * 4
          var i = 0
          while (i < 16) {
            val x = ox + (i & 3)
            val y = oy + (i >> 2)
            res(i) = src(bx + x, by + y) - yPred(y * 16 + x)
            i += 1
          }
          val co = fdct4x4(res)
          dcs(sb) = co(0)
          yCoefs(sb) = co
          sb += 1
        }
        val y2 = fwht4x4(dcs)
        var i = 0
        while (i < 16) {
          mb.y2(i) = quantize(y2(i), if (i == 0) q.y2dc else q.y2ac)
          i += 1
        }
        sb = 0
        while (sb < 16) {
          val co = yCoefs(sb)
          val out = mb.blocks(sb)
          out(0) = 0 // DC carried by Y2
          i = 1
          while (i < 16) { out(i) = quantize(co(i), q.y1ac); i += 1 }
          sb += 1
        }

        // chroma mode decision (one mode, applied to both planes)
        val cbx = mbx * 8
        val cby = mby * 8
        var bestUv = DcPred
        var bestUvSad = Long.MaxValue
        m = DcPred
        while (m <= TmPred) {
          val pu = predictBlock(recU, cbx, cby, 8, m)
          val pv = predictBlock(recV, cbx, cby, 8, m)
          val s = sad(pu, srcU, cbx, cby, 8) + sad(pv, srcV, cbx, cby, 8)
          if (s < bestUvSad) { bestUvSad = s; bestUv = m }
          m += 1
        }
        mb.uvMode = bestUv
        val uPred = predictBlock(recU, cbx, cby, 8, bestUv)
        val vPred = predictBlock(recV, cbx, cby, 8, bestUv)
        var cb = 0
        while (cb < 8) {
          val (srcP, pred) = if (cb < 4) (srcU, uPred) else (srcV, vPred)
          val bi = cb & 3
          val ox = (bi & 1) * 4
          val oy = (bi >> 1) * 4
          i = 0
          while (i < 16) {
            val x = ox + (i & 3)
            val y = oy + (i >> 2)
            res(i) = srcP(cbx + x, cby + y) - pred(y * 8 + x)
            i += 1
          }
          val co = fdct4x4(res)
          val out = mb.blocks(16 + cb)
          i = 0
          while (i < 16) {
            out(i) = quantize(co(i), if (i == 0) q.uvdc else q.uvac)
            i += 1
          }
          cb += 1
        }

        mb.skip = mb.y2.forall(_ == 0) && mb.blocks.forall(_.forall(_ == 0))

        // reconstruct exactly as the decoder will
        reconstructMb(mb, q, rec, recU, recV, mbx, mby,
          yPred, uPred, vPred)
        mbx += 1
      }
      mby += 1
    }

    // --- partition 1: frame header + per-MB modes -------------------
    val skips = mbs.count(_.skip)
    val probSkipFalse =
      math.max(1, math.min(254, ((mbs.length - skips) * 256 + mbs.length / 2) / mbs.length))
    val p1 = new BoolEncoder
    p1.literal(0, 1) // color space
    p1.literal(0, 1) // clamping type
    p1.literal(0, 1) // segmentation_enabled
    p1.literal(0, 1) // filter_type
    p1.literal(0, 6) // loop_filter_level = 0 (disabled)
    p1.literal(0, 3) // sharpness
    p1.literal(0, 1) // loop_filter_adj_enable
    p1.literal(0, 2) // log2(token partitions) = 0 -> 1 partition
    p1.literal(qualityToQIndex(quality), 7) // y_ac_qi
    var d = 0
    while (d < 5) { p1.literal(0, 1); d += 1 } // all quantizer deltas off
    p1.literal(0, 1) // refresh_entropy_probs
    var t = 0
    while (t < 4 * 8 * 3 * 11) { p1.bool(CoefUpdateProb, bit = false); t += 1 }
    p1.literal(1, 1) // mb_no_coeff_skip
    p1.literal(probSkipFalse, 8)
    for (mb <- mbs) {
      p1.bool(probSkipFalse, mb.skip)
      p1.tree(KfYModeTree, KfYModeProb, mb.yMode)
      p1.tree(UvModeTree, KfUvModeProb, mb.uvMode)
    }
    val part1 = p1.finish()

    // --- partition 2: coefficient tokens ----------------------------
    val p2 = new BoolEncoder
    val aboveY = new Array[Int](mbW * 4)
    val aboveU = new Array[Int](mbW * 2)
    val aboveV = new Array[Int](mbW * 2)
    val aboveY2 = new Array[Int](mbW)
    mby = 0
    while (mby < mbH) {
      val leftY = new Array[Int](4)
      val leftU = new Array[Int](2)
      val leftV = new Array[Int](2)
      var leftY2 = 0
      var mbx = 0
      while (mbx < mbW) {
        val mb = mbs(mby * mbW + mbx)
        if (mb.skip) {
          java.util.Arrays.fill(leftY, 0)
          java.util.Arrays.fill(leftU, 0)
          java.util.Arrays.fill(leftV, 0)
          var k = 0
          while (k < 4) { aboveY(mbx * 4 + k) = 0; k += 1 }
          aboveU(mbx * 2) = 0; aboveU(mbx * 2 + 1) = 0
          aboveV(mbx * 2) = 0; aboveV(mbx * 2 + 1) = 0
          // this encoder always emits a Y2 block (no B_PRED), so the
          // Y2 context is cleared too (RFC reset rule)
          aboveY2(mbx) = 0; leftY2 = 0
        } else {
          val nzY2 = encodeCoefs(p2, mb.y2, 0, PlaneY2, aboveY2(mbx) + leftY2)
          val n2 = if (nzY2) 1 else 0
          aboveY2(mbx) = n2; leftY2 = n2
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val ctx = aboveY(mbx * 4 + c) + leftY(r)
            val nz = encodeCoefs(p2, mb.blocks(sb), 1, PlaneYNoDc, ctx)
            val n = if (nz) 1 else 0
            aboveY(mbx * 4 + c) = n; leftY(r) = n
            sb += 1
          }
          var cb = 0
          while (cb < 8) {
            val bi = cb & 3
            val r = bi >> 1
            val c = bi & 1
            val (above, left) = if (cb < 4) (aboveU, leftU) else (aboveV, leftV)
            val ctx = above(mbx * 2 + c) + left(r)
            val nz = encodeCoefs(p2, mb.blocks(16 + cb), 0, PlaneUv, ctx)
            val n = if (nz) 1 else 0
            above(mbx * 2 + c) = n; left(r) = n
            cb += 1
          }
        }
        mbx += 1
      }
      mby += 1
    }
    val part2 = p2.finish()

    // --- assemble: uncompressed header + partitions -----------------
    // the frame tag holds part-1's length in 19 bits; overflow would
    // silently corrupt the header into an undecodable file
    require(part1.length < (1 << 19),
      s"VP8 part-1 size ${part1.length} exceeds the 19-bit frame-tag limit " +
        s"(${(1 << 19) - 1} bytes); image too complex/large for one partition")
    val header = new Array[Byte](10)
    val tag = (part1.length << 5) | (1 << 4) | 0 // show_frame, keyframe, version 0
    header(0) = (tag & 0xff).toByte
    header(1) = ((tag >> 8) & 0xff).toByte
    header(2) = ((tag >> 16) & 0xff).toByte
    header(3) = 0x9d.toByte
    header(4) = 0x01
    header(5) = 0x2a
    header(6) = (w & 0xff).toByte
    header(7) = ((w >> 8) & 0x3f).toByte
    header(8) = (h & 0xff).toByte
    header(9) = ((h >> 8) & 0x3f).toByte
    val vp8 = header ++ part1 ++ part2
    riffLossy(vp8)
  }

  /** Shared reconstruction used by encoder (for prediction feedback)
    * and decoder: dequantize, inverse transforms, add prediction.
    */
  private def reconstructMb(
      mb: MbData, q: Quantizers,
      rec: Plane, recU: Plane, recV: Plane,
      mbx: Int, mby: Int,
      yPred: Array[Int], uPred: Array[Int], vPred: Array[Int]): Unit = {
    val bx = mbx * 16
    val by = mby * 16
    val deq = new Array[Int](16)
    var i = 0
    while (i < 16) {
      deq(i) = mb.y2(i) * (if (i == 0) q.y2dc else q.y2ac)
      i += 1
    }
    val dcs = iwht4x4(deq)
    var sb = 0
    while (sb < 16) {
      val co = new Array[Int](16)
      co(0) = dcs(sb)
      i = 1
      while (i < 16) { co(i) = mb.blocks(sb)(i) * q.y1ac; i += 1 }
      val px = idct4x4(co)
      val ox = (sb & 3) * 4
      val oy = (sb >> 2) * 4
      i = 0
      while (i < 16) {
        val x = ox + (i & 3)
        val y = oy + (i >> 2)
        rec(bx + x, by + y) = clamp255(yPred(y * 16 + x) + px(i))
        i += 1
      }
      sb += 1
    }
    val cbx = mbx * 8
    val cby = mby * 8
    var cb = 0
    while (cb < 8) {
      val (recP, pred) = if (cb < 4) (recU, uPred) else (recV, vPred)
      val co = new Array[Int](16)
      i = 0
      while (i < 16) {
        co(i) = mb.blocks(16 + cb)(i) * (if (i == 0) q.uvdc else q.uvac)
        i += 1
      }
      val px = idct4x4(co)
      val bi = cb & 3
      val ox = (bi & 1) * 4
      val oy = (bi >> 1) * 4
      i = 0
      while (i < 16) {
        val x = ox + (i & 3)
        val y = oy + (i >> 2)
        recP(cbx + x, cby + y) = clamp255(pred(y * 8 + x) + px(i))
        i += 1
      }
      cb += 1
    }
  }

  private def riffLossy(vp8: Array[Byte]): Array[Byte] = {
    val chunkLen = vp8.length
    val padded = chunkLen + (chunkLen & 1)
    val total = 4 + 8 + padded // "WEBP" + "VP8 " header + payload
    val out = new Array[Byte](8 + total)
    def put4(o: Int, s: String): Unit = { var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 } }
    def putLe(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    put4(0, "RIFF"); putLe(4, total); put4(8, "WEBP"); put4(12, "VP8 ")
    putLe(16, chunkLen)
    System.arraycopy(vp8, 0, out, 20, chunkLen)
    out
  }

  /** RIFF container sniff for LOSSY webp ("VP8 " chunk). */
  def isLossyWebp(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 20 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P' &&
      bytes(12) == 'V' && bytes(13) == 'P' && bytes(14) == '8' && bytes(15) == ' '

  // ------------------------------------------------------------------
  // Decoder (subset: key frames, no segmentation/filter deps, 16x16
  // modes; B_PRED rejected with a clear error)
  // ------------------------------------------------------------------

  def decodeLossy(bytes: Array[Byte]): BufferedImage = {
    require(isLossyWebp(bytes), "not a lossy (VP8) webp payload")
    val dataOff = 20
    val dataLen = ((bytes(16) & 0xff) | ((bytes(17) & 0xff) << 8) |
      ((bytes(18) & 0xff) << 16) | ((bytes(19) & 0xff) << 24))
    require(dataOff + dataLen <= bytes.length, "truncated VP8 chunk")
    val tag = (bytes(dataOff) & 0xff) | ((bytes(dataOff + 1) & 0xff) << 8) |
      ((bytes(dataOff + 2) & 0xff) << 16)
    require((tag & 1) == 0, "not a key frame")
    val part1Len = tag >> 5
    require((bytes(dataOff + 3) & 0xff) == 0x9d &&
      (bytes(dataOff + 4) & 0xff) == 0x01 &&
      (bytes(dataOff + 5) & 0xff) == 0x2a, "bad VP8 start code")
    val w = ((bytes(dataOff + 6) & 0xff) | ((bytes(dataOff + 7) & 0xff) << 8)) & 0x3fff
    val h = ((bytes(dataOff + 8) & 0xff) | ((bytes(dataOff + 9) & 0xff) << 8)) & 0x3fff
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val p1Start = dataOff + 10
    val p2Start = p1Start + part1Len
    val d1 = new BoolDecoder(bytes, p1Start, p2Start)

    d1.literal(1) // color space
    d1.literal(1) // clamping
    require(d1.literal(1) == 0, "segmentation not supported by this decoder subset")
    d1.literal(1) // filter type
    d1.literal(6) // filter level (output ignores loop filtering)
    d1.literal(3) // sharpness
    if (d1.literal(1) == 1) { // loop_filter_adj_enable
      if (d1.literal(1) == 1) { // mode_ref_lf_delta_update
        var i = 0
        while (i < 8) {
          if (d1.literal(1) == 1) { d1.literal(6); d1.literal(1) }
          i += 1
        }
      }
    }
    require(d1.literal(2) == 0, "multiple token partitions not supported")
    val yacQi = d1.literal(7)
    def delta(): Int = if (d1.literal(1) == 1) {
      val mag = d1.literal(4)
      if (d1.literal(1) == 1) -mag else mag
    } else 0
    val ydc = delta(); val y2dc = delta(); val y2ac = delta()
    val uvdc = delta(); val uvac = delta()
    require(ydc == 0 && y2dc == 0 && y2ac == 0 && uvdc == 0 && uvac == 0,
      "quantizer deltas not supported by this decoder subset")
    val q = quantizers(yacQi)
    d1.literal(1) // refresh_entropy_probs
    var t = 0
    while (t < 4 * 8 * 3 * 11) {
      if (d1.bool(CoefUpdateProb)) d1.literal(8)
      t += 1
    }
    val noSkip = d1.literal(1) == 1
    val probSkipFalse = if (noSkip) d1.literal(8) else 0

    val mbs = new Array[MbData](mbW * mbH)
    var i = 0
    while (i < mbs.length) {
      val mb = new MbData
      mb.skip = noSkip && d1.bool(probSkipFalse)
      mb.yMode = d1.tree(KfYModeTree, KfYModeProb)
      require(mb.yMode != BPred, "B_PRED not supported by this decoder subset")
      mb.uvMode = d1.tree(UvModeTree, KfUvModeProb)
      mbs(i) = mb
      i += 1
    }

    val d2 = new BoolDecoder(bytes, p2Start, dataOff + dataLen)
    val aboveY = new Array[Int](mbW * 4)
    val aboveU = new Array[Int](mbW * 2)
    val aboveV = new Array[Int](mbW * 2)
    val aboveY2 = new Array[Int](mbW)
    val rec = new Plane(mbW * 16, mbH * 16)
    val recU = new Plane(mbW * 8, mbH * 8)
    val recV = new Plane(mbW * 8, mbH * 8)
    var mby = 0
    while (mby < mbH) {
      val leftY = new Array[Int](4)
      val leftU = new Array[Int](2)
      val leftV = new Array[Int](2)
      var leftY2 = 0
      var mbx = 0
      while (mbx < mbW) {
        val mb = mbs(mby * mbW + mbx)
        if (mb.skip) {
          java.util.Arrays.fill(leftY, 0)
          java.util.Arrays.fill(leftU, 0)
          java.util.Arrays.fill(leftV, 0)
          var k = 0
          while (k < 4) { aboveY(mbx * 4 + k) = 0; k += 1 }
          aboveU(mbx * 2) = 0; aboveU(mbx * 2 + 1) = 0
          aboveV(mbx * 2) = 0; aboveV(mbx * 2 + 1) = 0
          aboveY2(mbx) = 0; leftY2 = 0
        } else {
          val nzY2 = decodeCoefs(d2, mb.y2, 0, PlaneY2, aboveY2(mbx) + leftY2)
          val n2 = if (nzY2) 1 else 0
          aboveY2(mbx) = n2; leftY2 = n2
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val ctx = aboveY(mbx * 4 + c) + leftY(r)
            val nz = decodeCoefs(d2, mb.blocks(sb), 1, PlaneYNoDc, ctx)
            val n = if (nz) 1 else 0
            aboveY(mbx * 4 + c) = n; leftY(r) = n
            sb += 1
          }
          var cb = 0
          while (cb < 8) {
            val bi = cb & 3
            val r = bi >> 1
            val c = bi & 1
            val (above, left) = if (cb < 4) (aboveU, leftU) else (aboveV, leftV)
            val ctx = above(mbx * 2 + c) + left(r)
            val nz = decodeCoefs(d2, mb.blocks(16 + cb), 0, PlaneUv, ctx)
            val n = if (nz) 1 else 0
            above(mbx * 2 + c) = n; left(r) = n
            cb += 1
          }
        }
        // reconstruct (prediction from already-reconstructed neighbors)
        val yPred = predictBlock(rec, mbx * 16, mby * 16, 16, mb.yMode)
        val uPred = predictBlock(recU, mbx * 8, mby * 8, 8, mb.uvMode)
        val vPred = predictBlock(recV, mbx * 8, mby * 8, 8, mb.uvMode)
        reconstructMb(mb, q, rec, recU, recV, mbx, mby, yPred, uPred, vPred)
        mbx += 1
      }
      mby += 1
    }
    fromYuv420(rec, recU, recV, w, h)
  }
}
