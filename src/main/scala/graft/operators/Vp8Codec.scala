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
  * modes (DC/V/H/TM) plus per-MB B_PRED (all ten 4x4 submodes with
  * intra-MB prediction feedback, rate-distortion mode decision) +
  * 8x8 chroma modes, one token partition, the NORMAL loop filter at
  * an encoder-measured adaptive level (level 0 kept when smoothing
  * would hurt), no segmentation. That is a fully valid VP8 bitstream
  * subset — every feature left out is signalled off in the frame
  * header, not assumed. The decoder accepts the same subset
  * and exists so round-trip/PSNR tests can run in this offline
  * sandbox, where no other webp codec is available. See [[Vp8Tables]]
  * for the probability-table fidelity notes (coef update flags and
  * the context-free B submode probs).
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

  /** 4x4 subblock intra prediction (RFC 6386 §12.3), all ten B_*
    * modes. Pixels are read through `px(x, y)` so the encoder can
    * compose a scratch MB over the reconstructed frame; borders follow
    * the frame-edge conventions of [[predictBlock]] (127 above, 129
    * left). `ar` supplies the four above-right pixels (the caller owns
    * the VP8 availability rules for them).
    */
  private def predictSubBlock(px: (Int, Int) => Int, x: Int, y: Int,
                              mode: Int, ar: Array[Int]): Array[Int] = {
    val hasAbove = y > 0
    val hasLeft = x > 0
    val A = new Array[Int](4)
    val L = new Array[Int](4)
    var i = 0
    while (i < 4) {
      A(i) = if (hasAbove) px(x + i, y - 1) else 127
      L(i) = if (hasLeft) px(x - 1, y + i) else 129
      i += 1
    }
    val P = if (!hasAbove) 127 else if (!hasLeft) 129 else px(x - 1, y - 1)
    val out = new Array[Int](16)
    @inline def avg2(a: Int, b: Int) = (a + b + 1) >> 1
    @inline def avg3(a: Int, b: Int, c: Int) = (a + 2 * b + c + 2) >> 2
    @inline def set(r: Int, c: Int, v: Int): Unit = out(r * 4 + c) = v
    mode match {
      case BDcPred =>
        val dc = (A(0) + A(1) + A(2) + A(3) + L(0) + L(1) + L(2) + L(3) + 4) >> 3
        java.util.Arrays.fill(out, dc)
      case BTmPred =>
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { set(r, c, clamp255(L(r) + A(c) - P)); c += 1 }
          r += 1
        }
      case BVePred =>
        val col = Array(avg3(P, A(0), A(1)), avg3(A(0), A(1), A(2)),
          avg3(A(1), A(2), A(3)), avg3(A(2), A(3), ar(0)))
        var r = 0
        while (r < 4) { var c = 0; while (c < 4) { set(r, c, col(c)); c += 1 }; r += 1 }
      case BHePred =>
        val rowv = Array(avg3(P, L(0), L(1)), avg3(L(0), L(1), L(2)),
          avg3(L(1), L(2), L(3)), avg3(L(2), L(3), L(3)))
        var r = 0
        while (r < 4) { var c = 0; while (c < 4) { set(r, c, rowv(r)); c += 1 }; r += 1 }
      case BLdPred =>
        val X = Array(A(0), A(1), A(2), A(3), ar(0), ar(1), ar(2), ar(3))
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val k = r + c
            set(r, c, if (k == 6) avg3(X(6), X(7), X(7)) else avg3(X(k), X(k + 1), X(k + 2)))
            c += 1
          }
          r += 1
        }
      case BRdPred =>
        // edge array bottom-up: L3 L2 L1 L0 P A0 A1 A2 A3
        val E = Array(L(3), L(2), L(1), L(0), P, A(0), A(1), A(2), A(3))
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val k = c - r + 3 // 0..6
            set(r, c, avg3(E(k), E(k + 1), E(k + 2)))
            c += 1
          }
          r += 1
        }
      case BVrPred =>
        set(3, 0, avg3(L(2), L(1), L(0)))
        set(2, 0, avg3(L(1), L(0), P))
        val v10 = avg3(L(0), P, A(0)); set(3, 1, v10); set(1, 0, v10)
        val v00 = avg2(P, A(0)); set(2, 1, v00); set(0, 0, v00)
        val v11 = avg3(P, A(0), A(1)); set(3, 2, v11); set(1, 1, v11)
        val v01 = avg2(A(0), A(1)); set(2, 2, v01); set(0, 1, v01)
        val v12 = avg3(A(0), A(1), A(2)); set(3, 3, v12); set(1, 2, v12)
        val v02 = avg2(A(1), A(2)); set(2, 3, v02); set(0, 2, v02)
        set(1, 3, avg3(A(1), A(2), A(3)))
        set(0, 3, avg2(A(2), A(3)))
      case BVlPred =>
        set(0, 0, avg2(A(0), A(1)))
        set(1, 0, avg3(A(0), A(1), A(2)))
        val a12 = avg2(A(1), A(2)); set(2, 0, a12); set(0, 1, a12)
        val a123 = avg3(A(1), A(2), A(3)); set(3, 0, a123); set(1, 1, a123)
        val a23 = avg2(A(2), A(3)); set(2, 1, a23); set(0, 2, a23)
        val a234 = avg3(A(2), A(3), ar(0)); set(3, 1, a234); set(1, 2, a234)
        val a34 = avg2(A(3), ar(0)); set(2, 2, a34); set(0, 3, a34)
        val a345 = avg3(A(3), ar(0), ar(1)); set(3, 2, a345); set(1, 3, a345)
        set(2, 3, avg3(ar(0), ar(1), ar(2)))
        set(3, 3, avg3(ar(1), ar(2), ar(3)))
      case BHdPred =>
        set(3, 0, avg2(L(3), L(2)))
        set(3, 1, avg3(L(3), L(2), L(1)))
        val l21 = avg2(L(2), L(1)); set(2, 0, l21); set(3, 2, l21)
        val l210 = avg3(L(2), L(1), L(0)); set(2, 1, l210); set(3, 3, l210)
        val l10 = avg2(L(1), L(0)); set(2, 2, l10); set(1, 0, l10)
        val l10p = avg3(L(1), L(0), P); set(2, 3, l10p); set(1, 1, l10p)
        val l0p = avg2(L(0), P); set(1, 2, l0p); set(0, 0, l0p)
        val l0pa = avg3(L(0), P, A(0)); set(1, 3, l0pa); set(0, 1, l0pa)
        set(0, 2, avg3(P, A(0), A(1)))
        set(0, 3, avg3(A(0), A(1), A(2)))
      case BHuPred =>
        set(0, 0, avg2(L(0), L(1)))
        set(0, 1, avg3(L(0), L(1), L(2)))
        val l12 = avg2(L(1), L(2)); set(0, 2, l12); set(1, 0, l12)
        val l123 = avg3(L(1), L(2), L(3)); set(0, 3, l123); set(1, 1, l123)
        val l23 = avg2(L(2), L(3)); set(1, 2, l23); set(2, 0, l23)
        val l233 = avg3(L(2), L(3), L(3)); set(1, 3, l233); set(2, 1, l233)
        set(2, 2, L(3)); set(2, 3, L(3))
        set(3, 0, L(3)); set(3, 1, L(3)); set(3, 2, L(3)); set(3, 3, L(3))
      case m => throw new IllegalArgumentException(s"unsupported submode $m")
    }
    out
  }

  /** The four above-right prediction pixels of the 4x4 subblock at
    * plane position (x, y) inside the MB at (mbx, mby) — VP8's
    * availability rules: right-column subblocks read the row above the
    * NEXT macroblock (decoded rows only), replicated at the frame's
    * right edge; everything else reads pixels already reconstructed in
    * scan order; 127 when there is no row above.
    */
  private def aboveRightOf(px: (Int, Int) => Int, planeW: Int,
                           x: Int, y: Int, mbx: Int): Int => Int = {
    val bx = mbx * 16
    if (y == 0) _ => 127
    else if ((x & 15) == 12) {
      // right column: the above MB row beyond this MB's right edge,
      // clamped (= border replication) at the frame edge; 127 when the
      // MB sits in the top row (no decoded row above the MB)
      val ay = (y / 16) * 16 - 1
      if (ay < 0) _ => 127
      else i => px(math.min(bx + 16 + i, planeW - 1), ay)
    } else { i => px(x + 4 + i, y - 1) }
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
    /** 4x4 submodes, used only when yMode == BPred. */
    val bModes = new Array[Int](16)
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
  /** Per-thread count of B_PRED macroblocks chosen by the most recent
    * [[encodeLossy]] call — test observability for the mode decision.
    */
  private[graft] val lastBPredCount = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Test-only switch: disables the B_PRED candidate so specs can
    * measure the 16x16-only baseline on the same build. Production
    * code never touches this.
    */
  @volatile private[graft] var bPredEnabled = true

  /** Test-only switch: restricts the loop-filter level search to 0 so
    * specs can measure the unfiltered baseline on the same build.
    */
  @volatile private[graft] var loopFilterEnabled = true

  /** Loop-filter level chosen by the most recent [[encodeLossy]]. */
  private[graft] val lastFilterLevel = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

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

        // luma mode decision on reconstructed neighbors: best 16x16
        // mode vs B_PRED (per-subblock best-of-10 with exact intra-MB
        // reconstruction feedback through a scratch overlay)
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

        // B_PRED candidate: scratch holds this MB's tentative luma
        // recon; reads outside the MB fall through to the real frame
        val scratch = new Array[Int](256)
        val spx: (Int, Int) => Int = (x, y) =>
          if (x >= bx && x < bx + 16 && y >= by && y < by + 16)
            scratch((y - by) * 16 + (x - bx))
          else rec(x, y)
        var bSad = 0L
        val bModes = new Array[Int](16)
        val bCoefs = Array.fill(16)(new Array[Int](16))
        var sb = 0
        while (sb < 16) {
          val ox = (sb & 3) * 4
          val oy = (sb >> 2) * 4
          val x = bx + ox
          val y = by + oy
          val arF = aboveRightOf(spx, rec.w, x, y, mbx)
          val ar = Array(arF(0), arF(1), arF(2), arF(3))
          var bm = BDcPred
          var bmSad = Long.MaxValue
          var bmPred: Array[Int] = null
          var sm = BDcPred
          while (sm <= BHuPred) {
            val pr = predictSubBlock(spx, x, y, sm, ar)
            var s = 0L
            var i = 0
            while (i < 16) {
              s += math.abs(src(x + (i & 3), y + (i >> 2)) - pr(i))
              i += 1
            }
            if (s < bmSad) { bmSad = s; bm = sm; bmPred = pr }
            sm += 1
          }
          bModes(sb) = bm
          bSad += bmSad
          // quantize the residual and reconstruct into the scratch so
          // the NEXT subblock predicts from decoder-identical pixels
          var i = 0
          while (i < 16) {
            res(i) = src(x + (i & 3), y + (i >> 2)) - bmPred(i)
            i += 1
          }
          val co = fdct4x4(res)
          val qb = bCoefs(sb)
          val deq = new Array[Int](16)
          i = 0
          while (i < 16) {
            val qv = if (i == 0) q.y1dc else q.y1ac
            qb(i) = quantize(co(i), qv)
            deq(i) = qb(i) * qv
            i += 1
          }
          val pxl = idct4x4(deq)
          i = 0
          while (i < 16) {
            scratch((oy + (i >> 2)) * 16 + (ox + (i & 3))) = clamp255(bmPred(i) + pxl(i))
            i += 1
          }
          sb += 1
        }

        // B_PRED RECONSTRUCTION distortion (prediction SAD alone is
        // misleading: B_PRED quantizes each DC with y1dc directly,
        // while the 16x16 path refines DCs through the Y2/WHT — at
        // coarse quantizers that difference dominates)
        var bSsd = 0L
        var py = 0
        while (py < 16) {
          var pxi = 0
          while (pxi < 16) {
            val d = scratch(py * 16 + pxi) - src(bx + pxi, by + py)
            bSsd += d.toLong * d
            pxi += 1
          }
          py += 1
        }

        // 16x16 candidate: transform + quantize + reconstruct + SSD
        // (the same arithmetic reconstructMb will run if it wins)
        val dcs = new Array[Int](16)
        val yCoefs = new Array[Array[Int]](16)
        sb = 0
        while (sb < 16) {
          val ox = (sb & 3) * 4
          val oy = (sb >> 2) * 4
          var i = 0
          while (i < 16) {
            val x = ox + (i & 3)
            val y = oy + (i >> 2)
            res(i) = src(bx + x, by + y) - bestPred(y * 16 + x)
            i += 1
          }
          val co = fdct4x4(res)
          dcs(sb) = co(0)
          yCoefs(sb) = co
          sb += 1
        }
        val y2raw = fwht4x4(dcs)
        val y2q = new Array[Int](16)
        var i = 0
        while (i < 16) {
          y2q(i) = quantize(y2raw(i), if (i == 0) q.y2dc else q.y2ac)
          i += 1
        }
        val blk16 = Array.fill(16)(new Array[Int](16))
        sb = 0
        while (sb < 16) {
          val out = blk16(sb)
          i = 1
          while (i < 16) { out(i) = quantize(yCoefs(sb)(i), q.y1ac); i += 1 }
          sb += 1
        }
        var ssd16 = 0L
        locally {
          val deq = new Array[Int](16)
          i = 0
          while (i < 16) { deq(i) = y2q(i) * (if (i == 0) q.y2dc else q.y2ac); i += 1 }
          val dcRec = iwht4x4(deq)
          sb = 0
          while (sb < 16) {
            val co = new Array[Int](16)
            co(0) = dcRec(sb)
            i = 1
            while (i < 16) { co(i) = blk16(sb)(i) * q.y1ac; i += 1 }
            val pxl = idct4x4(co)
            val ox = (sb & 3) * 4
            val oy = (sb >> 2) * 4
            i = 0
            while (i < 16) {
              val x = ox + (i & 3)
              val y = oy + (i >> 2)
              val d = clamp255(bestPred(y * 16 + x) + pxl(i)) - src(bx + x, by + y)
              ssd16 += d.toLong * d
              i += 1
            }
            sb += 1
          }
        }

        // Rate-distortion decision: cost = SSD + λ·bits, with a token
        // proxy for bits (≈3 bits per nonzero coefficient plus its
        // magnitude length) and λ ∝ squared quantizer step — the
        // standard RD shape. B_PRED additionally pays its 16 submode
        // codes (~4 bits each).
        def coefBits(c: Array[Int]): Long = {
          var bits = 0L
          var k = 0
          while (k < 16) {
            val v = math.abs(c(k))
            if (v > 0) bits += 3 + (32 - Integer.numberOfLeadingZeros(v))
            k += 1
          }
          bits
        }
        val lambda = math.max(1L, q.y1ac.toLong * q.y1ac / 4)
        var bits16 = coefBits(y2q)
        var bitsB = 64L // 16 submode codes
        sb = 0
        while (sb < 16) {
          bits16 += coefBits(blk16(sb))
          bitsB += coefBits(bCoefs(sb))
          sb += 1
        }
        val useBPred = bPredEnabled && bSsd + lambda * bitsB < ssd16 + lambda * bits16
        val yPred: Array[Int] =
          if (useBPred) {
            mb.yMode = BPred
            System.arraycopy(bModes, 0, mb.bModes, 0, 16)
            sb = 0
            while (sb < 16) {
              System.arraycopy(bCoefs(sb), 0, mb.blocks(sb), 0, 16)
              sb += 1
            }
            // commit the luma recon through the SAME function the
            // decoder runs — no scratch-vs-decoder drift possible
            reconstructLumaBPred(mb, q, rec, mbx, mby)
            null
          } else {
            mb.yMode = bestMode
            System.arraycopy(y2q, 0, mb.y2, 0, 16)
            sb = 0
            while (sb < 16) {
              System.arraycopy(blk16(sb), 0, mb.blocks(sb), 0, 16)
              sb += 1
            }
            bestPred
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

    lastBPredCount.set(mbs.count(_.yMode == BPred))

    // --- adaptive loop-filter level ---------------------------------
    // The filter is an output stage (prediction uses unfiltered
    // recon), so the encoder can pick the level by measurement: apply
    // candidate levels to COPIES of the recon and keep the lowest
    // error vs source. Level 0 stays a candidate — enabling the
    // filter can never make output worse.
    val noCoefs: MbData => Boolean = mb =>
      mb.y2.forall(_ == 0) && mb.blocks.forall(_.forall(_ == 0))
    val hasInterior: Int => Boolean = i =>
      !noCoefs(mbs(i)) || mbs(i).yMode == BPred
    // SSE over the VISIBLE region only: the padded replication columns
    // and rows are cropped by the decoder's fromYuv420, so letting
    // them vote on the level could pick a filter that smooths padding
    // while blurring pixels the user actually sees — breaking the
    // "enabling the filter never makes output worse" invariant.
    def planeSse(a: Plane, b: Plane, vw: Int, vh: Int): Long = {
      var s = 0L
      var y = 0
      while (y < vh) {
        var x = 0
        while (x < vw) { val d = a(x, y) - b(x, y); s += d.toLong * d; x += 1 }
        y += 1
      }
      s
    }
    val (cw, ch) = ((w + 1) / 2, (h + 1) / 2)
    def copyPlane(p: Plane): Plane = {
      val c = new Plane(p.w, p.h)
      System.arraycopy(p.px, 0, c.px, 0, p.px.length)
      c
    }
    val qi = qualityToQIndex(quality)
    val candidates =
      if (loopFilterEnabled)
        Seq(0, math.max(1, qi / 12), math.max(1, qi / 6),
          math.min(63, math.max(1, qi / 3))).distinct
      else Seq(0)
    val filterLevel = candidates.minBy { lvl =>
      if (lvl == 0)
        planeSse(rec, src, w, h) + planeSse(recU, srcU, cw, ch) +
          planeSse(recV, srcV, cw, ch)
      else {
        val (fy, fu, fv) = (copyPlane(rec), copyPlane(recU), copyPlane(recV))
        applyLoopFilter(fy, fu, fv, hasInterior, mbW, mbH, lvl, 0)
        planeSse(fy, src, w, h) + planeSse(fu, srcU, cw, ch) +
          planeSse(fv, srcV, cw, ch)
      }
    }
    lastFilterLevel.set(filterLevel)

    // --- partition 1: frame header + per-MB modes -------------------
    val skips = mbs.count(_.skip)
    val probSkipFalse =
      math.max(1, math.min(254, ((mbs.length - skips) * 256 + mbs.length / 2) / mbs.length))
    val p1 = new BoolEncoder
    p1.literal(0, 1) // color space
    p1.literal(0, 1) // clamping type
    p1.literal(0, 1) // segmentation_enabled
    p1.literal(0, 1) // filter_type = 0 (normal)
    p1.literal(filterLevel, 6) // loop_filter_level (measured, 0 = off)
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
      if (mb.yMode == BPred) {
        var sb = 0
        while (sb < 16) { p1.tree(BModeTree, BModeProb, mb.bModes(sb)); sb += 1 }
      }
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
        val hasY2 = mb.yMode != BPred
        if (mb.skip) {
          java.util.Arrays.fill(leftY, 0)
          java.util.Arrays.fill(leftU, 0)
          java.util.Arrays.fill(leftV, 0)
          var k = 0
          while (k < 4) { aboveY(mbx * 4 + k) = 0; k += 1 }
          aboveU(mbx * 2) = 0; aboveU(mbx * 2 + 1) = 0
          aboveV(mbx * 2) = 0; aboveV(mbx * 2 + 1) = 0
          // RFC reset rule: the Y2 context is cleared only when the MB
          // HAS a Y2 block; a skipped B_PRED MB leaves it untouched
          if (hasY2) { aboveY2(mbx) = 0; leftY2 = 0 }
        } else {
          if (hasY2) {
            val nzY2 = encodeCoefs(p2, mb.y2, 0, PlaneY2, aboveY2(mbx) + leftY2)
            val n2 = if (nzY2) 1 else 0
            aboveY2(mbx) = n2; leftY2 = n2
          }
          // B_PRED: no Y2 — each luma block carries its own DC and is
          // coded as plane 3 ("Y with DC") from coefficient 0
          val yFirst = if (hasY2) 1 else 0
          val yPlane = if (hasY2) PlaneYNoDc else PlaneYWithDc
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val ctx = aboveY(mbx * 4 + c) + leftY(r)
            val nz = encodeCoefs(p2, mb.blocks(sb), yFirst, yPlane, ctx)
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

  /** B_PRED luma reconstruction — per-subblock predict → dequantize →
    * IDCT → add, with intra-MB prediction feedback (each subblock
    * predicts from the previous ones' reconstruction). ONE function
    * shared verbatim by encoder and decoder, so their reconstructions
    * cannot drift. No Y2: each 4x4 carries its own DC at `q.y1dc`.
    */
  private def reconstructLumaBPred(mb: MbData, q: Quantizers, rec: Plane,
                                   mbx: Int, mby: Int): Unit = {
    val bx = mbx * 16
    val by = mby * 16
    val px: (Int, Int) => Int = (x, y) => rec(x, y)
    var sb = 0
    while (sb < 16) {
      val ox = (sb & 3) * 4
      val oy = (sb >> 2) * 4
      val x = bx + ox
      val y = by + oy
      val arF = aboveRightOf(px, rec.w, x, y, mbx)
      val ar = Array(arF(0), arF(1), arF(2), arF(3))
      val pred = predictSubBlock(px, x, y, mb.bModes(sb), ar)
      val deq = new Array[Int](16)
      var i = 0
      while (i < 16) {
        deq(i) = mb.blocks(sb)(i) * (if (i == 0) q.y1dc else q.y1ac)
        i += 1
      }
      val pxl = idct4x4(deq)
      i = 0
      while (i < 16) {
        rec(x + (i & 3), y + (i >> 2)) = clamp255(pred(i) + pxl(i))
        i += 1
      }
      sb += 1
    }
  }

  /** Shared reconstruction used by encoder (for prediction feedback)
    * and decoder: dequantize, inverse transforms, add prediction.
    * `yPred == null` means luma was already reconstructed (B_PRED
    * path, [[reconstructLumaBPred]]) — only chroma is done here.
    */
  private def reconstructMb(
      mb: MbData, q: Quantizers,
      rec: Plane, recU: Plane, recV: Plane,
      mbx: Int, mby: Int,
      yPred: Array[Int], uPred: Array[Int], vPred: Array[Int]): Unit = {
    val bx = mbx * 16
    val by = mby * 16
    var i = 0
    if (yPred != null) {
      val deq = new Array[Int](16)
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

  // ------------------------------------------------------------------
  // Loop filter (RFC 6386 §15, "normal" filter) — an OUTPUT stage:
  // intra prediction within the frame uses UNFILTERED reconstruction
  // (both here and in the spec), so the filter affects only what the
  // decoder hands back (and, in full VP8, the next frame's reference).
  // The encoder picks the level by measuring filtered-vs-source error
  // over a few candidates — level 0 stays available, so enabling the
  // filter can never make output worse.
  // ------------------------------------------------------------------

  @inline private def sclamp(v: Int): Int =
    if (v < -128) -128 else if (v > 127) 127 else v

  /** Derived per-level thresholds (RFC 6386 §15.1). */
  private def filterLimits(level: Int, sharpness: Int): (Int, Int, Int, Int) = {
    var interior = level
    if (sharpness > 0) {
      interior >>= (if (sharpness > 4) 2 else 1)
      if (interior > 9 - sharpness) interior = 9 - sharpness
    }
    if (interior < 1) interior = 1
    val hev = if (level >= 40) 2 else if (level >= 15) 1 else 0 // key-frame table
    (2 * (level + 2) + interior, 2 * level + interior, interior, hev)
  }

  /** Filter one 8-pixel segment across an edge. `get`/`set` address
    * pixels at signed offsets from the edge: -4..-1 = p3..p0,
    * 0..3 = q0..q3. `mbEdge` selects the wider macroblock-edge taps.
    */
  private def filterSegment(get: Int => Int, set: (Int, Int) => Unit,
                            blimit: Int, ilimit: Int, hevT: Int,
                            mbEdge: Boolean): Unit = {
    val p3 = get(-4); val p2 = get(-3); val p1 = get(-2); val p0 = get(-1)
    val q0 = get(0); val q1 = get(1); val q2 = get(2); val q3 = get(3)
    val mask =
      math.abs(p3 - p2) <= ilimit && math.abs(p2 - p1) <= ilimit &&
      math.abs(p1 - p0) <= ilimit && math.abs(q1 - q0) <= ilimit &&
      math.abs(q2 - q1) <= ilimit && math.abs(q3 - q2) <= ilimit &&
      math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= blimit
    if (!mask) return
    val hev = math.abs(p1 - p0) > hevT || math.abs(q1 - q0) > hevT
    val ps2 = p2 - 128; val ps1 = p1 - 128; val ps0 = p0 - 128
    val qs0 = q0 - 128; val qs1 = q1 - 128; val qs2 = q2 - 128
    if (!mbEdge) {
      // subblock edge: 4-tap adjust, outer taps only without hev
      var a = if (hev) sclamp(ps1 - qs1) else 0
      a = sclamp(a + 3 * (qs0 - ps0))
      val f1 = sclamp(a + 4) >> 3
      val f2 = sclamp(a + 3) >> 3
      set(0, sclamp(qs0 - f1) + 128)
      set(-1, sclamp(ps0 + f2) + 128)
      if (!hev) {
        val o = (f1 + 1) >> 1
        set(1, sclamp(qs1 - o) + 128)
        set(-2, sclamp(ps1 + o) + 128)
      }
    } else {
      // MB edge: hev part gets the narrow adjust, the rest the wide
      // 27/18/9 >> 7 taps across three pixels each side
      val a = sclamp(sclamp(ps1 - qs1) + 3 * (qs0 - ps0))
      val ah = if (hev) a else 0
      val f1 = sclamp(ah + 4) >> 3
      val f2 = sclamp(ah + 3) >> 3
      var nq0 = sclamp(qs0 - f1)
      var np0 = sclamp(ps0 + f2)
      val aw = if (hev) 0 else a
      var u = sclamp((63 + aw * 27) >> 7)
      nq0 = sclamp(nq0 - u); np0 = sclamp(np0 + u)
      set(0, nq0 + 128); set(-1, np0 + 128)
      u = sclamp((63 + aw * 18) >> 7)
      set(1, sclamp(qs1 - u) + 128)
      set(-2, sclamp(ps1 + u) + 128)
      u = sclamp((63 + aw * 9) >> 7)
      set(2, sclamp(qs2 - u) + 128)
      set(-3, sclamp(ps2 + u) + 128)
    }
  }

  /** Normal loop filter over the padded planes, spec order: per MB in
    * raster scan — left MB edge, interior vertical edges, top MB edge,
    * interior horizontal edges; interior edges only when the MB has
    * coefficients or is B_PRED (RFC 6386 §15.2). `hasInterior(i)`
    * carries that per-MB flag.
    */
  private def applyLoopFilter(yP: Plane, uP: Plane, vP: Plane,
                              hasInterior: Int => Boolean,
                              mbW: Int, mbH: Int,
                              level: Int, sharpness: Int): Unit = {
    if (level == 0) return
    val (mbBlim, sbBlim, ilim, hevT) = filterLimits(level, sharpness)
    def vEdge(p: Plane, x: Int, y0: Int, n: Int, mbEdge: Boolean): Unit = {
      var y = y0
      val yEnd = y0 + n
      while (y < yEnd) {
        val row = y * p.w
        filterSegment(o => p.px(row + x + o), (o, v) => p.px(row + x + o) = v,
          if (mbEdge) mbBlim else sbBlim, ilim, hevT, mbEdge)
        y += 1
      }
    }
    def hEdge(p: Plane, x0: Int, y: Int, n: Int, mbEdge: Boolean): Unit = {
      var x = x0
      val xEnd = x0 + n
      while (x < xEnd) {
        filterSegment(o => p.px((y + o) * p.w + x), (o, v) => p.px((y + o) * p.w + x) = v,
          if (mbEdge) mbBlim else sbBlim, ilim, hevT, mbEdge)
        x += 1
      }
    }
    var mby = 0
    while (mby < mbH) {
      var mbx = 0
      while (mbx < mbW) {
        val interior = hasInterior(mby * mbW + mbx)
        val bx = mbx * 16; val by = mby * 16
        val cx = mbx * 8; val cy = mby * 8
        if (mbx > 0) {
          vEdge(yP, bx, by, 16, mbEdge = true)
          vEdge(uP, cx, cy, 8, mbEdge = true)
          vEdge(vP, cx, cy, 8, mbEdge = true)
        }
        if (interior) {
          vEdge(yP, bx + 4, by, 16, mbEdge = false)
          vEdge(yP, bx + 8, by, 16, mbEdge = false)
          vEdge(yP, bx + 12, by, 16, mbEdge = false)
          vEdge(uP, cx + 4, cy, 8, mbEdge = false)
          vEdge(vP, cx + 4, cy, 8, mbEdge = false)
        }
        if (mby > 0) {
          hEdge(yP, bx, by, 16, mbEdge = true)
          hEdge(uP, cx, cy, 8, mbEdge = true)
          hEdge(vP, cx, cy, 8, mbEdge = true)
        }
        if (interior) {
          hEdge(yP, bx, by + 4, 16, mbEdge = false)
          hEdge(yP, bx, by + 8, 16, mbEdge = false)
          hEdge(yP, bx, by + 12, 16, mbEdge = false)
          hEdge(uP, cx, cy + 4, 8, mbEdge = false)
          hEdge(vP, cx, cy + 4, 8, mbEdge = false)
        }
        mbx += 1
      }
      mby += 1
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
  // Decoder (subset: key frames, no segmentation/filter deps; 16x16
  // modes + B_PRED)
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
    val filterType = d1.literal(1)
    val filterLevel = d1.literal(6)
    val sharpness = d1.literal(3)
    require(filterType == 0 || filterLevel == 0,
      "simple loop filter not supported by this decoder subset")
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
      if (mb.yMode == BPred) {
        var sb = 0
        while (sb < 16) { mb.bModes(sb) = d1.tree(BModeTree, BModeProb); sb += 1 }
      }
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
        val hasY2 = mb.yMode != BPred
        if (mb.skip) {
          java.util.Arrays.fill(leftY, 0)
          java.util.Arrays.fill(leftU, 0)
          java.util.Arrays.fill(leftV, 0)
          var k = 0
          while (k < 4) { aboveY(mbx * 4 + k) = 0; k += 1 }
          aboveU(mbx * 2) = 0; aboveU(mbx * 2 + 1) = 0
          aboveV(mbx * 2) = 0; aboveV(mbx * 2 + 1) = 0
          if (hasY2) { aboveY2(mbx) = 0; leftY2 = 0 }
        } else {
          if (hasY2) {
            val nzY2 = decodeCoefs(d2, mb.y2, 0, PlaneY2, aboveY2(mbx) + leftY2)
            val n2 = if (nzY2) 1 else 0
            aboveY2(mbx) = n2; leftY2 = n2
          }
          val yFirst = if (hasY2) 1 else 0
          val yPlane = if (hasY2) PlaneYNoDc else PlaneYWithDc
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val ctx = aboveY(mbx * 4 + c) + leftY(r)
            val nz = decodeCoefs(d2, mb.blocks(sb), yFirst, yPlane, ctx)
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
        val yPred =
          if (mb.yMode == BPred) { reconstructLumaBPred(mb, q, rec, mbx, mby); null }
          else predictBlock(rec, mbx * 16, mby * 16, 16, mb.yMode)
        val uPred = predictBlock(recU, mbx * 8, mby * 8, 8, mb.uvMode)
        val vPred = predictBlock(recV, mbx * 8, mby * 8, 8, mb.uvMode)
        reconstructMb(mb, q, rec, recU, recV, mbx, mby, yPred, uPred, vPred)
        mbx += 1
      }
      mby += 1
    }
    // loop filter: output stage over the full padded planes, same
    // has-coefficients rule as the encoder's level measurement
    if (filterLevel > 0)
      applyLoopFilter(rec, recU, recV,
        i => {
          val mb = mbs(i)
          !(mb.y2.forall(_ == 0) && mb.blocks.forall(_.forall(_ == 0))) || mb.yMode == BPred
        },
        mbW, mbH, filterLevel, sharpness)
    fromYuv420(rec, recU, recV, w, h)
  }
}
