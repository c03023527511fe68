package graft

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Resizer, Vp8Codec, WebpCodec}

/** The lossy (VP8) webp codec: bool-coder symmetry, transform
  * inversion, full encode/decode round-trips with PSNR floors, the
  * quality knob's monotone size effect, and the Resizer wiring.
  * No external webp decoder exists in this sandbox, so — as with the
  * VP8L path — the verifying decoder is part of the codec (see the
  * fidelity note in Vp8Tables).
  */
class Vp8CodecSpec extends AnyFunSuite {

  // --- helpers ------------------------------------------------------

  private def gradient(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / math.max(1, w - 1)
      val g = (y * 255) / math.max(1, h - 1)
      val b = ((x + y) * 255) / math.max(1, w + h - 2)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def noisy(w: Int, h: Int, seed: Long): BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rnd.nextInt() & 0xffffff)
    img
  }

  private def flat(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  /** Photo-ish: smooth blobs + a few edges. */
  private def photoish(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (128 + 100 * math.sin(x / 17.0) * math.cos(y / 23.0)).toInt.max(0).min(255)
      val g = (128 + 90 * math.cos((x + y) / 31.0)).toInt.max(0).min(255)
      val b = if ((x / 32 + y / 32) % 2 == 0) 200 else 60
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight)
    var se = 0.0
    var n = 0
    for (y <- 0 until a.getHeight; x <- 0 until a.getWidth) {
      val pa = a.getRGB(x, y)
      val pb = b.getRGB(x, y)
      for (s <- Seq(16, 8, 0)) {
        val d = ((pa >> s) & 0xff) - ((pb >> s) & 0xff)
        se += d * d
        n += 1
      }
    }
    if (se == 0) Double.PositiveInfinity
    else 10 * math.log10(255.0 * 255.0 * n / se)
  }

  // --- primitives ---------------------------------------------------

  test("bool coder round-trips a random bit/probability stream") {
    val rnd = new scala.util.Random(7)
    val n = 200000
    val probs = Array.fill(n)(1 + rnd.nextInt(254))
    val bits = Array.fill(n)(rnd.nextBoolean())
    val enc = new Vp8Codec.BoolEncoder
    for (i <- 0 until n) enc.bool(probs(i), bits(i))
    val bytes = enc.finish()
    val dec = new Vp8Codec.BoolDecoder(bytes, 0, bytes.length)
    for (i <- 0 until n)
      assert(dec.bool(probs(i)) == bits(i), s"bit $i")
  }

  test("bool coder literals round-trip") {
    val rnd = new scala.util.Random(11)
    val vals = Array.fill(5000)(rnd.nextInt(256))
    val enc = new Vp8Codec.BoolEncoder
    vals.foreach(v => enc.literal(v, 8))
    val bytes = enc.finish()
    val dec = new Vp8Codec.BoolDecoder(bytes, 0, bytes.length)
    vals.foreach(v => assert(dec.literal(8) == v))
  }

  test("forward/inverse DCT round-trip within quantization-free tolerance") {
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 500) {
      val in = Array.fill(16)(rnd.nextInt(511) - 255) // residual range
      val out = Vp8Codec.idct4x4(Vp8Codec.fdct4x4(in))
      for (i <- 0 until 16)
        assert(math.abs(out(i) - in(i)) <= 2, s"in=${in.toSeq} out=${out.toSeq}")
    }
  }

  test("forward/inverse WHT round-trip within tolerance") {
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 500) {
      val in = Array.fill(16)(rnd.nextInt(2001) - 1000) // luma DC range
      val out = Vp8Codec.iwht4x4(Vp8Codec.fwht4x4(in))
      for (i <- 0 until 16)
        assert(math.abs(out(i) - in(i)) <= 2, s"in=${in.toSeq} out=${out.toSeq}")
    }
  }

  test("quantizer mapping: quality 100 -> qindex 0, quality 0 -> qindex 127, monotone") {
    assert(Vp8Codec.qualityToQIndex(100) == 0)
    assert(Vp8Codec.qualityToQIndex(0) == 127)
    val qs = (0 to 100).map(Vp8Codec.qualityToQIndex)
    assert(qs.sliding(2).forall(p => p.head >= p.last), "qindex must not increase with quality")
  }

  // --- full round-trips ---------------------------------------------

  test("gradient round-trips at q95 with high fidelity") {
    val img = gradient(64, 48)
    val bytes = Vp8Codec.encodeLossy(img, 95)
    assert(Vp8Codec.isLossyWebp(bytes))
    val back = Vp8Codec.decodeLossy(bytes)
    assert(back.getWidth == 64 && back.getHeight == 48)
    val p = psnr(img, back)
    assert(p > 35, s"PSNR $p too low for q95 gradient")
  }

  test("photo-ish image round-trips at q95 and q75") {
    val img = photoish(160, 120)
    for ((q, floor) <- Seq((95, 32.0), (75, 27.0))) {
      val bytes = Vp8Codec.encodeLossy(img, q)
      val back = Vp8Codec.decodeLossy(bytes)
      val p = psnr(img, back)
      assert(p > floor, s"PSNR $p below $floor at q$q")
    }
  }

  test("noise round-trips decodably at low quality") {
    val img = noisy(80, 64, 13L)
    val bytes = Vp8Codec.encodeLossy(img, 30)
    val back = Vp8Codec.decodeLossy(bytes)
    assert(back.getWidth == 80 && back.getHeight == 64)
    // random RGB noise loses ~half its chroma energy to 4:2:0
    // subsampling before quantization even starts — the floor only
    // guards against outright mis-decode
    assert(psnr(img, back) > 10)
  }

  test("flat image exercises the skip-macroblock path and stays tiny") {
    val img = flat(128, 128, 0x808080)
    val bytes = Vp8Codec.encodeLossy(img, 75)
    val back = Vp8Codec.decodeLossy(bytes)
    assert(psnr(img, back) > 35)
    assert(bytes.length < 600, s"flat 128x128 should be mostly skip MBs, got ${bytes.length}B")
  }

  test("non-multiple-of-16 dimensions round-trip (edge replication + crop)") {
    for ((w, h) <- Seq((17, 3), (1, 1), (33, 50), (100, 7))) {
      val img = gradient(w, h)
      val back = Vp8Codec.decodeLossy(Vp8Codec.encodeLossy(img, 90))
      assert(back.getWidth == w && back.getHeight == h, s"$w x $h")
      // tiny gradients step ~16 levels/pixel, so 4:2:0 subsampling
      // dominates the error budget; 18 dB still catches mis-cropping
      assert(psnr(img, back) > 18, s"$w x $h")
    }
    // flat odd-size images are immune to chroma subsampling: anything
    // below near-perfect here would mean broken padding or cropping
    for ((w, h) <- Seq((17, 3), (33, 50), (100, 7))) {
      val img = flat(w, h, 0x5a8232)
      val back = Vp8Codec.decodeLossy(Vp8Codec.encodeLossy(img, 90))
      assert(back.getWidth == w && back.getHeight == h, s"$w x $h")
      assert(psnr(img, back) > 40, s"flat $w x $h should be near-lossless")
    }
  }

  test("quality knob: lower quality never yields a larger photo-ish payload") {
    val img = photoish(128, 128)
    val sizes = Seq(95, 75, 50, 25).map(q => Vp8Codec.encodeLossy(img, q).length)
    assert(sizes.sliding(2).forall(p => p.head >= p.last),
      s"sizes should be non-increasing as quality drops: $sizes")
    assert(sizes.head > sizes.last, "q95 should cost more bytes than q25 on textured content")
  }

  test("B_PRED raises low-quality PSNR on thin diagonal detail (vs 16x16-only)") {
    // thin diagonal lines on a flat field: the 16x16 modes leave the
    // whole line in the residual, which coarse DCT quantization rings
    // away; the diagonal 4x4 submodes carry it in the PREDICTION.
    // Measured on this build: q25 23.42 dB / 544 B with B_PRED vs
    // 22.32 dB / 630 B without — better fidelity AND fewer bytes.
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = if ((x + y) % 16 < 2) 230 else 80
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def encodeAt(bpred: Boolean): (Double, Int, Int) = {
      Vp8Codec.bPredEnabled = bpred
      try {
        val enc = Vp8Codec.encodeLossy(img, 25)
        val n = Vp8Codec.lastBPredCount.get().intValue
        (psnr(img, Vp8Codec.decodeLossy(enc)), n, enc.length)
      } finally Vp8Codec.bPredEnabled = true
    }
    val (pOld, nOld, szOld) = encodeAt(bpred = false)
    val (pNew, nNew, szNew) = encodeAt(bpred = true)
    info(f"16x16-only: $pOld%.2f dB ($szOld B)   with B_PRED: $pNew%.2f dB ($szNew B, $nNew MBs)")
    assert(nOld == 0 && nNew > 0, s"mode decision must actually pick B_PRED here ($nNew)")
    assert(pNew > pOld + 0.75,
      f"B_PRED should raise the low-quality PSNR floor: $pOld%.2f -> $pNew%.2f dB")
    assert(szNew < szOld, s"and cost fewer bytes: $szNew vs $szOld")
    // and at high quality on dense diagonal texture it wins BOTH ways
    // (measured: 42.12 -> 42.78 dB, 7316 -> 5392 B)
    val tex = new BufferedImage(64, 64, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = if (((x + y) / 4) % 2 == 0) 220 else 40
      tex.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val e95 = Vp8Codec.encodeLossy(tex, 95)
    assert(Vp8Codec.lastBPredCount.get().intValue > 0)
    assert(psnr(tex, Vp8Codec.decodeLossy(e95)) > 42.5)
  }

  test("B_PRED round-trips across sizes and qualities (all submodes reachable)") {
    // mixed directional content across non-MB-aligned sizes — pushes
    // every border rule (above-right availability, frame edges)
    val rng = new scala.util.Random(7)
    for ((w, h) <- Seq((48, 48), (40, 24), (17, 33))) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val base = ((x + y) / 3) % 2 * 150 + ((x - y + 999) / 5) % 2 * 60
        val v = math.max(0, math.min(255, base + rng.nextInt(7)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      for (q <- Seq(95, 50, 20)) {
        val enc = Vp8Codec.encodeLossy(img, q)
        val back = Vp8Codec.decodeLossy(enc)
        assert(back.getWidth == w && back.getHeight == h)
        val p = psnr(img, back)
        assert(p > (if (q >= 95) 30 else 14), f"$w x $h q$q: $p%.1f dB")
      }
    }
  }

  test("loop filter: engages on blocking-prone content and never hurts (measured level choice)") {
    // smooth diagonal gradient at low quality — the classic blocking
    // case the deblocker exists for
    val img = new BufferedImage(96, 96, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 96; x <- 0 until 96) {
      val v = ((x + y) * 255) / 190
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def run(filter: Boolean, q: Int): (Double, Int) = {
      Vp8Codec.loopFilterEnabled = filter
      try {
        val enc = Vp8Codec.encodeLossy(img, q)
        (psnr(img, Vp8Codec.decodeLossy(enc)), Vp8Codec.lastFilterLevel.get().intValue)
      } finally Vp8Codec.loopFilterEnabled = true
    }
    val (pOff, lOff) = run(filter = false, q = 20)
    val (pOn, lOn) = run(filter = true, q = 20)
    info(f"q20 gradient: unfiltered $pOff%.2f dB   filtered(level=$lOn) $pOn%.2f dB")
    assert(lOff == 0 && lOn > 0, s"encoder should choose a nonzero level here (got $lOn)")
    assert(pOn > pOff, f"deblocking should help on gradients: $pOff%.2f -> $pOn%.2f dB")
    // and the level choice is MEASURED, not forced: on content where
    // smoothing hurts (1px checkerboard), the encoder keeps level 0
    val cb = new BufferedImage(32, 32, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 32; x <- 0 until 32)
      cb.setRGB(x, y, if ((x + y) % 2 == 0) 0xFFFFFF else 0x000000)
    Vp8Codec.encodeLossy(cb, 20)
    assert(Vp8Codec.lastFilterLevel.get().intValue == 0,
      "checkerboard must keep the filter off (smoothing only hurts)")
  }

  test("byte-level golden: encoder output pinned (bitstream drift is loud)") {
    // 8x8 two-tone checkerboard at q75 — captured at the round-4
    // state and UNCHANGED by the round-5 B_PRED event (the RD mode
    // decision correctly keeps 16x16 for a 1px checkerboard, which no
    // 4x4 submode predicts better). Any drift in the bool coder's
    // carry handling, token tree paths, probability tables, quantizer
    // mapping, or header layout changes these bytes and must be a
    // DELIBERATE, documented event (existing payloads in the wild keep
    // decoding — the decoder is syntax-driven — but golden drift means
    // the encoder's bitstream changed).
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xFFC800 else 0x2040A0)
    val enc = Vp8Codec.encodeLossy(img, 75)
    val want = "UklGRooAAABXRUJQVlA4IH4AAAAQAQCdASoIAAgAAABAAAa0EAD+3A/99/1h//zHfJUZH96o/" +
      "vQn8FNwyP71R/ehP4Lu/aAf+ETH9oB/4QyCln96o/vQn8DWBkf3qj+9CfwS/9oB/4Qe/tAP/CN/65P/wjfy" +
      "E//B2T+uT/8I38hP/whJ/9CvWX31foj+dj4lyAA="
    assert(java.util.Base64.getEncoder.encodeToString(enc) == want,
      "VP8 encoder bitstream drifted from the pinned golden")
  }

  test("deterministic: same input and quality produce identical bytes") {
    val img = photoish(96, 64)
    val a = Vp8Codec.encodeLossy(img, 80)
    val b = Vp8Codec.encodeLossy(img, 80)
    assert(java.util.Arrays.equals(a, b))
  }

  // --- container + wiring -------------------------------------------

  test("lossy and lossless webp sniff as distinct flavors") {
    val img = gradient(32, 32)
    val lossy = Vp8Codec.encodeLossy(img, 95)
    val lossless = WebpCodec.encodeLossless(img)
    assert(Vp8Codec.isLossyWebp(lossy))
    assert(!Vp8Codec.isLossyWebp(lossless))
    assert(!WebpCodec.isLosslessWebp(lossy))
    assert(Resizer.sniffFormat(lossy).contains("webp"))
    assert(Resizer.sniffFormat(lossless).contains("webp-lossless"))
  }

  test("Resizer encodes webp lossily, honoring the quality knob") {
    val img = photoish(64, 64)
    val hi = Resizer.encode(img, "webp", 95)
    val lo = Resizer.encode(img, "webp", 30)
    assert(Vp8Codec.isLossyWebp(hi) && Vp8Codec.isLossyWebp(lo))
    assert(hi.length >= lo.length)
    val ll = Resizer.encode(img, "webp-lossless", 95)
    assert(WebpCodec.isLosslessWebp(ll))
  }

  test("Resizer decode fallback ingests lossy webp payloads") {
    val img = photoish(64, 48)
    val bytes = Vp8Codec.encodeLossy(img, 90)
    val cfg = graft.config.DownloadConfig(encodeFormat = "png", resizeMode = "no")
    val r = Resizer.resizeBytes(bytes, cfg)
    assert(r.error.isEmpty, r.error)
    assert(r.width.contains(64) && r.height.contains(48))
  }

  test("decoder rejects non-VP8 and truncated payloads loudly") {
    intercept[IllegalArgumentException] {
      Vp8Codec.decodeLossy("plainly not webp".getBytes)
    }
    val ok = Vp8Codec.encodeLossy(gradient(32, 32), 90)
    intercept[IllegalArgumentException] {
      Vp8Codec.decodeLossy(java.util.Arrays.copyOf(ok, 18))
    }
  }

  test("config: webp accepts quality, webp-lossless rejects non-default quality") {
    graft.config.DownloadConfig(encodeFormat = "webp", encodeQuality = 42).validate()
    graft.config.DownloadConfig(encodeFormat = "webp-lossless").validate()
    intercept[IllegalArgumentException] {
      graft.config.DownloadConfig(encodeFormat = "webp-lossless", encodeQuality = 42).validate()
    }
  }
}
