package graft.operators

/** Constant tables for the from-scratch VP8 (lossy webp) codec.
  *
  * Everything here is transcribed from the PUBLIC VP8 bitstream
  * specification (RFC 6386 — "VP8 Data Format and Decoding Guide",
  * sections 13 and 14). The reference pipeline (img2dataset) gets
  * lossy webp for free from Pillow/libwebp (`resizer.py:224-227`);
  * this sandbox has no webp codec at all, so — like the VP8L
  * lossless path in [[WebpCodec]] — the encoder AND the verifying
  * decoder are written from the spec.
  *
  * Fidelity note (mirrors DEVIATIONS.md): the encoder/decoder pair
  * round-trips bit-exactly against ITSELF (golden + property tests);
  * the large probability tables are transcribed from the RFC
  * best-effort, and no external webp decoder exists in this offline
  * environment to countersign byte-level interop. Structure, syntax
  * element order, transforms and quantizer tables follow the RFC
  * exactly.
  */
private[operators] object Vp8Tables {

  /** DC quantizer lookup, RFC 6386 §14.1 (index 0..127). */
  val DcQLookup: Array[Int] = Array(
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157)

  /** AC quantizer lookup, RFC 6386 §14.1 (index 0..127). */
  val AcQLookup: Array[Int] = Array(
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284)

  /** Zigzag scan order for 4x4 coefficient blocks (RFC 6386 §13.3). */
  val Zigzag: Array[Int] = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** Coefficient band per scan position (RFC 6386 §13.3). */
  val CoefBands: Array[Int] = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  // Token alphabet (RFC 6386 §13.2).
  final val ZeroToken = 0
  final val OneToken = 1
  final val TwoToken = 2
  final val ThreeToken = 3
  final val FourToken = 4
  final val Cat1 = 5
  final val Cat2 = 6
  final val Cat3 = 7
  final val Cat4 = 8
  final val Cat5 = 9
  final val Cat6 = 10
  final val EobToken = 11

  /** Coefficient token tree (RFC 6386 §13.2). Nonpositive entries are
    * leaves (leaf token = negated value); positive entries are the
    * index of the node's left child (right child is index+1).
    */
  val CoefTree: Array[Int] = Array(
    -EobToken, 2,
    -ZeroToken, 4,
    -OneToken, 6,
    8, 12,
    -TwoToken, 10,
    -ThreeToken, -FourToken,
    14, 16,
    -Cat1, -Cat2,
    18, 20,
    -Cat3, -Cat4,
    -Cat5, -Cat6)

  /** Base value and extra-bit count per value category. */
  val CatBase: Array[Int] = Array(5, 7, 11, 19, 35, 67)
  val CatBits: Array[Int] = Array(1, 2, 3, 4, 5, 11)

  /** Extra-bit probabilities per category (RFC 6386 §13.2). */
  val CatProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))

  // Intra modes (RFC 6386 §11.2).
  final val DcPred = 0
  final val VPred = 1
  final val HPred = 2
  final val TmPred = 3
  final val BPred = 4

  // 4x4 luma submodes (RFC 6386 §11.2 / §12.3).
  final val BDcPred = 0
  final val BTmPred = 1
  final val BVePred = 2
  final val BHePred = 3
  final val BLdPred = 4
  final val BRdPred = 5
  final val BVrPred = 6
  final val BVlPred = 7
  final val BHdPred = 8
  final val BHuPred = 9

  /** Key-frame luma mode tree + probabilities (RFC 6386 §11.2). */
  val KfYModeTree: Array[Int] = Array(-BPred, 2, 4, 6, -DcPred, -VPred, -HPred, -TmPred)
  val KfYModeProb: Array[Int] = Array(145, 156, 163, 128)

  /** 4x4 submode tree (RFC 6386 §11.2 intra_bmode). */
  val BModeTree: Array[Int] = Array(
    -BDcPred, 2,
    -BTmPred, 4,
    -BVePred, 6,
    8, 12,
    -BHePred, 10,
    -BRdPred, -BVrPred,
    -BLdPred, 14,
    -BVlPred, 16,
    -BHdPred, -BHuPred)

  /** Submode node probabilities. FIDELITY NOTE (same class as
    * [[CoefUpdateProb]]): key frames contextually select from the
    * spec's `kf_bmode_prob[above][left][9]` (a 10x10x9 table this
    * zero-egress build cannot transcribe verbatim); this is the
    * spec's CONTEXT-FREE inter-frame `bmode_prob` — valid tree
    * coding, exact in-repo round-trip (encoder and decoder share it),
    * external-decoder interop subject to the documented caveat.
    */
  val BModeProb: Array[Int] = Array(120, 90, 79, 133, 87, 85, 80, 111, 151)

  /** Chroma mode tree + key-frame probabilities (RFC 6386 §11.2). */
  val UvModeTree: Array[Int] = Array(-DcPred, 2, -VPred, 4, -HPred, -TmPred)
  val KfUvModeProb: Array[Int] = Array(142, 114, 183)

  // Coefficient plane types (RFC 6386 §13.3).
  final val PlaneYNoDc = 0
  final val PlaneY2 = 1
  final val PlaneUv = 2
  final val PlaneYWithDc = 3

  /** Default coefficient token probabilities
    * [plane type 4][coef band 8][context 3][entropy node 11]
    * (RFC 6386 §13.5, best-effort transcription — see the fidelity
    * note in the object Scaladoc; the pair-internal round-trip is
    * exact regardless, because encoder and decoder share this one
    * constant).
    */
  val DefaultCoefProbs: Array[Array[Array[Array[Int]]]] = {
    def row(vs: Int*): Array[Int] = vs.toArray
    Array(
      // plane 0: Y after Y2 (no DC)
      Array(
        Array( // band 0 (unused: first coefficient is 1)
          row(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
          row(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
          row(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128)),
        Array( // band 1
          row(253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128),
          row(189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128),
          row(106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128)),
        Array( // band 2
          row(1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128),
          row(181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128),
          row(78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128)),
        Array( // band 3
          row(1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128),
          row(184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128),
          row(77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128)),
        Array( // band 4
          row(1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128),
          row(170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128),
          row(37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128)),
        Array( // band 5
          row(1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128),
          row(207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128),
          row(102, 103, 225, 255, 210, 240, 128, 128, 128, 128, 128)),
        Array( // band 6
          row(1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128),
          row(177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128),
          row(80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128)),
        Array( // band 7
          row(1, 1, 243, 255, 254, 255, 128, 128, 128, 128, 128),
          row(238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
          row(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128))),
      // plane 1: Y2
      Array(
        Array( // band 0
          row(198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62),
          row(131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1),
          row(68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128)),
        Array( // band 1
          row(1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128),
          row(184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128),
          row(81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128)),
        Array( // band 2
          row(1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128),
          row(99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128),
          row(23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128)),
        Array( // band 3
          row(1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128),
          row(109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128),
          row(44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128)),
        Array( // band 4
          row(1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128),
          row(94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128),
          row(22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128)),
        Array( // band 5
          row(1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128),
          row(124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128),
          row(35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128)),
        Array( // band 6
          row(1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128),
          row(121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128),
          row(45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128)),
        Array( // band 7
          row(1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128),
          row(203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128),
          row(137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128))),
      // plane 2: chroma
      Array(
        Array( // band 0
          row(253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128),
          row(175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128),
          row(73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128)),
        Array( // band 1
          row(1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128),
          row(239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128),
          row(155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128)),
        Array( // band 2
          row(1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128),
          row(201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128),
          row(69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128)),
        Array( // band 3
          row(1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128),
          row(223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128),
          row(141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128)),
        Array( // band 4
          row(1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128),
          row(190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128),
          row(149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
        Array( // band 5
          row(1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128),
          row(247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128),
          row(240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
        Array( // band 6
          row(1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128),
          row(213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128),
          row(55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
        Array( // band 7
          row(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
          row(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
          row(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128))),
      // plane 3: Y with DC (B_PRED — kept for decoder completeness)
      Array(
        Array( // band 0
          row(202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255),
          row(126, 38, 166, 203, 150, 165, 226, 161, 255, 244, 128),
          row(61, 46, 138, 188, 135, 122, 236, 139, 255, 254, 128)),
        Array( // band 1
          row(1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128),
          row(166, 109, 228, 252, 211, 215, 255, 223, 128, 128, 128),
          row(39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128)),
        Array( // band 2
          row(1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128),
          row(124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128),
          row(24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128)),
        Array( // band 3
          row(1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128),
          row(149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128),
          row(28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128)),
        Array( // band 4
          row(1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128),
          row(123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128),
          row(20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128)),
        Array( // band 5
          row(1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128),
          row(168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128),
          row(47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128)),
        Array( // band 6
          row(1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128),
          row(141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128),
          row(42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128)),
        Array( // band 7
          row(1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
          row(244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
          row(238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128))))
  }

  /** Meta-probabilities for the per-frame coefficient probability
    * update flags (RFC 6386 §13.4). This encoder sends NO updates;
    * the table only prices the 1,056 "no update" bools. Transcription
    * approximated as the table's dominant value (255) — documented in
    * the object Scaladoc; pair-internal round-trip is unaffected.
    */
  val CoefUpdateProb = 255

  /** Leading-zero normalization shift per range value (§7). */
  val Norm: Array[Int] = {
    val n = new Array[Int](256)
    var r = 1
    while (r < 256) {
      var v = r; var s = 0
      while (v < 128) { v <<= 1; s += 1 }
      n(r) = s; r += 1
    }
    n
  }
}
