package graft

/** Byte-level golden of [[graft.operators.WebpCodec.encodeLossless]]
  * for the fixed 4x2 two-tone image in ResizerSpec — captured from
  * the encoder at the round-4 state (subtract-green + predictor
  * transforms, color cache, LZ77) and pinned so any drift in bit
  * order, canonical-code assignment, or header layout is loud.
  */
object GoldenWebp {
  val b64: String = "UklGRiwAAABXRUJQVlA4TCAAAAAvA0AAAI2UIKL/AY9gEwAAAADA0UIZWtgDPiARGweICA=="
}
