package graft

/** Byte-level golden of [[graft.operators.WebpCodec.encodeLossless]]
  * for the fixed 4x2 two-tone image in ResizerSpec — captured from
  * the encoder at the round-3 state and pinned so any drift in bit
  * order, canonical-code assignment, or header layout is loud.
  */
object GoldenWebp {
  val b64: String = "UklGRh4AAABXRUJQVlA4TBIAAAAvA0AAADgQ6EEADwbc/8Dx4wA="
}
