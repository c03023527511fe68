package graft.util

/** Shared JSON string escaping for hand-built JSON (stats sidecars,
  * EXIF dumps) — one implementation so escaping can never diverge
  * between emitters.
  */
object JsonEscape {
  def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}
