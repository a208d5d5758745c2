package graft

/** Minimal JSON string escape shared by the artifact-emitting mains —
  * ONE table on purpose: Bench and Verify each carried their own copy
  * of the same escape (quote, backslash, \n \r \t, \\u%04x controls),
  * and a future fix to one (DEL, non-BMP) would silently miss the
  * other. The driver consumes these artifacts with json.load, so a
  * single unescaped char in builder-authored SQL or an env-supplied
  * path zeroes a whole round's measurement. */
object JsonOut {
  def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => "\\u%04x".format(c.toInt)
    case c => c.toString
  }

  /** esc wrapped in double quotes — a complete JSON string literal. */
  def quote(s: String): String = "\"" + esc(s) + "\""
}
