package graft

/** The one JSON string escaper for builder-authored artifacts (Bench,
  * Verify) — backslash, quote, and every control char below 0x20.
  * Two hand-rolled copies diverged once; one copy, two callers. */
private[graft] object Jsons {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
