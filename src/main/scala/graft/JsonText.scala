package graft

/** THE JSON string-escape for every driver artifact writer (Bench, Verify)
  * — one implementation so a future escaping fix cannot land in one writer
  * and leave the other emitting invalid JSON (the driver `json.load`
  * failure mode that silently zeroes a round's artifacts). Escapes
  * backslash, quote, and ALL control chars (< 0x20). */
object JsonText {
  def esc(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
