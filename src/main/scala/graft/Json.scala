package graft

/** Minimal JSON string escaping for the engine's hand-rolled JSON lines
  * (ledger/manifest/bench output). One implementation — the previous three
  * ad-hoc escapers diverged (the weakest missed backslashes, producing
  * invalid JSON for paths containing them).
  */
private[graft] object Json {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Inverse of [[escape]] (readers that recover a value from a JSON
    * field, e.g. Backfill's completed-partition listing).
    */
  def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) s.charAt(i + 1) match {
        case 'u' if i + 5 < s.length =>
          sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
          i += 6
        case other =>
          sb += other
          i += 2
      }
      else { sb += c; i += 1 }
    }
    sb.toString
  }
}
