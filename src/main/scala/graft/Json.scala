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
}
