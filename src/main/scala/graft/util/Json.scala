package graft.util

/** The one JSON string-escape implementation. Verify's oracle dump,
  * Bench's error fields, and the REPL's JSON renderer all embed builder-
  * or engine-authored strings in hand-rolled JSON; a tab or quote that
  * escapes differently in one of them corrupts that artifact only, which
  * is exactly the kind of drift a shared helper prevents.
  */
object Json {
  /** Escape for embedding inside a JSON string literal: backslash,
    * quote, and ALL control characters (<0x20).
    */
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** A complete JSON string literal (quotes included). */
  def str(s: String): String = "\"" + escape(s) + "\""
}
