package graft.gql

/** Hand-written lexer for the GQL subset (mirrors the reference's
  * hand-written ast/lexer.rs approach; token classes per
  * grammar/ISO_GQL_Grammar_BNF.txt).
  */
object Lexer {

  sealed trait Token { def pos: Int }
  case class TIdent(s: String, pos: Int) extends Token   // identifier (raw case)
  case class TKw(s: String, pos: Int) extends Token      // upper-cased keyword form
  case class TNum(s: String, pos: Int) extends Token
  case class TStr(s: String, pos: Int) extends Token
  case class TPunct(s: String, pos: Int) extends Token
  case class TEnd(pos: Int) extends Token

  val keywords: Set[String] = Set(
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "AS", "DISTINCT",
    "GROUP", "BY", "HAVING", "ORDER", "ASC", "ASCENDING", "DESC",
    "DESCENDING", "LIMIT", "SKIP", "OFFSET", "UNWIND",
    "AND", "OR", "XOR", "NOT", "IN", "IS", "NULL", "TRUE", "FALSE",
    "STARTS", "ENDS", "CONTAINS", "LIKE", "CASE", "WHEN", "THEN", "ELSE", "EXISTS",
    "END", "CAST", "COUNT", "INSERT", "SET", "DELETE", "DETACH", "REMOVE",
    "CREATE", "DROP", "SCHEMA", "GRAPH", "SESSION",
    "LET", "FOR", "FILTER", "UNION", "INTERSECT", "EXCEPT", "ALL", "CALL")
  // Soft keywords (recognized positionally as TIdent, so they stay usable
  // as identifiers): UNKNOWN, NORMALIZED, DIRECTED, SOURCE, DESTINATION,
  // OF, START, TRANSACTION, COMMIT, ROLLBACK, USER, ROLE, GRANT, TO,
  // PROCEDURE, RESET, CLOSE.

  private val punct2 = Seq("<>", "<=", ">=", "->", "<-", "||", "..")
  private val punct1 = "()[]{},.:;*/%+-<>=|$?"

  def tokenize(q: String): Either[String, Vector[Token]] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && q(i + 1) == '/') {
        while (i < n && q(i) != '\n') i += 1
      }
      else if (c.isDigit) {
        val start = i
        while (i < n && q(i).isDigit) i += 1
        // fraction: '.' followed by a digit (so `1..3` stays 1 .. 3)
        if (i + 1 < n && q(i) == '.' && q(i + 1).isDigit) {
          i += 1
          while (i < n && q(i).isDigit) i += 1
        }
        out += TNum(q.substring(start, i), start)
      }
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        val start = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (q(i) == quote && i + 1 < n && q(i + 1) == quote) { sb += quote; i += 2 }
          else if (q(i) == quote) { closed = true; i += 1 }
          else if (q(i) == '\\' && i + 1 < n) {
            val e = q(i + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            }
            sb += e; i += 2
          }
          else { sb += q(i); i += 1 }
        }
        if (!closed) return Left(s"unterminated string at $start")
        out += TStr(sb.toString, start)
      }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        val s = q.substring(start, i)
        val up = s.toUpperCase
        if (keywords.contains(up)) out += TKw(up, start)
        else out += TIdent(s, start)
      }
      else if (c == '`') {
        // delimited identifier (ISO_GQL_Grammar_BNF.txt: <delimited-id>;
        // `` escapes a literal backtick inside)
        val start = i
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          if (q(i) == '`' && i + 1 < n && q(i + 1) == '`') { sb += '`'; i += 2 }
          else if (q(i) == '`') { closed = true; i += 1 }
          else { sb += q(i); i += 1 }
        }
        if (!closed) return Left(s"unterminated quoted identifier at $start")
        out += TIdent(sb.toString, start)
      }
      else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (punct2.contains(two)) { out += TPunct(two, i); i += 2 }
        else if (punct1.indexOf(c) >= 0) { out += TPunct(c.toString, i); i += 1 }
        else return Left(s"unexpected character '$c' at $i")
      }
    }
    out += TEnd(n)
    Right(out.result())
  }
}
