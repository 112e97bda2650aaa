package graft

import graft.gql.Lexer
import graft.gql.Lexer._

/** Token-level splitting of `stmt NEXT [YIELD …] stmt` chains
  * (ast.rs Statement::Next; executor.rs:8559-8641): NEXT at bracket
  * depth 0 separates statements; a YIELD prefix on a chunk names the
  * previous result's columns to capture as session parameters.
  */
object NextChain {

  /** Statements whose tail is an opaque raw-text body (mirrors
    * Parser.CreateProcRe / Parser.AtRe): a NEXT inside the body belongs
    * to the body, so splitting must stop at the chunk that starts one.
    */
  private[graft] val RawBodyRe =
    """(?is)\s*(?:CREATE\s+PROCEDURE\s+\w+\s+AS|AT\s+/\w+/\w+)\s.*""".r

  private def startsRawBody(chunk: String): Boolean = {
    val (_, rest) = yieldPrefix(chunk)
    RawBodyRe.pattern.matcher(rest).matches() ||
      RawBodyRe.pattern.matcher(chunk).matches()
  }

  /** Split a statement text on top-level NEXT tokens. Bracketed content
    * (edge patterns like `-[:NEXT]->`, lists, maps) and property access
    * (`a.next`) never split. A chunk that begins a raw-body statement
    * (CREATE PROCEDURE / AT, optionally behind a YIELD prefix) swallows
    * every later NEXT — the chain inside the body is the body's.
    */
  def split(text: String): Seq[String] =
    Lexer.tokenize(text) match {
      case Left(_) => Seq(text) // let the normal parse path report it
      case Right(toks) =>
        var depth = 0
        val cutsB = Vector.newBuilder[(Int, Int)] // (start, endExclusive) of NEXT token
        toks.zipWithIndex.foreach {
          case (TPunct(s, _), _) if s == "(" || s == "[" || s == "{" => depth += 1
          case (TPunct(s, _), _) if s == ")" || s == "]" || s == "}" => depth -= 1
          case (TIdent(s, pos), i) if depth == 0 && s.equalsIgnoreCase("NEXT") =>
            val prevIsDot = i > 0 && (toks(i - 1) match {
              case TPunct(".", _) | TPunct("$", _) | TPunct(":", _) => true
              case _ => false
            })
            if (!prevIsDot) cutsB += ((pos, pos + s.length))
          case _ => ()
        }
        val cuts0 = cutsB.result()
        // stop at the first cut whose following text starts a raw body —
        // later NEXTs belong to that statement's stored text
        val cuts = cuts0.indices
          .find(i => startsRawBody(text.substring(cuts0(i)._2))) match {
          case Some(i) => cuts0.take(i + 1)
          case None => cuts0
        }
        if (cuts.isEmpty) Seq(text)
        else {
          val bounds = (0, 0) +: cuts :+ ((text.length, text.length))
          bounds.sliding(2).map { case Seq((_, from), (to, _)) =>
            text.substring(from, to)
          }.toSeq
        }
    }

  /** Parse an optional `YIELD a [AS x], b …` prefix off a chunk; returns
    * the (column, paramName) pairs and the remaining statement text.
    */
  def yieldPrefix(chunk: String): (Seq[(String, String)], String) =
    Lexer.tokenize(chunk) match {
      case Left(_) => (Seq.empty, chunk)
      case Right(toks) =>
        toks.headOption match {
          case Some(TIdent(y, _)) if y.equalsIgnoreCase("YIELD") =>
            val items = Vector.newBuilder[(String, String)]
            var i = 1
            var more = true
            var endPos = chunk.length
            while (more) {
              toks.lift(i) match {
                case Some(TIdent(name, _)) =>
                  i += 1
                  val out = toks.lift(i) match {
                    case Some(TKw("AS", _)) =>
                      i += 1
                      toks.lift(i) match {
                        case Some(TIdent(a, _)) => i += 1; a
                        case Some(TKw(a, _)) => i += 1; a
                        case _ => name
                      }
                    case _ => name
                  }
                  items += ((name, out))
                  toks.lift(i) match {
                    case Some(TPunct(",", _)) => i += 1
                    case Some(t) => endPos = t.pos; more = false
                    case None => endPos = chunk.length; more = false
                  }
                case Some(t) => endPos = t.pos; more = false
                case None => endPos = chunk.length; more = false
              }
            }
            (items.result(), chunk.substring(math.min(endPos, chunk.length)))
          case _ => (Seq.empty, chunk)
        }
    }
}
