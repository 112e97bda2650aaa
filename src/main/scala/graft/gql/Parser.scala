package graft.gql

import Ast._
import Lexer._

/** Recursive-descent parser for the GQL subset (structure mirrors the
  * reference's hand-written ast/parser.rs; grammar per
  * grammar/ISO_GQL_Grammar_BNF.txt).
  *
  * Supported: MATCH / OPTIONAL MATCH pattern lists with labels, inline
  * property maps, directions and bounded quantifiers; WHERE; UNWIND;
  * WITH-chained segments; RETURN [DISTINCT]; GROUP BY; HAVING; ORDER BY;
  * SKIP/OFFSET; LIMIT; full expression grammar with precedence
  * (OR < XOR < AND < NOT < comparison/IS/IN/LIKE < additive <
  * multiplicative < unary < postfix).
  */
final class Parser(tokens: Vector[Token]) {
  private var p = 0
  /** Set while parsing MATCH-prefixed DML: lets a segment end at a
    * mutation keyword (SET/REMOVE/DELETE/INSERT) instead of RETURN/WITH.
    */
  private var allowMutationEnd = false
  private var mutationEnd = false

  private def cur: Token = tokens(p)
  private def advance(): Token = { val t = tokens(p); p += 1; t }
  private def err(msg: String): Nothing =
    throw new GqlParseException(s"$msg at position ${cur.pos} (token $cur)")

  private def isKw(s: String): Boolean = cur match {
    case TKw(k, _) => k == s
    case _ => false
  }
  private def eatKw(s: String): Unit =
    if (isKw(s)) p += 1 else err(s"expected $s")
  private def tryKw(s: String): Boolean =
    if (isKw(s)) { p += 1; true } else false
  private def isPunct(s: String): Boolean = cur match {
    case TPunct(k, _) => k == s
    case _ => false
  }
  private def eatPunct(s: String): Unit =
    if (isPunct(s)) p += 1 else err(s"expected '$s'")
  private def tryPunct(s: String): Boolean =
    if (isPunct(s)) { p += 1; true } else false
  private def ident(): String = cur match {
    case TIdent(s, _) => p += 1; s
    case TKw(s, _) => p += 1; s // allow keywords as identifiers in safe spots
    case _ => err("expected identifier")
  }
  /** Soft keyword: a TIdent matched case-insensitively (stays usable as a
    * normal identifier elsewhere).
    */
  private def isSoftKw(s: String): Boolean = cur match {
    case TIdent(k, _) => k.equalsIgnoreCase(s)
    case _ => false
  }
  private def trySoftKw(s: String): Boolean =
    if (isSoftKw(s)) { p += 1; true } else false
  /** Is the token AFTER the current one the given soft keyword? */
  private def nextIsSoftKw(s: String): Boolean = tokens.lift(p + 1).exists {
    case TIdent(k, _) => k.equalsIgnoreCase(s)
    case _ => false
  }
  private def eatSoftKw(s: String): Unit =
    if (!trySoftKw(s)) err(s"expected $s")
  private def isPunctAt(i: Int, s: String): Boolean = tokens.lift(i).exists {
    case TPunct(k, _) => k == s
    case _ => false
  }
  /** Type name with optional parameter suffix — `DECIMAL(12,2)`,
    * `STRING(64)`, `FLOAT(24)`, `VECTOR[128]` — canonicalized to an
    * upper-case string the compiler's sparkType / GraphType validator
    * parse back (reference TypeSpec, ast.rs:814-878; DECIMAL precision/
    * scale at ast.rs:826-830). The suffix is optional everywhere.
    */
  private def parseTypeName(): String = {
    val base = ident().toUpperCase
    if (tryPunct("(")) {
      def num(): Long = cur match {
        case TNum(s, _) => p += 1; s.toLong
        case _ => err(s"expected numeric type parameter for $base")
      }
      val p1 = num()
      val p2 = if (tryPunct(",")) Some(num()) else None
      eatPunct(")")
      p2 match {
        case Some(s) => s"$base($p1,$s)"
        case None => s"$base($p1)"
      }
    } else if (tryPunct("[")) {
      val d = cur match {
        case TNum(s, _) => p += 1; s.toLong
        case _ => err(s"expected dimension for $base")
      }
      eatPunct("]")
      s"$base[$d]"
    } else base
  }

  /** True when the token at `i` can lead a query expression — the same
    * keyword set parseQueryExpr accepts. Used for the `(subquery)` vs
    * `(expr)` lookahead in primaries and DECLARE initializers.
    */
  private def queryLeadsAt(i: Int): Boolean = tokens.lift(i).exists {
    case TKw("MATCH" | "OPTIONAL" | "UNWIND" | "FOR" | "LET", _) => true
    case _ => false
  }

  // ---- statement entry (ast.rs:24-39 dispatch) ----
  def parseStatement(): Statement = {
    cur match {
      case TKw("INSERT", _) =>
        p += 1
        // full path patterns: nodes and inline edges
        // (INSERT (:A)-[:R]->(:B), duplicate_edge_warning_test.rs)
        val paths = parsePatternList()
        expectEnd(); InsertStmt(paths)
      case TKw("CREATE", _) | TKw("DROP", _) =>
        val op = advance().asInstanceOf[TKw].s
        if (isSoftKw("USER") || isSoftKw("ROLE")) {
          val kind = ident().toUpperCase
          // IF NOT EXISTS (CREATE) / IF EXISTS (DROP) — without it a
          // duplicate create / missing drop ERRORS, with it they no-op
          // (security_role_user_tests.rs:29,40-41). IF lexes soft here.
          val ifClause =
            if (op == "CREATE") parseIfNotExists()
            else if (trySoftKw("IF")) { eatKw("EXISTS"); true }
            else false
          // principal names may be quoted strings ('role-with-dashes')
          // or plain identifiers
          val name = cur match {
            case TStr(s, _) => p += 1; s
            case _ => ident()
          }
          if (name.isEmpty) err("empty principal name")
          // CREATE USER name IDENTIFIED BY 'password' | PASSWORD 'password'
          // (catalog/providers/security.rs credential path; the tests use
          // the PASSWORD form, security_role_user_tests.rs:117)
          val secret =
            if (op == "CREATE" && kind == "USER" && isSoftKw("IDENTIFIED")) {
              p += 1
              // BY lexes as a hard keyword (GROUP BY / ORDER BY)
              cur match {
                case TKw("BY", _) => p += 1
                case _ => err("expected BY after IDENTIFIED")
              }
              cur match {
                case TStr(s, _) => p += 1; Some(s)
                case _ => err("expected a string password after IDENTIFIED BY")
              }
            } else if (op == "CREATE" && kind == "USER" && isSoftKw("PASSWORD")) {
              p += 1
              cur match {
                case TStr(s, _) => p += 1; Some(s)
                case _ => err("expected a string password after PASSWORD")
              }
            } else None
          expectEnd(); SecurityStmt(op, kind, name, secret, ifClause)
        } else if (isSoftKw("PROCEDURE")) {
          p += 1
          var name = ident()
          while (tryPunct(".")) name = name + "." + ident()
          if (op == "DROP") { expectEnd(); ProcedureStmt("DROP", name, None) }
          else err("CREATE PROCEDURE is handled textually") // see Parser.parseStatement
        } else if (isSoftKw("INDEX")) {
          p += 1
          parseIndexTail(op)
        } else {
          val kind =
            if (tryKw("SCHEMA")) "SCHEMA"
            else { eatKw("GRAPH"); "GRAPH" }
          // CREATE GRAPH INDEX … (ast.rs:4845-4860) vs CREATE GRAPH TYPE …
          // (schema/parser/graph_type.rs) vs CREATE GRAPH /path
          if (kind == "GRAPH" && isSoftKw("INDEX")) {
            p += 1
            parseIndexTail(op)
          } else if (kind == "GRAPH" && isSoftKw("TYPE")) {
            p += 1
            parseGraphTypeTail(op)
          } else {
            // absolute /schema[/graph], or a relative name resolved
            // against the session's current schema (SESSION SET SCHEMA —
            // reference relative-path tests ddl_independent_tests.rs:
            // 150-176). Relative GRAPH names carry schema = "" here and
            // resolve at dispatch. CREATE … IF NOT EXISTS
            // (ddl_independent_tests.rs:129-148) no-ops on an existing
            // target; DROP SCHEMA … CASCADE (:38,:95-113) drops the
            // schema with all contained graphs.
            val ifNotExists = op == "CREATE" && parseIfNotExists()
            val absolute = tryPunct("/")
            val first = ident()
            val second = if (tryPunct("/")) Some(ident()) else None
            val (schema, graph) = (kind, absolute, second) match {
              case ("SCHEMA", _, None) => (first, None)
              case ("GRAPH", _, Some(g)) => (first, Some(g))
              case ("GRAPH", false, None) => ("", Some(first))
              case _ => err("GRAPH path needs /schema/graph or a relative name")
            }
            val typed =
              if (kind == "GRAPH" && trySoftKw("TYPED")) Some(ident()) else None
            val cascade =
              op == "DROP" && kind == "SCHEMA" && trySoftKw("CASCADE")
            expectEnd()
            CatalogStmt(op, kind, schema, graph, typed, ifNotExists, cascade)
          }
        }
      case TIdent(s, _) if s.equalsIgnoreCase("ALTER") =>
        // ALTER INDEX name REBUILD | OPTIMIZE | SET OPTION key = value
        // (parser.rs:4942-4978, ast.rs:1739-1767), or ALTER GRAPH TYPE
        // name (ADD|DROP) … (schema/parser/graph_type.rs:87)
        p += 1
        if (isSoftKw("INDEX")) {
          p += 1
          val name = ident()
          if (trySoftKw("REBUILD")) {
            expectEnd(); AlterIndexStmt(name, "REBUILD", None)
          } else if (trySoftKw("OPTIMIZE")) {
            expectEnd(); AlterIndexStmt(name, "OPTIMIZE", None)
          } else {
            eatKw("SET"); eatSoftKw("OPTION")
            val key = ident()
            eatPunct("=")
            val value = optionValue()
            expectEnd(); AlterIndexStmt(name, "SET_OPTION", Some((key, value)))
          }
        } else {
        eatKw("GRAPH"); eatSoftKw("TYPE")
        val name = ident()
        val changes = Vector.newBuilder[GraphTypeChange]
        var more = true
        while (more) {
          if (isKw("CREATE") || isSoftKw("ADD")) {
            p += 1
            if (trySoftKw("NODE")) {
              eatSoftKw("TYPE")
              val label = ident()
              eatPunct("(")
              val props = if (isPunct(")")) Seq.empty else parseTypeProps()
              eatPunct(")")
              changes += AddNodeType(
                graft.graph.GraphType.NodeTypeDef(label, props))
            } else if (trySoftKw("EDGE")) {
              eatSoftKw("TYPE")
              val t = ident()
              eatPunct("(")
              eatSoftKw("FROM"); val from = ident()
              eatSoftKw("TO"); val to = ident()
              val props = if (tryPunct(",")) parseTypeProps() else Seq.empty
              eatPunct(")")
              changes += AddEdgeType(
                graft.graph.GraphType.EdgeTypeDef(t, from, to, props))
            } else {
              eatSoftKw("PROPERTY")
              val tn = ident(); eatPunct("."); val pn = ident()
              val pt = ident().toUpperCase
              var required = false
              if (isKw("NOT")) { p += 1; eatKw("NULL"); required = true }
              changes += AddProperty(tn,
                graft.graph.GraphType.PropDef(pn, pt, required))
            }
          } else if (tryKw("DROP")) {
            if (trySoftKw("NODE")) { eatSoftKw("TYPE"); changes += DropNodeType(ident()) }
            else if (trySoftKw("EDGE")) { eatSoftKw("TYPE"); changes += DropEdgeType(ident()) }
            else {
              eatSoftKw("PROPERTY")
              val tn = ident(); eatPunct("."); val pn = ident()
              changes += DropProperty(tn, pn)
            }
          } else err("expected ADD or DROP in ALTER GRAPH TYPE")
          more = tryPunct(",") ||
            isSoftKw("ADD") || isKw("DROP") || isKw("CREATE")
        }
        expectEnd(); AlterGraphTypeStmt(name, changes.result())
        }
      case TIdent(s, _) if s.equalsIgnoreCase("REINDEX") =>
        p += 1
        val name = ident()
        expectEnd(); IndexStmt("REINDEX", name, "", Seq.empty)
      // OPTIMIZE INDEX name (parser.rs:4980-4996) — rewrite the
      // persisted graph through the clustered layout, like REINDEX
      case TIdent(s, _) if s.equalsIgnoreCase("OPTIMIZE") =>
        p += 1; eatSoftKw("INDEX")
        val name = ident()
        expectEnd(); AlterIndexStmt(name, "OPTIMIZE", None)
      case TIdent(s, _) if s.equalsIgnoreCase("SELECT") =>
        val (paths, q) = parseSelect()
        expectEnd(); SelectStmt(paths, q)
      case TKw("SESSION", _) =>
        p += 1
        if (trySoftKw("RESET")) parseSessionReset()
        else if (trySoftKw("CLOSE")) { expectEnd(); SessionCtl("CLOSE") }
        else {
          eatKw("SET")
          if (tryKw("SCHEMA")) {
            // SESSION SET SCHEMA schema_reference (parser.rs:3193)
            tryPunct("/")
            val name = ident()
            expectEnd(); SessionSetSchema(name)
          } else if (isSoftKw("TIME")) {
            // SESSION SET TIME ZONE 'zone' (parser.rs:3211)
            p += 1; eatSoftKw("ZONE")
            val tz = cur match {
              case TStr(s0, _) => p += 1; s0
              case _ => err("SESSION SET TIME ZONE expects a string literal")
            }
            expectEnd(); SessionSetTimeZone(tz)
          } else if (trySoftKw("VALUE")) {
            // SESSION SET VALUE [IF NOT EXISTS] $p = expr (parser.rs:3267)
            val ine = parseIfNotExists()
            val name = paramName()
            eatPunct("=")
            val e = parseExpr()
            expectEnd(); SessionSetParam("VALUE", name, ine, valueInit = Some(e))
          } else if (isSoftKw("BINDING") || isSoftKw("TABLE")) {
            // SESSION SET [BINDING] TABLE [IF NOT EXISTS] $p = query
            if (trySoftKw("BINDING")) eatSoftKw("TABLE") else eatSoftKw("TABLE")
            val ine = parseIfNotExists()
            val name = paramName()
            eatPunct("=")
            val q = parseQuery()
            SessionSetParam("TABLE", name, ine, tableInit = Some(q))
          } else if (trySoftKw("RESULT_CACHE")) {
            // SESSION SET RESULT_CACHE ON|OFF — opt-in result/subquery
            // caching (cache/result_cache.rs, cache_config.rs `enabled`)
            val mode = ident().toUpperCase
            if (mode != "ON" && mode != "OFF")
              err("SESSION SET RESULT_CACHE expects ON or OFF")
            expectEnd(); SessionCtl(s"RESULT_CACHE_$mode")
          } else if (trySoftKw("NUMBERS")) {
            // SESSION SET NUMBERS F64|NATIVE — reference number-semantics
            // switch (value.rs:449-453 f64-everywhere arithmetic)
            val mode = ident().toUpperCase
            if (mode != "F64" && mode != "NATIVE")
              err("SESSION SET NUMBERS expects F64 or NATIVE")
            expectEnd(); SessionCtl(s"NUMBERS_$mode")
          } else {
            // [PROPERTY] GRAPH: graph context, graph-typed parameter, or
            // GRAPH TYPE binding (parser.rs:3195-3233)
            trySoftKw("PROPERTY")
            eatKw("GRAPH")
            if (trySoftKw("TYPE")) {
              val name = ident()
              expectEnd(); SessionSetGraphType(name)
            } else if (isSoftKw("IF") || isPunct("$")) {
              // SESSION SET GRAPH [IF NOT EXISTS] $p = path
              val ine = parseIfNotExists()
              val name = paramName()
              eatPunct("=")
              val path = catalogPath()
              expectEnd(); SessionSetParam("GRAPH", name, ine, graphInit = Some(path))
            } else {
              val path = catalogPath()
              expectEnd(); SessionSetGraph(path)
            }
          }
        }
      case TKw("CALL", _) =>
        p += 1
        var name = ident()
        while (tryPunct(".")) name = name + "." + ident()
        val args = Vector.newBuilder[Expr]
        if (tryPunct("(")) {
          if (!isPunct(")")) {
            var more = true
            while (more) { args += parseExpr(); more = tryPunct(",") }
          }
          eatPunct(")")
        }
        // YIELD col [AS alias], … then optional WHERE (ast.rs:90-96)
        val yields = Vector.newBuilder[(String, String)]
        if (trySoftKw("YIELD")) {
          var more = true
          while (more) {
            val c = ident()
            val a = if (tryKw("AS")) ident() else c
            yields += ((c, a))
            more = tryPunct(",")
          }
        }
        val where = if (tryKw("WHERE")) Some(parseExpr()) else None
        expectEnd(); CallStmt(name, args.result(), yields.result(), where)
      case TIdent(s, _) if s.equalsIgnoreCase("DECLARE") =>
        // DECLARE x INT = 5, y STRING … (ast.rs:1067 DeclareStatement;
        // parser.rs:4260) — typed session variables, referenced as $x
        p += 1
        val vars = Vector.newBuilder[(String, String, Option[Expr])]
        var more = true
        while (more) {
          val name = ident()
          val tpe = parseTypeName()
          // initializer: a scalar subquery `(MATCH … RETURN …)` or any
          // expression (the reference evaluates initializers through
          // evaluate_expression with the session context)
          val init =
            if (!tryPunct("=")) None
            else if (isPunct("(") && queryLeadsAt(p + 1)) {
              eatPunct("(")
              val q = parseQueryExpr()
              eatPunct(")")
              Some(Subquery(q))
            } else Some(parseExpr())
          vars += ((name, tpe, init))
          more = tryPunct(",")
        }
        expectEnd(); DeclareStmt(vars.result())
      // START TRANSACTION / BEGIN, both with optional characteristics
      // (parser.rs:4576-4599); COMMIT [WORK] / ROLLBACK [WORK]
      // (parser.rs:4602-4624); SET TRANSACTION <characteristics>
      // (parser.rs:4627-4641)
      case TIdent(s, _) if s.equalsIgnoreCase("START") || s.equalsIgnoreCase("BEGIN") =>
        p += 1
        if (s.equalsIgnoreCase("START")) eatSoftKw("TRANSACTION")
        val (iso, mode) = parseTxCharacteristics()
        expectEnd(); TransactionStmt("START", iso, mode)
      case TIdent(s, _) if s.equalsIgnoreCase("COMMIT") =>
        p += 1; trySoftKw("WORK"); expectEnd(); TransactionStmt("COMMIT")
      case TIdent(s, _) if s.equalsIgnoreCase("ROLLBACK") =>
        p += 1; trySoftKw("WORK"); expectEnd(); TransactionStmt("ROLLBACK")
      case TKw("SET", _) =>
        p += 1; eatSoftKw("TRANSACTION")
        val (iso, mode) = parseTxCharacteristics()
        if (iso.isEmpty && mode.isEmpty)
          err("SET TRANSACTION requires ISOLATION LEVEL and/or READ ONLY|WRITE")
        expectEnd(); TransactionStmt("SET_CHARACTERISTICS", iso, mode)
      case TIdent(s, _) if s.equalsIgnoreCase("GRANT") =>
        // GRANT [ROLE] <role> TO <user> (role membership; the ROLE
        // keyword and quoted principal names match
        // security_role_user_tests.rs:214), or
        // GRANT SELECT|INSERT|UPDATE|DELETE|ALL ON /schema/graph TO <principal>
        // (graph ACE — reference Permission enum, security.rs:219-246)
        p += 1
        // ROLE is a soft keyword only when it is not itself the
        // principal: in `GRANT role TO bob` the token after 'role' is
        // TO, so 'role' is the role name (previously this mis-parsed —
        // TO was consumed as the role)
        val roleKw = !nextIsSoftKw("TO") && trySoftKw("ROLE")
        val first = principalName()
        if (!roleKw && trySoftKw("ON")) {
          eatPunct("/")
          val schema = ident(); eatPunct("/"); val g = ident()
          eatSoftKw("TO")
          val who = principalName()
          expectEnd()
          SecurityStmt("GRANT", "ACCESS",
            s"${first.toUpperCase}|/$schema/$g", Some(who))
        } else {
          eatSoftKw("TO")
          val user = principalName()
          expectEnd(); SecurityStmt("GRANT", "ROLE", first, Some(user))
        }
      case TIdent(s, _) if s.equalsIgnoreCase("REVOKE") =>
        // REVOKE [ROLE] <role> FROM <user> (role membership — inverse of
        // GRANT [ROLE] <role> TO <user>), or
        // REVOKE <perm> ON /schema/graph FROM <principal> (graph ACE)
        p += 1
        // same principal-vs-keyword disambiguation as GRANT, against FROM
        val roleKw = !nextIsSoftKw("FROM") && trySoftKw("ROLE")
        val first = principalName()
        if (!roleKw && trySoftKw("ON")) {
          eatPunct("/")
          val schema = ident(); eatPunct("/"); val g = ident()
          eatSoftKw("FROM")
          val who = principalName()
          expectEnd()
          SecurityStmt("REVOKE", "ACCESS",
            s"${first.toUpperCase}|/$schema/$g", Some(who))
        } else {
          eatSoftKw("FROM")
          val user = principalName()
          expectEnd(); SecurityStmt("REVOKE", "ROLE", first, Some(user))
        }
      case TKw("MATCH", _) =>
        // A MATCH statement is either a read query or MATCH-prefixed DML.
        // Don't sniff the token stream for SET/DELETE/… — a read query can
        // legitimately contain those as property names (MATCH (a) RETURN
        // a.set). Parse as a query first; only on failure re-parse as DML,
        // and surface whichever parse progressed further if both fail.
        val mark = p
        try QueryStmt(parseQuery())
        catch {
          case qe: GqlParseException =>
            val qFail = p
            p = mark
            try parseMatchDml()
            catch {
              case de: GqlParseException =>
                throw (if (p > qFail) de else qe)
            }
        }
      case _ => QueryStmt(parseQuery())
    }
  }

  /** Principal (user/role) name: quoted string or plain identifier
    * (the reference tests quote them, security_role_user_tests.rs).
    */
  private def principalName(): String = cur match {
    case TStr(s2, _) => p += 1; s2
    case _ => ident()
  }

  /** Optional `IF NOT EXISTS` (parser.rs:3217-3224 in the SESSION
    * parameter clauses).
    */
  private def parseIfNotExists(): Boolean =
    if (trySoftKw("IF")) { eatKw("NOT"); eatKw("EXISTS"); true } else false

  /** `$name` parameter reference (parser.rs:3413 parameter_name). */
  private def paramName(): String = { eatPunct("$"); ident() }

  /** A literal option value (string / number / boolean / bare word),
    * rendered as its string form — ALTER INDEX … SET OPTION key = value
    * stores options as metadata strings (parse_value, parser.rs:4960).
    */
  private def optionValue(): String = cur match {
    case TStr(s, _) => p += 1; s
    case TNum(s, _) => p += 1; s
    case TIdent(s, _) => p += 1; s
    case TKw(s, _) => p += 1; s
    case _ => err("expected an option value")
  }

  /** Catalog path: absolute `/schema[/graph]`, qualified `schema/graph`
    * (normalized absolute), or a bare relative name resolved against the
    * session's current schema at dispatch.
    */
  private def catalogPath(): String = {
    val absolute = tryPunct("/")
    val first = ident()
    if (tryPunct("/")) s"/$first/${ident()}"
    else if (absolute) s"/$first"
    else first
  }

  /** SESSION RESET argument tail (parser.rs:3283-3340 session_reset_args;
    * semantics session/models.rs:391-421).
    */
  private def parseSessionReset(): Statement = {
    if (cur.isInstanceOf[TEnd]) return SessionReset("ALL")
    val st =
      if (tryKw("SCHEMA")) SessionReset("SCHEMA")
      else if (isSoftKw("TIME")) { p += 1; eatSoftKw("ZONE"); SessionReset("TIME_ZONE") }
      else if (isSoftKw("PROPERTY") || isKw("GRAPH")) {
        trySoftKw("PROPERTY"); eatKw("GRAPH"); SessionReset("GRAPH")
      }
      else if (tryKw("ALL")) {
        if (trySoftKw("PARAMETERS")) SessionReset("PARAMETERS")
        else { eatSoftKw("CHARACTERISTICS"); SessionReset("CHARACTERISTICS") }
      }
      else if (trySoftKw("PARAMETERS")) SessionReset("PARAMETERS")
      else if (trySoftKw("CHARACTERISTICS")) SessionReset("CHARACTERISTICS")
      else { trySoftKw("PARAMETER"); SessionReset("PARAMETER", Some(paramName())) }
    expectEnd(); st
  }

  /** `[IF NOT EXISTS] name ON table (col, …)` after CREATE [GRAPH] INDEX,
    * or `name` after DROP INDEX (parser.rs:4842-4960).
    */
  private def parseIndexTail(op: String): Statement = {
    if (op == "DROP") {
      val name = ident()
      expectEnd(); IndexStmt("DROP", name, "", Seq.empty)
    } else {
      // optional IF NOT EXISTS
      if (isSoftKw("IF")) { p += 1; eatKw("NOT"); eatKw("EXISTS") }
      val name = ident()
      eatSoftKw("ON")
      val table = ident()
      val cols = Vector.newBuilder[String]
      if (tryPunct("(")) {
        var more = true
        while (more) { cols += ident(); more = tryPunct(",") }
        eatPunct(")")
      }
      // optional USING <type> — accepted, layout is always clustered
      if (trySoftKw("USING")) ident()
      expectEnd(); IndexStmt("CREATE", name, table, cols.result())
    }
  }

  /** `name ( NODE TYPE L (p TYPE [NOT NULL] [UNIQUE], …), EDGE TYPE T
    * (FROM A TO B [, p TYPE …]), … )` after CREATE GRAPH TYPE, or `name
    * [CASCADE]` after DROP GRAPH TYPE (schema/parser/graph_type.rs:537).
    */
  private def parseGraphTypeTail(op: String): Statement = {
    import graft.graph.GraphType._
    val name = ident()
    if (op == "DROP") {
      trySoftKw("CASCADE")
      expectEnd(); GraphTypeStmt("DROP", name, None)
    } else {
      def parseProps(): Seq[PropDef] = parseTypeProps()
      eatPunct("(")
      val nodes = Vector.newBuilder[NodeTypeDef]
      val edges = Vector.newBuilder[EdgeTypeDef]
      var more = true
      while (more) {
        if (trySoftKw("NODE")) {
          eatSoftKw("TYPE")
          val label = ident()
          eatPunct("(")
          val props = if (isPunct(")")) Seq.empty else parseProps()
          eatPunct(")")
          nodes += NodeTypeDef(label, props)
        } else if (trySoftKw("EDGE")) {
          eatSoftKw("TYPE")
          val t = ident()
          eatPunct("(")
          eatSoftKw("FROM")
          val from = ident()
          eatSoftKw("TO")
          val to = ident()
          val props = if (tryPunct(",")) parseProps() else Seq.empty
          eatPunct(")")
          edges += EdgeTypeDef(t, from, to, props)
        } else err("expected NODE TYPE or EDGE TYPE")
        more = tryPunct(",")
      }
      eatPunct(")")
      expectEnd()
      GraphTypeStmt("CREATE", name,
        Some(GraphTypeDef(name, nodes.result(), edges.result())))
    }
  }

  /** `p TYPE [NOT NULL] [UNIQUE] [, …]` property definition list shared
    * by CREATE and ALTER GRAPH TYPE bodies.
    */
  private def parseTypeProps(): Seq[graft.graph.GraphType.PropDef] = {
    val out = Vector.newBuilder[graft.graph.GraphType.PropDef]
    var more = true
    while (more) {
      val pn = ident()
      val pt = parseTypeName()
      var required = false
      var reading = true
      while (reading) {
        if (isKw("NOT")) { p += 1; eatKw("NULL"); required = true }
        else if (isSoftKw("UNIQUE")) p += 1 // accepted; not enforced
        else reading = false
      }
      out += graft.graph.GraphType.PropDef(pn, pt.toUpperCase, required)
      more = tryPunct(",")
    }
    out.result()
  }

  /** MATCH … [WITH …]* INSERT/SET/REMOVE/[DETACH] DELETE — both the
    * simple single-segment DML (match_set.rs etc.) and the WITH-chained
    * MutationPipeline (ast.rs:140-180).
    */
  private def parseMatchDml(): Statement = {
    allowMutationEnd = true
    val segsB = Vector.newBuilder[Segment]
    var done = false
    while (!done) {
      val (seg, isReturn) = parseSegment()
      segsB += seg
      if (isReturn) done = true
      else if (cur.isInstanceOf[TEnd]) err("DML must end with a mutation clause")
    }
    allowMutationEnd = false
    if (!mutationEnd) err("expected SET, REMOVE, DELETE or INSERT")
    mutationEnd = false
    val segs = segsB.result()
    // the simple single-pattern statements compile against ONE label
    // table — a comma pattern (`MATCH (a:X), (b:Y) DELETE a`: the b
    // pattern gates whether ANY a matches) or an OPTIONAL MATCH must
    // route through the pipeline, which compiles the full segment
    // (r14: `matches.headOption` silently DROPPED the extra patterns)
    val simple = segs.size == 1 && segs.head.steps.isEmpty &&
      segs.head.matches.size == 1 && segs.head.optionalMatches.isEmpty
    val pattern = segs.head.matches.headOption.getOrElse(
      err("DML needs a MATCH pattern"))
    val where = segs.head.where

    if (tryKw("INSERT")) {
      // comma-separated multi-hop chains: INSERT (a)-[:R]->(b)-[:R]->(c),
      // (a)-[:R]->(d) (pattern_tests.rs shortest-path graph setup)
      val insB = Vector.newBuilder[PathPattern]
      insB += parsePathPattern()
      while (tryPunct(",")) insB += parsePathPattern()
      expectEnd()
      val paths = insB.result()
      // node-only patterns create one node per binding row — through
      // WITH pipelines too (match_with_tests.rs); edge chains keep the
      // matched-endpoints form, which takes the FULL comma-pattern list
      // (so it is not gated on the single-pattern `simple` used by
      // SET/REMOVE/DELETE)
      if (paths.forall(_.hops.isEmpty)) PipelineInsertStmt(Query(segs), paths)
      else if (segs.size == 1 && segs.head.steps.isEmpty &&
          segs.head.optionalMatches.isEmpty)
        MatchInsertStmt(segs.head.matches, where, paths)
      else err("MATCH…WITH…INSERT takes node patterns; edge chains use " +
        "the simple MATCH…INSERT form")
    } else if (tryKw("SET")) {
      val as = Vector.newBuilder[(Prop, Expr)]
      // SET v:Label items (SetItem::Label, ast.rs:925-928; dml_tests.rs
      // "SET emp:Manager") mix freely with property assignments
      val labelAdds = Vector.newBuilder[(String, String)]
      var more = true
      while (more) {
        val v = ident()
        if (tryPunct(":")) labelAdds += ((v, ident()))
        else {
          eatPunct("."); val pr = ident(); eatPunct("=")
          as += ((Prop(v, pr), parseExpr()))
        }
        more = tryPunct(",")
      }
      expectEnd()
      val (assigns, labels) = (as.result(), labelAdds.result())
      if (simple) MatchSetStmt(pattern, where, assigns, labels)
      else PipelineMutationStmt(Query(segs), "SET",
        assigns.headOption.map(_._1.variable)
          .orElse(labels.headOption.map(_._1))
          .getOrElse(err("SET requires at least one item")),
        assigns, Seq.empty, detach = false, labelAdds = labels)
    } else if (tryKw("REMOVE")) {
      val ps = Vector.newBuilder[Prop]
      // REMOVE v:Label items (RemoveItem::Label, ast.rs:943-948)
      val labelRms = Vector.newBuilder[(String, String)]
      var more = true
      while (more) {
        val v = ident()
        if (tryPunct(":")) labelRms += ((v, ident()))
        else { eatPunct("."); ps += Prop(v, ident()) }
        more = tryPunct(",")
      }
      expectEnd()
      val (props, labels) = (ps.result(), labelRms.result())
      if (simple) MatchRemoveStmt(pattern, where, props, labels)
      else PipelineMutationStmt(Query(segs), "REMOVE",
        props.headOption.map(_.variable)
          .orElse(labels.headOption.map(_._1))
          .getOrElse(err("REMOVE requires at least one item")),
        Seq.empty, props, detach = false, labelRemoves = labels)
    } else {
      val detach = tryKw("DETACH")
      eatKw("DELETE")
      val target = ident()
      expectEnd()
      if (simple) MatchDeleteStmt(pattern, where, target, detach)
      else PipelineMutationStmt(Query(segs), "DELETE", target,
        Seq.empty, Seq.empty, detach)
    }
  }

  /** `[ISOLATION LEVEL (READ UNCOMMITTED|READ COMMITTED|REPEATABLE READ|
    * SERIALIZABLE)] [READ ONLY|READ WRITE]` (parser.rs:4644-4697).
    */
  private def parseTxCharacteristics(): (Option[String], Option[String]) = {
    val iso =
      if (trySoftKw("ISOLATION")) {
        eatSoftKw("LEVEL")
        if (trySoftKw("REPEATABLE")) { eatSoftKw("READ"); Some("REPEATABLE READ") }
        else if (trySoftKw("SERIALIZABLE")) Some("SERIALIZABLE")
        else {
          eatSoftKw("READ")
          if (trySoftKw("UNCOMMITTED")) Some("READ UNCOMMITTED")
          else { eatSoftKw("COMMITTED"); Some("READ COMMITTED") }
        }
      } else None
    val mode =
      if (trySoftKw("READ")) {
        if (trySoftKw("ONLY")) Some("READ ONLY")
        else { eatSoftKw("WRITE"); Some("READ WRITE") }
      } else None
    (iso, mode)
  }

  private def expectEnd(): Unit = cur match {
    case TEnd(_) => ()
    case _ => err("unexpected trailing input")
  }

  // ---- entry ----
  /** Full query expression: pipeline queries chained by set operations
    * (ast.rs:208-228; left-associative like the reference's parser).
    */
  def parseQuery(): QueryExpr = {
    val q = parseQueryExpr()
    cur match {
      case TEnd(_) => ()
      case _ => err("unexpected trailing input")
    }
    q
  }

  private def parseQueryExpr(): QueryExpr = {
    var left: QueryExpr = parseSetOpOperand()
    var more = true
    while (more) {
      val op =
        if (tryKw("UNION")) Some("UNION")
        else if (tryKw("INTERSECT")) Some("INTERSECT")
        else if (tryKw("EXCEPT")) Some("EXCEPT")
        else None
      op match {
        case Some(o) =>
          val all = tryKw("ALL")
          left = SetOpQuery(o, all, left, parseSetOpOperand())
        case None => more = false
      }
    }
    left
  }

  /** One set-operation operand: a pipeline query, or a parenthesized
    * query group. Trailing ORDER BY / SKIP / LIMIT after the closing
    * paren bind to the GROUP — the disambiguation the un-parenthesized
    * grammar can't express (there the tail clauses bind to the rightmost
    * branch, matching the reference parser).
    */
  private def parseSetOpOperand(): QueryExpr = {
    val grouped = cur match {
      case TPunct("(", _) => tokens.lift(p + 1) match {
        case Some(TKw("MATCH" | "OPTIONAL" | "UNWIND" | "FOR" | "LET" |
          "FILTER" | "RETURN", _)) => true
        case Some(TIdent(s, _)) if s.equalsIgnoreCase("SELECT") => true
        case Some(TPunct("(", _)) => true // nested group
        case _ => false
      }
      case _ => false
    }
    if (!grouped) return parsePipelineQuery()
    eatPunct("(")
    val inner = parseQueryExpr()
    eatPunct(")")
    var orderBy = Vector.empty[SortItem]
    if (tryKw("ORDER")) { eatKw("BY"); orderBy = parseSortItems() }
    var skip: Option[Long] = None
    var limit: Option[Long] = None
    var more = true
    while (more) {
      if (tryKw("SKIP") || tryKw("OFFSET")) skip = Some(parseLongLit())
      else if (tryKw("LIMIT")) limit = Some(parseLongLit())
      else more = false
    }
    if (orderBy.nonEmpty || skip.isDefined || limit.isDefined)
      OrderedQuery(inner, orderBy, skip, limit)
    else inner
  }

  private def parsePipelineQuery(): Query = {
    if (isSoftKw("SELECT")) {
      val (paths, q) = parseSelect()
      if (paths.nonEmpty)
        err("SELECT … FROM /schema/graph needs session context — use execute()")
      return q
    }
    val segs = Vector.newBuilder[Segment]
    var done = false
    while (!done) {
      val (seg, isReturn) = parseSegment()
      segs += seg
      if (isReturn) done = true
      else if (cur.isInstanceOf[TEnd]) err("query must end with RETURN")
    }
    Query(segs.result())
  }

  /** SQL-style SELECT (ast.rs:43-80): `SELECT [DISTINCT] items FROM
    * [/schema/graph] MATCH patterns [WHERE e] [GROUP BY…] [HAVING e]
    * [ORDER BY…] [SKIP n] [LIMIT n]` — desugars to one query segment.
    */
  private def parseSelect(): (Seq[String], Query) = {
    eatSoftKw("SELECT")
    val distinct = tryKw("DISTINCT")
    val items = parseReturnItems()
    eatSoftKw("FROM")
    // graph expression: /s/g [UNION /s/g]* (ast.rs:1117 GraphExpression —
    // Union merges the graphs' label tables before matching)
    val paths = Vector.newBuilder[String]
    if (isPunct("/")) {
      var more = true
      while (more) {
        eatPunct("/"); val schema = ident(); eatPunct("/"); val g = ident()
        paths += s"/$schema/$g"
        more = tryKw("UNION")
      }
    }
    val path = paths.result()
    eatKw("MATCH")
    val matches = parsePatternList()
    val where = if (tryKw("WHERE")) Some(parseExpr()) else None
    var groupBy = Vector.empty[Expr]
    if (tryKw("GROUP")) { eatKw("BY"); groupBy = parseExprList() }
    var having: Option[Expr] = None
    if (tryKw("HAVING")) having = Some(parseExpr())
    var orderBy = Vector.empty[SortItem]
    if (tryKw("ORDER")) { eatKw("BY"); orderBy = parseSortItems() }
    var skip: Option[Long] = None
    var limit: Option[Long] = None
    var more = true
    while (more) {
      if (tryKw("SKIP") || tryKw("OFFSET")) skip = Some(parseLongLit())
      else if (tryKw("LIMIT")) limit = Some(parseLongLit())
      else more = false
    }
    (path, Query(Seq(Segment(matches, Seq.empty, where, Seq.empty, items,
      None, distinct, groupBy, having, orderBy, skip, limit))))
  }

  /** Parse one segment ending in WITH (false) or RETURN (true). */
  private def parseSegment(): (Segment, Boolean) = {
    var matches = Vector.empty[PathPattern]
    var optMatches = Vector.empty[PathPattern]
    var where: Option[Expr] = None
    val steps = Vector.newBuilder[Step]
    var haveSteps = false

    var reading = true
    while (reading) {
      if (tryKw("MATCH")) {
        matches ++= parsePatternList()
        if (tryKw("WHERE")) where = Some(combineWhere(where, parseExpr()))
      } else if (isKw("OPTIONAL")) {
        eatKw("OPTIONAL"); eatKw("MATCH")
        optMatches ++= parsePatternList()
      } else if (tryKw("UNWIND")) {
        val e = parseExpr()
        eatKw("AS")
        steps += StUnwind(e, ident()); haveSteps = true
      } else if (tryKw("FOR")) {
        // FOR [alias:] var IN expr (parser.rs:787-808) — iteration over a
        // list: same row-expansion semantics as UNWIND
        val v0 = ident()
        val v = if (tryPunct(":")) ident() else v0
        eatKw("IN")
        steps += StUnwind(parseExpr(), v); haveSteps = true
      } else if (tryKw("LET")) {
        // LET v = expr [, v = expr]* (parser.rs:760-785)
        val defs = Vector.newBuilder[(String, Expr)]
        var more = true
        while (more) {
          val v = ident(); eatPunct("=")
          defs += ((v, parseExpr()))
          more = tryPunct(",")
        }
        steps += StLet(defs.result()); haveSteps = true
      } else if (tryKw("FILTER")) {
        // FILTER [WHERE] expr (parser.rs:810-835)
        tryKw("WHERE")
        steps += StFilter(parseExpr())
      } else if (haveSteps && tryKw("WHERE")) {
        // WHERE directly after UNWIND/FOR/LET filters the expanded rows
        // (match_with_tests.rs:1746: UNWIND products AS product WHERE
        // product.price > 25 REMOVE …)
        steps += StFilter(parseExpr())
      } else reading = false
    }

    if (allowMutationEnd && (isKw("SET") || isKw("REMOVE") ||
        isKw("DELETE") || isKw("DETACH") || isKw("INSERT"))) {
      // mutation terminator: expose every binding (RETURN *-like) for the
      // final mutation clause; the keyword itself stays unconsumed
      mutationEnd = true
      return (Segment(matches, optMatches, where, steps.result(),
        Seq(ReturnItem(Star(), None)), None, distinct = false,
        Vector.empty, None, Vector.empty, None, None), true)
    }
    val isReturn =
      if (tryKw("RETURN")) true
      else if (tryKw("WITH")) false
      else err("expected MATCH, UNWIND, WITH or RETURN")

    val distinct = tryKw("DISTINCT")
    val items = parseReturnItems()
    val postWhere = if (tryKw("WHERE")) Some(parseExpr()) else None
    var groupBy = Vector.empty[Expr]
    if (tryKw("GROUP")) { eatKw("BY"); groupBy = parseExprList() }
    var having: Option[Expr] = None
    if (tryKw("HAVING")) having = Some(parseExpr())
    var orderBy = Vector.empty[SortItem]
    if (tryKw("ORDER")) {
      eatKw("BY")
      orderBy = parseSortItems()
    }
    var skip: Option[Long] = None
    var limit: Option[Long] = None
    var more = true
    while (more) {
      if (tryKw("SKIP") || tryKw("OFFSET")) skip = Some(parseLongLit())
      else if (tryKw("LIMIT")) limit = Some(parseLongLit())
      else more = false
    }
    (Segment(matches, optMatches, where, steps.result(), items, postWhere,
      distinct, groupBy, having, orderBy, skip, limit), isReturn)
  }

  private def combineWhere(acc: Option[Expr], e: Expr): Expr =
    acc.fold(e)(a => Bin("AND", a, e))

  private def parseLongLit(): Long = cur match {
    case TNum(s, _) => p += 1; s.toLong
    case _ => err("expected integer literal")
  }

  private def parseReturnItems(): Seq[ReturnItem] = {
    if (isPunct("*")) { p += 1; return Seq(ReturnItem(Star(), None)) }
    val items = Vector.newBuilder[ReturnItem]
    var more = true
    while (more) {
      val e = parseExpr()
      val alias = if (tryKw("AS")) Some(ident()) else None
      items += ReturnItem(e, alias)
      more = tryPunct(",")
    }
    items.result()
  }

  private def parseExprList(): Vector[Expr] = {
    val items = Vector.newBuilder[Expr]
    var more = true
    while (more) { items += parseExpr(); more = tryPunct(",") }
    items.result()
  }

  private def parseSortItems(): Vector[SortItem] = {
    val items = Vector.newBuilder[SortItem]
    var more = true
    while (more) {
      val e = parseExpr()
      val asc =
        if (tryKw("DESC") || tryKw("DESCENDING")) false
        else { tryKw("ASC"); tryKw("ASCENDING"); true }
      items += SortItem(e, asc)
      more = tryPunct(",")
    }
    items.result()
  }

  // ---- patterns ----
  private def parsePatternList(): Seq[PathPattern] = {
    val paths = Vector.newBuilder[PathPattern]
    var more = true
    while (more) { paths += parsePathPattern(); more = tryPunct(",") }
    paths.result()
  }

  private def parsePathPattern(): PathPattern = {
    // optional `p =` path variable assignment (ast.rs:313)
    val assignment = cur match {
      case TIdent(v, _) if tokens.lift(p + 1).exists {
          case TPunct("=", _) => true
          case _ => false
        } =>
        p += 2; Some(v)
      case _ => None
    }
    // optional path-type prefix (ast.rs:275-308): WALK | TRAIL | SIMPLE |
    // ACYCLIC, each optionally followed by the PATH noise word
    val sem =
      if (isSoftKw("WALK") || isSoftKw("TRAIL") || isSoftKw("SIMPLE") ||
          isSoftKw("ACYCLIC")) {
        val s = ident().toUpperCase
        trySoftKw("PATH")
        Some(s)
      } else None
    val start = parseNodePattern()
    val hops = Vector.newBuilder[(EdgePattern, NodePattern)]
    var more = true
    while (more) {
      if (isPunct("-") || isPunct("<-")) {
        val e = parseEdgePattern()
        val n = parseNodePattern()
        hops += ((e, n))
      } else more = false
    }
    PathPattern(start, hops.result(), assignment, sem)
  }

  private def parseNodePattern(): NodePattern = {
    eatPunct("(")
    var variable: Option[String] = None
    cur match {
      case TIdent(s, _) => variable = Some(s); p += 1
      case _ => ()
    }
    val labels = Vector.newBuilder[String]
    while (tryPunct(":")) labels += ident()
    val props = if (isPunct("{")) parsePropMap() else Seq.empty
    eatPunct(")")
    NodePattern(variable, labels.result(), props)
  }

  private def parseEdgePattern(): EdgePattern = {
    // <-[e:T]-  |  -[e:T]->  |  -[e:T]-
    val leftArrow = tryPunct("<-")
    if (!leftArrow) eatPunct("-")
    var variable: Option[String] = None
    var types = Vector.empty[String]
    var props: Seq[(String, Expr)] = Seq.empty
    var quant: Option[(Int, Int)] = None
    if (tryPunct("[")) {
      cur match {
        case TIdent(s, _) => variable = Some(s); p += 1
        case _ => ()
      }
      if (tryPunct(":")) {
        types = types :+ ident()
        while (tryPunct("|")) types = types :+ ident()
      }
      if (tryPunct("*")) { // var-length: *, *n, *n..m, *..m
        var lo = 1
        var hi = 10
        cur match {
          case TNum(s, _) => lo = s.toInt; hi = lo; p += 1
          case _ => ()
        }
        if (tryPunct("..")) {
          hi = 10
          cur match {
            case TNum(s, _) => hi = s.toInt; p += 1
            case _ => ()
          }
        }
        quant = Some((lo, hi))
      }
      if (isPunct("{")) props = parsePropMap()
      eatPunct("]")
      // postfix quantifiers (executor.rs:6435 expansion: `?`, `{n}`,
      // `{n,m}`, `{n,}` — the open upper bound takes the same cap-10 the
      // `*`-forms use, executor.rs:6505-6510)
      if (quant.isEmpty) {
        if (tryPunct("?")) quant = Some((0, 1))
        else if (tryPunct("{")) {
          val lo = cur match {
            case TNum(s, _) => p += 1; s.toInt
            case _ => err("edge quantifier expects a number")
          }
          var hi = lo
          if (tryPunct(",")) {
            hi = 10
            cur match { case TNum(s, _) => hi = s.toInt; p += 1; case _ => () }
          }
          eatPunct("}")
          quant = Some((lo, hi))
        }
      }
    }
    val rightArrow = tryPunct("->")
    if (!rightArrow) eatPunct("-") // <-[…]- and -[…]- end with a bare dash
    val dir =
      if (leftArrow && rightArrow) err("edge cannot have arrows on both sides")
      else if (leftArrow) In
      else if (rightArrow) Out
      else Undirected
    EdgePattern(variable, types, props, dir, quant)
  }

  private def parsePropMap(): Seq[(String, Expr)] = {
    eatPunct("{")
    val props = Vector.newBuilder[(String, Expr)]
    if (!isPunct("}")) {
      var more = true
      while (more) {
        val k = ident()
        eatPunct(":")
        props += ((k, parseExpr()))
        more = tryPunct(",")
      }
    }
    eatPunct("}")
    props.result()
  }

  // ---- expressions, precedence-climbing ----
  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var l = parseXor()
    while (tryKw("OR")) l = Bin("OR", l, parseXor())
    l
  }
  private def parseXor(): Expr = {
    var l = parseAnd()
    while (tryKw("XOR")) l = Bin("XOR", l, parseAnd())
    l
  }
  private def parseAnd(): Expr = {
    var l = parseNot()
    while (tryKw("AND")) l = Bin("AND", l, parseNot())
    l
  }
  private def parseNot(): Expr =
    if (tryKw("NOT")) Not(parseNot()) else parseComparison()

  private def parseComparison(): Expr = {
    val l = parseAdditive()
    if (isPunct("=") || isPunct("<>") || isPunct("<") || isPunct("<=") ||
        isPunct(">") || isPunct(">=")) {
      val op = advance().asInstanceOf[TPunct].s
      // quantified comparison: op ALL|ANY|SOME ( query )
      // (ast.rs:1326-1334). ALL is a hard keyword; ANY/SOME are soft and
      // only quantify when followed by a parenthesized query.
      val quant: Option[String] = cur match {
        case TKw("ALL", _) => Some("ALL")
        case TIdent(s, _) if (s.equalsIgnoreCase("ANY") ||
            s.equalsIgnoreCase("SOME")) &&
            isPunctAt(p + 1, "(") && queryLeadsAt(p + 2) =>
          Some(s.toUpperCase)
        case _ => None
      }
      quant match {
        case Some(qk) =>
          p += 1
          eatPunct("(")
          val q = parseQueryExpr()
          eatPunct(")")
          QuantifiedCmp(op, qk, l, q)
        case None => Bin(op, l, parseAdditive())
      }
    } else if (isKw("IS")) {
      eatKw("IS")
      val negated = tryKw("NOT")
      if (tryKw("NULL")) IsNull(l, negated)
      else if (tryKw("TRUE")) IsTruth(l, "TRUE", negated)
      else if (tryKw("FALSE")) IsTruth(l, "FALSE", negated)
      else if (trySoftKw("UNKNOWN")) IsTruth(l, "UNKNOWN", negated)
      // IS [NOT] NORMALIZED / DIRECTED / SOURCE OF e / DESTINATION OF e /
      // :Label — IsPredicateType (ast.rs:1598-1611); soft keywords
      else if (trySoftKw("NORMALIZED")) IsNormalized(l, negated)
      else if (trySoftKw("DIRECTED")) IsDirected(l, negated)
      else if (trySoftKw("SOURCE")) {
        eatSoftKw("OF"); IsSrcDst(l, parseAdditive(), dest = false, negated)
      } else if (trySoftKw("DESTINATION")) {
        eatSoftKw("OF"); IsSrcDst(l, parseAdditive(), dest = true, negated)
      } else if (tryPunct(":")) IsLabeled(l, ident(), negated)
      else err("expected NULL, TRUE, FALSE, UNKNOWN, NORMALIZED, DIRECTED, " +
        "SOURCE OF, DESTINATION OF or :Label after IS")
    } else if (isKw("IN") || (isKw("NOT") && peekKwAfterNot("IN"))) {
      val negated = tryKw("NOT")
      eatKw("IN")
      eatPunct("[")
      val items = if (isPunct("]")) Vector.empty[Expr] else parseExprList()
      eatPunct("]")
      InList(l, items, negated)
    } else if (isKw("STARTS") || isKw("ENDS") || isKw("CONTAINS") || isKw("LIKE") ||
        (isKw("NOT") && (peekKwAfterNot("LIKE") || peekKwAfterNot("CONTAINS") ||
          peekKwAfterNot("STARTS") || peekKwAfterNot("ENDS")))) {
      val negated = tryKw("NOT")
      val op =
        if (tryKw("STARTS")) { eatKw("WITH"); "STARTS WITH" }
        else if (tryKw("ENDS")) { eatKw("WITH"); "ENDS WITH" }
        else if (tryKw("CONTAINS")) "CONTAINS"
        else { eatKw("LIKE"); "LIKE" }
      StringPred(op, l, parseAdditive(), negated)
    } else l
  }

  private def peekKwAfterNot(kw: String): Boolean = tokens(p + 1) match {
    case TKw(k, _) => k == kw
    case _ => false
  }

  private def parseAdditive(): Expr = {
    var l = parseMultiplicative()
    var more = true
    while (more) {
      if (tryPunct("+")) l = Bin("+", l, parseMultiplicative())
      else if (tryPunct("-")) l = Bin("-", l, parseMultiplicative())
      else if (tryPunct("||")) l = Bin("||", l, parseMultiplicative())
      else more = false
    }
    l
  }

  private def parseMultiplicative(): Expr = {
    var l = parseUnary()
    var more = true
    while (more) {
      if (tryPunct("*")) l = Bin("*", l, parseUnary())
      else if (tryPunct("/")) l = Bin("/", l, parseUnary())
      else if (tryPunct("%")) l = Bin("%", l, parseUnary())
      else more = false
    }
    l
  }

  private def parseUnary(): Expr =
    if (tryPunct("-")) Neg(parseUnary())
    else if (tryPunct("+")) parseUnary()
    else parsePostfix()

  private def parsePostfix(): Expr = {
    var e = parsePrimary()
    var more = true
    while (more) {
      if (isPunct(".") ) {
        e match {
          case Ident(v) =>
            eatPunct(".")
            e = Prop(v, ident())
          case Prop(_, _) | Index(_, _) | Fn(_, _, _) | FieldAccess(_, _) =>
            eatPunct(".")
            e = FieldAccess(e, ident())
          case _ => more = false
        }
      } else if (tryPunct("[")) {
        val idx = parseExpr()
        eatPunct("]")
        e = Index(e, idx)
      } else more = false
    }
    e
  }

  private def parsePrimary(): Expr = {
    cur match {
      case TKw("NULL", _) => p += 1; NullLit()
      case TKw("TRUE", _) => p += 1; BoolLit(true)
      case TKw("FALSE", _) => p += 1; BoolLit(false)
      case TKw("COUNT", _) =>
        p += 1
        eatPunct("(")
        if (tryPunct("*")) { eatPunct(")"); CountStar() }
        else {
          val distinct = tryKw("DISTINCT")
          val arg = parseExpr()
          eatPunct(")")
          Fn("COUNT", Seq(arg), distinct)
        }
      case TKw("EXISTS", _) =>
        p += 1
        val open = if (tryPunct("{")) "}" else { eatPunct("("); ")" }
        val paths = parsePatternList()
        eatPunct(open)
        ExistsPattern(paths)
      case TKw("CASE", _) =>
        p += 1
        val subject = if (!isKw("WHEN")) Some(parseExpr()) else None
        val whens = Vector.newBuilder[(Expr, Expr)]
        while (tryKw("WHEN")) {
          val c = parseExpr()
          eatKw("THEN")
          whens += ((c, parseExpr()))
        }
        val otherwise = if (tryKw("ELSE")) Some(parseExpr()) else None
        eatKw("END")
        CaseExpr(subject, whens.result(), otherwise)
      case TKw("CAST", _) =>
        p += 1
        eatPunct("(")
        val e = parseExpr()
        eatKw("AS")
        val t = parseTypeName()
        eatPunct(")")
        Cast(e, t)
      case TNum(s, _) =>
        p += 1
        NumLit(BigDecimal(s), isInt = !s.contains('.'))
      case TStr(s, _) => p += 1; StrLit(s)
      case TPunct("$", _) =>
        p += 1
        Param(ident())
      case TPunct("(", _) if queryLeadsAt(p + 1) =>
        // scalar subquery in an expression position (executor.rs:4587-4810)
        p += 1
        val q = parseQueryExpr()
        eatPunct(")")
        Subquery(q)
      case TPunct("(", _) =>
        p += 1
        val e = parseExpr()
        eatPunct(")")
        e
      case TPunct("[", _) =>
        p += 1
        val items = if (isPunct("]")) Vector.empty[Expr] else parseExprList()
        eatPunct("]")
        ListLit(items)
      case TIdent(s, _) if s.equalsIgnoreCase("PATH") &&
          tokens.lift(p + 1).exists {
            case TPunct("[", _) => true
            case _ => false
          } =>
        // PATH[n0, e0, n1, …] constructor (executor.rs:4899-4951):
        // alternating node/edge elements build a path value. PATH is a
        // reserved word in expression-head position followed by '[' —
        // reference parity (its lexer tokenizes PATH as a keyword), so
        // `path[i]` subscripting needs the variable named something else.
        p += 1
        eatPunct("[")
        val items = if (isPunct("]")) Vector.empty[Expr] else parseExprList()
        eatPunct("]")
        Fn("PATH", items, distinct = false)
      case TIdent(s, _) =>
        p += 1
        if (tryPunct("(")) {
          val distinct = tryKw("DISTINCT")
          val args = if (isPunct(")")) Vector.empty[Expr] else parseExprList()
          eatPunct(")")
          Fn(s.toUpperCase, args, distinct)
        } else Ident(s)
      case t => err(s"unexpected token")
    }
  }
}

class GqlParseException(msg: String) extends RuntimeException(msg)

object Parser {
  def parse(query: String): Ast.QueryExpr =
    Lexer.tokenize(query) match {
      case Left(e) => throw new GqlParseException(e)
      case Right(toks) => new Parser(toks).parseQuery()
    }

  // CREATE PROCEDURE and AT keep their bodies as raw text (re-dispatched
  // at execution time), like the reference's stored-procedure catalog
  // entries and AtLocation statement lists.
  // dotted names parse so the gql.* reservation check can reject them
  // with a clear error (stored_procedure_no_prefix_test.rs)
  private val CreateProcRe =
    """(?is)\s*CREATE\s+PROCEDURE\s+([\w.]+)\s+AS\s+(.+)""".r
  private val AtRe =
    """(?is)\s*AT\s+(/\w+/\w+)\s+(.+)""".r

  def parseStatement(text: String): Ast.Statement = text match {
    case CreateProcRe(name, body) => Ast.ProcedureStmt("CREATE", name, Some(body.trim))
    case AtRe(path, body) => Ast.AtStmt(path, body.trim)
    case _ =>
      Lexer.tokenize(text) match {
        case Left(e) => throw new GqlParseException(e)
        case Right(toks) => new Parser(toks).parseStatement()
      }
  }
}
