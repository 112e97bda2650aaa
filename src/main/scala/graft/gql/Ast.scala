package graft.gql

/** AST for the ISO-GQL subset (shape mirrors the reference's
  * graphlite/src/ast/ast.rs for auditability; the grammar source of truth
  * is /root/reference/grammar/ISO_GQL_Grammar_BNF.txt).
  */
object Ast {

  // ---- expressions (ast.rs:497-517) ----
  sealed trait Expr
  case class NullLit() extends Expr
  case class BoolLit(v: Boolean) extends Expr
  // BigDecimal, not Double: integer literals above 2^53 (INT64 range,
  // e.g. 9007199254740993) must survive parsing exactly
  case class NumLit(v: BigDecimal, isInt: Boolean) extends Expr
  case class StrLit(v: String) extends Expr
  case class ListLit(items: Seq[Expr]) extends Expr
  /** Bare variable reference (node/edge var, or alias from WITH/RETURN). */
  case class Ident(name: String) extends Expr
  /** `$name` — session parameter reference (set by NEXT…YIELD chains or
    * the session API; session/parameters in the reference).
    */
  case class Param(name: String) extends Expr
  /** `a.prop` property access. */
  case class Prop(variable: String, prop: String) extends Expr
  /** Function call; `distinct` per ast.rs:537-543. */
  case class Fn(name: String, args: Seq[Expr], distinct: Boolean = false) extends Expr
  case class CountStar() extends Expr
  /** Binary op: + - * / % || = <> < <= > >= AND OR XOR */
  case class Bin(op: String, l: Expr, r: Expr) extends Expr
  case class Not(e: Expr) extends Expr
  case class Neg(e: Expr) extends Expr
  /** IS [NOT] NULL (ast.rs:1580-1611 subset). */
  case class IsNull(e: Expr, negated: Boolean) extends Expr
  /** IS [NOT] TRUE | FALSE | UNKNOWN (ast.rs:1580-1611). */
  case class IsTruth(e: Expr, truth: String, negated: Boolean) extends Expr
  case class InList(e: Expr, items: Seq[Expr], negated: Boolean) extends Expr
  /** STARTS WITH / ENDS WITH / CONTAINS / LIKE (executor.rs:5353-5412). */
  case class StringPred(op: String, l: Expr, r: Expr, negated: Boolean) extends Expr
  /** CASE (ast.rs:1279-1316): simple (subject defined) or searched. */
  case class CaseExpr(subject: Option[Expr], whens: Seq[(Expr, Expr)],
      otherwise: Option[Expr]) extends Expr
  case class Cast(e: Expr, toType: String) extends Expr
  /** arr[i] (ast.rs:1591-1596). */
  case class Index(e: Expr, idx: Expr) extends Expr
  /** Chained field access on a non-variable base — `f(x).y`,
    * `a.props.key` (ast.rs property access on arbitrary expressions);
    * resolves as map-key or struct-field extraction.
    */
  case class FieldAccess(e: Expr, field: String) extends Expr
  /** Scalar subquery `(MATCH … RETURN …)` in any expression position
    * (reference evaluates subquery expressions row-at-a-time with a
    * cache, executor.rs:4587-4810 + cache/subquery_cache.rs; we unnest
    * relationally — uncorrelated: first-row scalar broadcast-joined;
    * correlated through shared pattern variables: group-by + outer join,
    * the reference's unnesting at logical_optimizer.rs:283-516). As a
    * DECLARE initializer it is still evaluated eagerly at DECLARE time
    * (executor.rs:8502-8527).
    */
  case class Subquery(q: QueryExpr) extends Expr
  /** Quantified comparison `x op ALL|ANY|SOME (subquery)`
    * (ast.rs:1326-1334 QuantifiedComparisonExpression). The reference's
    * executor leaves these unimplemented (executor.rs:4508-4517 returns
    * "not yet fully implemented"); we ship full SQL three-valued
    * semantics via a min/max/count aggregate rewrite plus a membership
    * join for =/<> — documented beyond-reference behavior.
    */
  case class QuantifiedCmp(op: String, quantifier: String, l: Expr,
      q: QueryExpr) extends Expr
  /** EXISTS { pattern, … } — pattern-as-predicate (executor.rs:9351-9394);
    * compiled to a semi-join (anti under NOT) at top-level conjuncts, or a
    * marker-join boolean column in arbitrary boolean positions.
    */
  case class ExistsPattern(paths: Seq[PathPattern]) extends Expr
  /** `x IS [NOT] SOURCE OF e` / `DESTINATION OF e` (ast.rs:1598-1611
    * IsPredicateType::Source/Destination — the reference stubs these to
    * false; we implement the real topology test, documented divergence).
    */
  case class IsSrcDst(node: Expr, edge: Expr, dest: Boolean,
      negated: Boolean) extends Expr
  /** `e IS [NOT] DIRECTED` — all edges in this model are directed. */
  case class IsDirected(e: Expr, negated: Boolean) extends Expr
  /** `s IS [NOT] NORMALIZED` — reference semantics (executor.rs:8871-8881):
    * strings are considered normalized; non-strings are not.
    */
  case class IsNormalized(e: Expr, negated: Boolean) extends Expr
  /** `n IS [NOT] :Label` — label membership test (IsPredicateType::Label). */
  case class IsLabeled(e: Expr, label: String, negated: Boolean) extends Expr

  // ---- patterns (ast.rs pattern structures) ----
  sealed trait Direction
  case object Out extends Direction      // -[]->
  case object In extends Direction       // <-[]-
  case object Undirected extends Direction // -[]-

  /** (v:Label {p: lit, ...}) — any part optional. */
  case class NodePattern(variable: Option[String], labels: Seq[String],
      props: Seq[(String, Expr)])
  /** -[v:TYPE {..} ]-> with optional quantifier for var-length paths. */
  case class EdgePattern(variable: Option[String], types: Seq[String],
      props: Seq[(String, Expr)], direction: Direction,
      quantifier: Option[(Int, Int)])
  /** Alternating node-edge-node chain. `assignment` is the optional
    * `p =` path variable (ast.rs:313); `semantics` an optional
    * WALK/TRAIL/SIMPLE/ACYCLIC [PATH] prefix (ast.rs:275-308 PathType).
    */
  case class PathPattern(start: NodePattern, hops: Seq[(EdgePattern, NodePattern)],
      assignment: Option[String] = None, semantics: Option[String] = None)

  // ---- query clauses (ast.rs:183-193 BasicQuery + WithQuery ast.rs:140-180)
  case class ReturnItem(expr: Expr, alias: Option[String])
  /** RETURN * marker (expand_select_items, executor.rs:8446). */
  case class Star() extends Expr
  case class SortItem(expr: Expr, ascending: Boolean)

  /** Linear reading steps between the MATCH section and the projection
    * (ast.rs Query::Let / Query::For / Query::Unwind / Query::Filter) —
    * order-preserving, so LET can feed FOR can feed FILTER.
    */
  sealed trait Step
  /** UNWIND e AS x, and FOR x IN e (ForStatement — same semantics). */
  case class StUnwind(e: Expr, as: String) extends Step
  /** LET x = e, y = e2, … (LetStatement). */
  case class StLet(defs: Seq[(String, Expr)]) extends Step
  /** FILTER [WHERE] e (FilterStatement). */
  case class StFilter(e: Expr) extends Step

  /** One MATCH…[WHERE]… segment followed by WITH or RETURN projection. */
  case class Segment(
      matches: Seq[PathPattern],
      optionalMatches: Seq[PathPattern],
      where: Option[Expr],
      steps: Seq[Step],
      projection: Seq[ReturnItem],
      /** WHERE after WITH — filters the projected columns. */
      postWhere: Option[Expr],
      distinct: Boolean,
      groupBy: Seq[Expr],
      having: Option[Expr],
      orderBy: Seq[SortItem],
      skip: Option[Long],
      limit: Option[Long])

  /** A query expression: WITH-chained segments, or a set operation
    * between two queries (ast.rs:208-228 SetOperation).
    */
  sealed trait QueryExpr
  /** Full query: WITH-chained segments; last one is the RETURN. */
  case class Query(segments: Seq[Segment]) extends QueryExpr
  /** q1 UNION [ALL] | INTERSECT [ALL] | EXCEPT [ALL] q2. */
  case class SetOpQuery(op: String, all: Boolean, left: QueryExpr,
      right: QueryExpr) extends QueryExpr
  /** `( q1 UNION q2 ) ORDER BY … [SKIP n] [LIMIT n]` — tail clauses
    * bound to a parenthesized query group rather than the rightmost
    * branch (the un-parenthesized form keeps the reference parser's
    * bind-to-last-branch reading). Sort keys must name output columns
    * or 1-based positions.
    */
  case class OrderedQuery(inner: QueryExpr, orderBy: Seq[SortItem],
      skip: Option[Long], limit: Option[Long]) extends QueryExpr

  // ---- statements (ast.rs:24-39 Statement enum subset) ----
  sealed trait Statement
  case class QueryStmt(q: QueryExpr) extends Statement
  /** INSERT (:L {p: v}), … — literal node creation (insert.rs analog). */
  /** INSERT of full path patterns: bare nodes and/or inline edges
    * (`INSERT (:A)-[:R {p: v}]->(:B)`, duplicate_edge_warning_test.rs).
    */
  case class InsertStmt(paths: Seq[PathPattern]) extends Statement
  /** MATCH … [WHERE e] INSERT (x)-[:T {props}]->(y) — edge creation from
    * matched bindings (match_insert.rs analog).
    */
  case class MatchInsertStmt(matches: Seq[PathPattern], where: Option[Expr],
      inserts: Seq[PathPattern]) extends Statement
  /** MATCH (v:L) [WHERE e] SET v.p = expr, …  [, v:NewLabel]
    * (match_set.rs analog; `labelAdds` = SetItem::Label items —
    * ast.rs:925-928 — each (variable, label) adds the label to the
    * matched nodes).
    */
  case class MatchSetStmt(pattern: PathPattern, where: Option[Expr],
      assignments: Seq[(Prop, Expr)],
      labelAdds: Seq[(String, String)] = Seq.empty) extends Statement
  /** MATCH … [WHERE e] [DETACH] DELETE v (match_delete.rs analog). */
  case class MatchDeleteStmt(pattern: PathPattern, where: Option[Expr],
      target: String, detach: Boolean) extends Statement
  /** MATCH … [WHERE e] REMOVE v.p, … [, v:Label] (match_remove.rs
    * analog; `labelRemoves` = RemoveItem::Label items, ast.rs:943-948).
    */
  case class MatchRemoveStmt(pattern: PathPattern, where: Option[Expr],
      props: Seq[Prop],
      labelRemoves: Seq[(String, String)] = Seq.empty) extends Statement
  /** CREATE/DROP SCHEMA|GRAPH /schema[/graph] (catalog DDL, ast.rs:625-644);
    * `typed` records a `TYPED <graphType>` binding on CREATE GRAPH.
    */
  case class CatalogStmt(op: String, kind: String, schema: String,
      graph: Option[String], typed: Option[String] = None,
      ifNotExists: Boolean = false, cascade: Boolean = false) extends Statement
  /** CREATE GRAPH TYPE name (NODE TYPE …, EDGE TYPE …) / DROP GRAPH TYPE
    * (schema/parser/graph_type.rs; definition model in graft.graph).
    */
  case class GraphTypeStmt(op: String, name: String,
      definition: Option[graft.graph.GraphType.GraphTypeDef]) extends Statement
  /** SESSION SET GRAPH TYPE name — bind a type to the session graph for
    * INSERT validation (schema/validator.rs enforcement point).
    */
  case class SessionSetGraphType(name: String) extends Statement
  /** One ALTER GRAPH TYPE schema change (schema/types.rs:268-288
    * SchemaChange — the reference parser for these is roadmap dead code;
    * we implement the executable subset).
    */
  sealed trait GraphTypeChange
  case class AddNodeType(nt: graft.graph.GraphType.NodeTypeDef) extends GraphTypeChange
  case class DropNodeType(label: String) extends GraphTypeChange
  case class AddEdgeType(et: graft.graph.GraphType.EdgeTypeDef) extends GraphTypeChange
  case class DropEdgeType(name: String) extends GraphTypeChange
  case class AddProperty(typeName: String,
      prop: graft.graph.GraphType.PropDef) extends GraphTypeChange
  case class DropProperty(typeName: String, propName: String) extends GraphTypeChange
  /** ALTER GRAPH TYPE name change+ (schema evolution; prior versions
    * retained in the catalog history).
    */
  case class AlterGraphTypeStmt(name: String,
      changes: Seq[GraphTypeChange]) extends Statement
  /** DECLARE name TYPE [= value], … — typed session variables
    * (ast.rs:1067-1079 DeclareStatement); referenced as `$name`.
    */
  case class DeclareStmt(
      vars: Seq[(String, String, Option[Expr])]) extends Statement
  /** SESSION SET GRAPH /schema/graph (ast.rs:992-1063). */
  case class SessionSetGraph(path: String) extends Statement
  /** SESSION SET SCHEMA path — PostgreSQL-style current-schema context:
    * relative graph names in DDL / SESSION SET GRAPH resolve against it
    * (SessionSetClause::Schema, ast.rs:1010-1012; relative-path tests
    * ddl_independent_tests.rs:150-176).
    */
  case class SessionSetSchema(path: String) extends Statement
  /** SESSION SET TIME ZONE 'zone' — the session temporal context
    * (SessionSetClause::TimeZone, ast.rs:1015-1017; stored per-session at
    * session/models.rs:277-285). Changes how naive timestamps render and
    * EXTRACT.
    */
  case class SessionSetTimeZone(zone: String) extends Statement
  /** SESSION SET VALUE|GRAPH|BINDING TABLE [IF NOT EXISTS] $p = init —
    * session parameters (SessionSetClause::{Value,Graph,BindingTable}
    * Parameter, ast.rs:1019-1032). `kind` ∈ VALUE | GRAPH | TABLE; the
    * initializer is an expression (VALUE), a catalog path (GRAPH), or a
    * query (TABLE).
    */
  case class SessionSetParam(kind: String, name: String, ifNotExists: Boolean,
      valueInit: Option[Expr] = None, graphInit: Option[String] = None,
      tableInit: Option[QueryExpr] = None) extends Statement
  /** SESSION RESET [SCHEMA | GRAPH | TIME ZONE | [ALL] PARAMETERS |
    * [ALL] CHARACTERISTICS | [PARAMETER] $p] — granular session reset
    * (SessionResetArgs, ast.rs:1043-1050; semantics at
    * session/models.rs:391-421). target ∈ ALL | SCHEMA | GRAPH |
    * TIME_ZONE | PARAMETERS | CHARACTERISTICS | PARAMETER.
    */
  case class SessionReset(target: String,
      param: Option[String] = None) extends Statement
  /** SESSION RESET | SESSION CLOSE (ast.rs:992-1063). */
  case class SessionCtl(op: String) extends Statement
  /** START TRANSACTION | COMMIT | ROLLBACK | SET TRANSACTION
    * (ast.rs:1620-1679) — mapped to session graph snapshots
    * (copy-on-write makes these O(1)). `isolation`/`accessMode` carry
    * the optional TransactionCharacteristics (ISOLATION LEVEL …,
    * READ ONLY|READ WRITE).
    */
  case class TransactionStmt(op: String,
      isolation: Option[String] = None,
      accessMode: Option[String] = None) extends Statement
  /** CREATE/DROP USER|ROLE name; GRANT role TO user
    * (exec/schema_engine/operations/security analog). `ifClause` is
    * CREATE's IF NOT EXISTS / DROP's IF EXISTS (duplicate create and
    * missing drop ERROR without it, security_role_user_tests.rs:26,44).
    */
  case class SecurityStmt(op: String, kind: String, name: String,
      target: Option[String], ifClause: Boolean = false) extends Statement
  /** CREATE PROCEDURE name AS <gql text> | DROP PROCEDURE name
    * (catalog procedures, ast.rs:625-644).
    */
  case class ProcedureStmt(op: String, name: String,
      body: Option[String]) extends Statement
  /** CALL name(arg, …) [YIELD col [AS alias], …] [WHERE expr] — system
    * or stored procedure, with result projection and filtering
    * (ast.rs:90-96 CallStatement; WHERE is the reference's extension).
    */
  case class CallStmt(name: String, args: Seq[Expr],
      yields: Seq[(String, String)] = Seq.empty,
      where: Option[Expr] = None) extends Statement
  /** CREATE [GRAPH] INDEX name ON table (cols) | DROP INDEX name |
    * REINDEX name (ast.rs:1707-1787). The Spark-native index is a
    * clustered layout: the persisted dataset is range-partitioned and
    * sorted on the indexed columns so parquet min/max stats prune
    * row groups/files for predicates on them.
    */
  case class IndexStmt(op: String, name: String, table: String,
      columns: Seq[String]) extends Statement
  /** ALTER INDEX name REBUILD|OPTIMIZE|SET OPTION k = v, and
    * OPTIMIZE INDEX name (ast.rs:1739-1767 AlterIndexStatement /
    * OptimizeIndexStatement). REBUILD/OPTIMIZE rewrite the persisted
    * graph through the clustered layout; SET OPTION stores index
    * metadata.
    */
  case class AlterIndexStmt(name: String, op: String,
      option: Option[(String, String)]) extends Statement
  /** SQL-style `SELECT … FROM [/s/g] MATCH … [WHERE …] [GROUP BY …]
    * [HAVING …] [ORDER BY …] [LIMIT n]` (ast.rs:43-80 SelectStatement) —
    * sugar over a single-segment query, optionally against an explicit
    * catalog graph.
    */
  case class SelectStmt(graphPaths: Seq[String], q: Query) extends Statement
  /** MutationPipeline (ast.rs:140-180, executor.rs:7186): a WITH-chained
    * read pipeline whose final clause mutates — `MATCH … WITH … SET v.p =
    * expr | REMOVE v.p | [DETACH] DELETE v`. The pipeline computes the
    * affected (id, value) set; the mutation applies it to the session
    * graph copy-on-write.
    */
  case class PipelineMutationStmt(q: Query, op: String, target: String,
      assignments: Seq[(Prop, Expr)], props: Seq[Prop],
      detach: Boolean,
      /** SET v:Label / REMOVE v:Label items riding the pipeline (r14 —
        * previously only the simple single-pattern form carried them).
        */
      labelAdds: Seq[(String, String)] = Seq.empty,
      labelRemoves: Seq[(String, String)] = Seq.empty) extends Statement
  /** `MATCH … [WITH …]* [WHERE …] INSERT (v:Label {props}), …` — node
    * creation from the pipeline's binding table, one node per row
    * (match_with_tests.rs:13-170; property values are expressions over
    * the bindings, including WITH-computed aggregates).
    */
  case class PipelineInsertStmt(q: Query,
      inserts: Seq[PathPattern]) extends Statement
  /** `AT /schema/graph <statement>` — execute one statement in another
    * graph's context, then restore (ast.rs AtLocation,
    * executor.rs:8593-8700; body kept as text and re-dispatched).
    */
  case class AtStmt(path: String, body: String) extends Statement

  /** True when the tree contains a non-deterministic function call —
    * result/subquery caches must not replay these for their TTL
    * (reference result_cache.rs caches rows blindly; a frozen NOW() is a
    * bug class we refuse to inherit). TEMPORAL_VALUE defaults tx_time to
    * NOW() when the 4th argument is omitted.
    */
  /** Does the query read graph data anywhere? A query with no pattern
    * ANYWHERE — not in MATCH, and not inside EXISTS / scalar subqueries
    * / quantified comparisons either (a generic deep walk finds every
    * embedded PathPattern) — evaluates without a session graph; a
    * pattern-bearing one demands it ('No graph context',
    * executor.rs:242-274).
    */
  def usesGraph(a: Any): Boolean = a match {
    case _: PathPattern => true
    case s: Seq[_] => s.exists(usesGraph)
    case o: Option[_] => o.exists(usesGraph)
    case p: Product => p.productIterator.exists(usesGraph)
    case _ => false
  }

  def nonDeterministic(a: Any): Boolean = a match {
    case Fn(n, args, _) =>
      val up = n.toUpperCase
      Seq("NOW", "CURRENT_TIMESTAMP", "CURRENT_DATE", "CURRENT_TIME",
        "RAND", "RANDOM", "UUID").contains(up) ||
        (up == "TEMPORAL_VALUE" && args.size < 4) ||
        args.exists(nonDeterministic)
    case s: Seq[_] => s.exists(nonDeterministic)
    case o: Option[_] => o.exists(nonDeterministic)
    case p: Product => p.productIterator.exists(nonDeterministic)
    case _ => false
  }
}
