package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.gql.{Compiler, Parser}
import graft.graph.{GraphCatalog, PropertyGraph}

/** Public entry point — the Spark-native analog of the reference's
  * embedded API (sdk-rust/src/connection.rs: `GraphLite::open(path)` →
  * `session(user)` → `session.query(gql)`).
  *
  * `open` binds a SparkSession to a warehouse directory; sessions carry
  * the current-graph state (PostgreSQL-style precedence: explicit graph >
  * session current graph — query_coordinator.rs:242-274) and compile GQL
  * text straight to DataFrames.
  */
final class GraphLiteSpark(val spark: SparkSession, val warehouse: String) {
  val catalog = new GraphCatalog(spark, warehouse)
  def session(user: String = "default"): GqlSession = new GqlSession(this, user)
}

object GraphLiteSpark {
  def open(spark: SparkSession, warehouse: String): GraphLiteSpark =
    new GraphLiteSpark(spark, warehouse)
}

/** A user session: current graph + GQL execution (session/manager.rs
  * analog; session state here is just the current graph + parameters).
  */
final class GqlSession(gls: GraphLiteSpark, val user: String) {
  private var currentGraph: Option[PropertyGraph] = None
  private var currentName: Option[String] = None

  def currentGraphName: Option[String] = currentName

  /** CALL gql.* — system procedures (system_procedures.rs:60-91). */
  def call(procedure: String, args: Seq[String] = Seq.empty):
      org.apache.spark.sql.DataFrame =
    SystemProcedures.call(gls, this, procedure, args)

  /** SESSION SET GRAPH — by catalog path "/schema/graph". */
  def useGraph(path: String): this.type = {
    val parts = path.stripPrefix("/").split("/")
    require(parts.length == 2, s"graph path must be /schema/graph, got $path")
    currentGraph = Some(gls.catalog.loadGraph(parts(0), parts(1)))
    currentName = Some(path)
    this
  }

  /** Attach an in-memory graph as the session graph. */
  def useGraph(g: PropertyGraph): this.type = {
    currentGraph = Some(g)
    currentName = None
    this
  }

  def graph: PropertyGraph = currentGraph.getOrElse(
    throw new IllegalStateException(
      "no current graph — call useGraph(...) first (reference: " +
        "'No graph context' error, executor.rs:242-274)"))

  /** Compile + return a GQL query as a DataFrame (lazy; actions execute
    * distributed).
    */
  def gql(query: String): DataFrame =
    new Compiler(graph).compile(Parser.parse(query))

  /** EXPLAIN surface (reference: plan/trace.rs phases,
    * query_coordinator.rs:783): returns the parsed AST plus Catalyst's
    * formatted physical plan for a GQL query.
    */
  def explain(query: String): String = {
    val ast = Parser.parse(query)
    val df = new Compiler(graph).compile(ast)
    s"=== AST ===\n$ast\n\n=== Physical plan ===\n" +
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
  }
}
