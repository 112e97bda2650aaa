package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** System procedures — the `CALL gql.*` surface
  * (reference: catalog/system_procedures.rs:60-91). Each returns a
  * DataFrame, mirroring the reference's YIELD-able rowsets.
  */
object SystemProcedures {

  /** Names the session API dispatches on. */
  val names: Seq[String] = Seq(
    "gql.list_schemas", "gql.list_graphs", "gql.list_functions",
    "gql.show_session", "gql.list_users", "gql.list_roles",
    "gql.list_grants", "gql.list_procedures", "gql.list_indexes",
    "gql.list_graph_types", "gql.list_sessions",
    "gql.authenticate_user", "gql.update_user", "gql.cache_stats",
    "gql.clear_cache", "gql.show_parameters",
    "gql.result_cache_stats", "gql.result_cache_clear",
    "gql.find_neighbors", "gql.shortest_path", "gql.is_reachable")

  /** Procedures that read state without mutating anything — calling one
    * must not invalidate the session's result cache nor bump the
    * catalog version (the reference's catalog cache survives reads and
    * is version-invalidated only by DDL, catalog_cache_throughput.rs).
    */
  val ReadOnly: Set[String] = Set(
    "gql.list_schemas", "gql.list_graphs", "gql.list_graph_types",
    "gql.list_functions", "gql.list_procedures", "gql.list_indexes",
    "gql.list_users", "gql.list_roles", "gql.list_grants",
    "gql.list_sessions", "gql.show_session", "gql.show_parameters",
    "gql.cache_stats", "gql.result_cache_stats", "gql.authenticate_user",
    "gql.find_neighbors", "gql.shortest_path", "gql.is_reachable")

  /** The catalog-backed subset whose results depend ONLY on catalog
    * state — cacheable per session keyed on the catalog version
    * (reference per-session catalog cache,
    * catalog/providers/cache.rs analog). Session-volatile reads
    * (show_session, cache_stats, list_sessions) and graph reads
    * (find_neighbors, …) are excluded: they change without any catalog
    * version bump.
    */
  val CatalogCacheable: Set[String] = Set(
    "gql.list_schemas", "gql.list_graphs", "gql.list_graph_types",
    "gql.list_functions", "gql.list_procedures", "gql.list_indexes",
    "gql.list_users", "gql.list_roles", "gql.list_grants")

  def call(gls: GraphLiteSpark, session: GqlSession, name: String,
      args: Seq[String] = Seq.empty): DataFrame = {
    val spark = gls.spark
    import spark.implicits._
    // the id type the GraphIndexScan procedures resolve their textual
    // arguments against: the target edge label's endpoint type (equal to
    // the node tables' id type by the insert-path invariant)
    def edgeIdType(edgeLabel: String): org.apache.spark.sql.types.DataType =
      session.graph.edgeTables.get(edgeLabel).map(_._2.schema("src").dataType)
        .getOrElse(org.apache.spark.sql.types.LongType)
    name match {
      case "gql.list_schemas" =>
        gls.catalog.listSchemas().toDF("schema_name")
      case "gql.list_graphs" =>
        val schemas = if (args.nonEmpty) args else gls.catalog.listSchemas()
        schemas.flatMap(s => gls.catalog.listGraphs(s).map(g => (s, g)))
          .toDF("schema_name", "graph_name")
      case "gql.list_functions" =>
        gqlFunctions.toDF("function_name", "category")
      case "gql.show_session" =>
        Seq((session.user, session.currentGraphName.getOrElse(""))).toDF(
          "user", "current_graph")
      case "gql.list_users" =>
        gls.catalog.listPrincipals("USER").toDF("user_name")
      case "gql.list_roles" =>
        gls.catalog.listPrincipals("ROLE").toDF("role_name")
      case "gql.list_grants" =>
        gls.catalog.listGrants().toDF("role_name", "user_name")
      case "gql.list_procedures" =>
        gls.catalog.listProcedures().toDF("procedure_name")
      case "gql.list_indexes" =>
        gls.catalog.listIndexes().map { case (n, t, cs) =>
          (n, t, cs.mkString(",")) }.toDF("index_name", "table_name", "columns")
      case "gql.list_graph_types" =>
        gls.catalog.listGraphTypes().map { n =>
          val gt = gls.catalog.loadGraphType(n).get
          (n, gt.nodes.size.toLong, gt.edges.size.toLong)
        }.toDF("graph_type_name", "node_types", "edge_types")
      // managed-pool listing (manager.rs:173-185 get_active_session_ids;
      // Instance mode lists this instance's pool, Global mode the shared
      // per-warehouse pool)
      case "gql.list_sessions" =>
        gls.activeSessionIds.flatMap(id => gls.getSession(id).map(s =>
          (id, s.user, s.currentGraphName.getOrElse(""))))
          .toDF("session_id", "user", "current_graph")
      // credential-verified (system_procedures.rs:60-91): args are
      // (user, password); wrong password or unknown user → false. A
      // passwordless user (no IDENTIFIED BY) authenticates only with an
      // empty/absent password.
      case "gql.authenticate_user" =>
        val user = args.headOption.getOrElse(session.user)
        val password = args.lift(1).getOrElse("")
        Seq((user, gls.catalog.verifyPassword(user, password)))
          .toDF("user_name", "authenticated")
      // password rotation (reference update_user with a password param,
      // query_coordinator.rs:478): re-hashes with the current KDF, which
      // is also the legacy-credential migration path
      case "gql.update_user" =>
        val user = args.headOption.getOrElse(
          throw new IllegalArgumentException("gql.update_user needs (user, password)"))
        val password = args.lift(1).getOrElse("")
        // admin-gated like the reference coordinator: a registered user
        // may rotate only their own password unless they hold role admin
        // (see GraphCatalog.mayManageUsers for the embedding-trust rule)
        if (!gls.catalog.mayManageUsers(session.user, user,
            session.registeredAtOpen))
          throw new GqlAuthException(
            s"user '${session.user}' may not rotate credentials for '$user'")
        Seq((user, gls.catalog.setPassword(user, password)))
          .toDF("user_name", "updated")
      case "gql.cache_stats" =>
        val rdds = gls.spark.sparkContext.getPersistentRDDs
        Seq((rdds.size.toLong,
            rdds.values.map(_.partitions.length.toLong).sum))
          .toDF("cached_datasets", "cached_partitions")
      case "gql.show_parameters" =>
        session.parameters.toSeq.sortBy(_._1).map { case (k, v) =>
          (k, Option(v).map(_.toString).orNull) }.toDF("parameter", "value")
      // result/subquery cache introspection (cache_manager.rs stats
      // surface): one row per cache with hit/miss/eviction counters
      case "gql.result_cache_stats" =>
        val (h, m, ev, inv, n, big) = session.resultCacheStats
        val (sh, sm, sev, sn) = session.subqueryCacheStats
        Seq(
          ("result", session.resultCacheEnabled, h, m, ev, inv, n, big),
          ("subquery", session.resultCacheEnabled, sh, sm, sev, 0L, sn, 0L))
          .toDF("cache", "enabled", "hits", "misses", "evictions",
            "invalidations", "entries", "oversize_skips")
      case "gql.result_cache_clear" =>
        session.clearResultCache()
        Seq(true).toDF("cleared")
      case "gql.clear_cache" =>
        gls.spark.catalog.clearCache()
        gls.spark.sparkContext.getPersistentRDDs.values.foreach(
          _.unpersist(blocking = false))
        Seq(true).toDF("cleared")
      // GraphIndexScan operations as a CALL surface (plan/operators/
      // physical.rs:42-67: FindNeighbors / ShortestPath / IsReachable) —
      // all ride PropertyGraph.bfs (per-node frontier state; composes
      // with CALL … YIELD … WHERE)
      // id arguments are TYPE-AGNOSTIC (reference parity: node ids are
      // strings everywhere, storage/types.rs:68-72, and GraphIndexScan
      // ops don't parse them — physical.rs:42-67): each textual arg casts
      // to the graph's actual endpoint id type, so '42' resolves on a
      // Long-id graph and 'u1' on a string-id graph — never a .toLong
      // that throws on the latter
      case "gql.find_neighbors" =>
        session.requirePerm("SELECT")
        val Seq(edgeLabel, startId, maxHops) = fixedArgs(name, args, 3)
        import org.apache.spark.sql.functions.{col, lit}
        val idT = edgeIdType(edgeLabel)
        session.graph.bfs(
            spark.range(1).select(lit(startId).cast(idT).as("root_id")),
            edgeLabel, maxHops.toInt)
          .filter(col("dist") > 0)
          .select(col("node_id").as("neighbor_id"), col("dist"))
          .orderBy("dist", "neighbor_id")
      case "gql.shortest_path" =>
        session.requirePerm("SELECT")
        val Seq(edgeLabel, srcId, dstId, maxLen) = fixedArgs(name, args, 4)
        import org.apache.spark.sql.functions.{col, lit}
        val idT = edgeIdType(edgeLabel)
        session.graph.bfs(
            spark.range(1).select(lit(srcId).cast(idT).as("root_id")),
            edgeLabel, maxLen.toInt)
          .filter(col("node_id") === lit(dstId).cast(idT))
          .select(lit(srcId).cast(idT).as("src"),
            lit(dstId).cast(idT).as("dst"), col("dist"))
      case "gql.is_reachable" =>
        session.requirePerm("SELECT")
        val Seq(edgeLabel, srcId, dstId, maxHops) = fixedArgs(name, args, 4)
        import org.apache.spark.sql.functions.{col, lit}
        val idT = edgeIdType(edgeLabel)
        val hit = !session.graph.bfs(
            spark.range(1).select(lit(srcId).cast(idT).as("root_id")),
            edgeLabel, maxHops.toInt)
          .filter(col("node_id") === lit(dstId).cast(idT)).isEmpty
        spark.range(1).select(lit(srcId).cast(idT).as("src"),
          lit(dstId).cast(idT).as("dst"), lit(hit).as("reachable"))
      case other =>
        // reference error contract (system_procedures.rs:93, pinned by
        // unknown_procedure_test.rs): say "procedure not found", list the
        // available system procedures so the user can self-correct, and
        // never blame a missing graph context
        throw new IllegalArgumentException(
          s"System procedure not found or not supported: $other. " +
            s"Available system procedures: ${names.mkString(", ")}")
    }
  }

  private def fixedArgs(name: String, args: Seq[String], n: Int): Seq[String] = {
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.length}")
    args
  }

  /** Function registry listing (mirrors functions/mod.rs:39-256). */
  val gqlFunctions: Seq[(String, String)] = Seq(
    "COUNT" -> "aggregate", "SUM" -> "aggregate", "AVG" -> "aggregate",
    "MIN" -> "aggregate", "MAX" -> "aggregate", "COLLECT" -> "aggregate",
    "UPPER" -> "string", "LOWER" -> "string", "TRIM" -> "string",
    "SUBSTRING" -> "string", "REPLACE" -> "string", "REVERSE" -> "string",
    "ABS" -> "math", "CEIL" -> "math", "FLOOR" -> "math", "SQRT" -> "math",
    "POWER" -> "math", "LOG" -> "math", "LOG10" -> "math", "EXP" -> "math",
    "SIN" -> "math", "COS" -> "math", "TAN" -> "math", "PI" -> "math",
    "SIGN" -> "math", "MOD" -> "math", "ROUND" -> "math",
    "NULLIF" -> "null", "COALESCE" -> "null",
    "LIST_CONTAINS" -> "list", "LIST_LENGTH" -> "list", "LIST_APPEND" -> "list",
    "LIST_PREPEND" -> "list", "LIST_REVERSE" -> "list", "LIST_SLICE" -> "list",
    "SIZE" -> "list",
    "DATETIME" -> "temporal", "NOW" -> "temporal", "CURRENT_DATE" -> "temporal",
    "DATE_ADD" -> "temporal", "DATE_SUB" -> "temporal",
    "YEAR" -> "temporal", "MONTH" -> "temporal", "DAY" -> "temporal",
    "AT_TIME_ZONE" -> "timezone", "TIMEZONE" -> "timezone",
    "CONVERT_TZ" -> "timezone", "GET_TIMEZONE_OFFSET" -> "timezone",
    "EXTRACT_TIMEZONE" -> "timezone", "GET_TIMEZONE_NAME" -> "timezone",
    "GET_TIMEZONE_ABBREVIATION" -> "timezone",
    "ID" -> "graph", "LABELS" -> "graph", "TYPE" -> "graph", "KEYS" -> "graph",
    "TEMPORAL_VALUE" -> "bitemporal", "VALID_AT" -> "bitemporal",
    "TEMPORAL_CURRENT" -> "bitemporal")
}
