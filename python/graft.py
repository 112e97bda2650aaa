"""Thin PySpark wrapper over the graft GQL engine.

The reference ships a Python SDK (sdk-python/src/graphlite_sdk/__init__.py
over an FFI into the native engine); graft's engine is a JVM library, so
the Python surface is a py4j bridge: every call delegates to the Scala
``graft.GraphLiteSpark`` / ``GqlSession`` objects through the active
SparkSession's JVM gateway, and query results come back as ordinary
PySpark DataFrames (zero copies — the Python side only holds the plan).

Usage::

    from pyspark.sql import SparkSession
    from graft import GraphLite

    spark = (SparkSession.builder
             .config("spark.driver.extraClassPath", "<repo>/target/scala-2.13/classes")
             .getOrCreate())
    gls = GraphLite.open(spark, "/tmp/my-warehouse")
    s = gls.session("alice")
    s.execute("CREATE GRAPH IF NOT EXISTS /demo/g")
    s.use_graph("/demo/g")
    s.execute("INSERT (:Account {id: 1, name: 'a', balance: 100.0})")
    s.gql("MATCH (a:Account) RETURN a.name AS name").show()

The JVM classes must be on the driver classpath (the repo's compiled
classes or its assembly jar); the pyspark version must match the Spark
the classes were built against.
"""

from pyspark.sql import DataFrame, SparkSession


class GqlSession:
    """Python face of ``graft.GqlSession``: GQL queries, statements
    (DML/DDL/session/transactions), EXPLAIN, parameters, and saves.
    """

    def __init__(self, jsession, spark: SparkSession):
        self._j = jsession
        self._spark = spark

    def gql(self, query: str) -> DataFrame:
        """Run a GQL query; returns a (lazy) PySpark DataFrame."""
        return DataFrame(self._j.gql(query), self._spark)

    def execute(self, statement: str) -> DataFrame:
        """Run any GQL statement (query, DML, DDL, SESSION, CALL,
        transaction control, NEXT chains); returns its result frame.
        """
        return DataFrame(self._j.execute(statement), self._spark)

    def explain(self, query: str) -> str:
        """Per-phase compilation trace (AST, logical, optimized,
        physical) — plan-only, never launches a Spark job.
        """
        return self._j.explain(query)

    def use_graph(self, path: str) -> "GqlSession":
        """Attach a persisted graph (``/schema/name``) as the session
        graph."""
        self._j.useGraph(path)
        return self

    def set_parameter(self, name: str, value) -> "GqlSession":
        """Bind a ``$name`` parameter (int/float/str/bool round-trip via
        py4j)."""
        self._j.setParameter(name, value)
        return self

    def save_graph_as(self, path: str, force: bool = False) -> None:
        """Persist the session graph to ``/schema/name`` (incremental
        when saving back to its origin)."""
        self._j.saveGraphAs(path, force)

    @property
    def current_graph_name(self):
        opt = self._j.currentGraphName()
        return opt.get() if opt.isDefined() else None


class GraphLite:
    """Python face of ``graft.GraphLiteSpark`` (one warehouse handle)."""

    def __init__(self, jgls, spark: SparkSession):
        self._j = jgls
        self._spark = spark

    @staticmethod
    def open(spark: SparkSession, warehouse: str) -> "GraphLite":
        jgls = spark._jvm.graft.GraphLiteSpark.open(
            spark._jsparkSession, warehouse)
        return GraphLite(jgls, spark)

    def session(self, user: str = "default") -> GqlSession:
        return GqlSession(self._j.session(user), self._spark)

    @property
    def warehouse(self) -> str:
        return self._j.warehouse()
