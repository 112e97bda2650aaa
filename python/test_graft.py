"""pytest for the PySpark wrapper (r17 verdict #4, sdk-python parity):
drives gql01's shape plus DML through python/graft.py and asserts the
rows the Scala engine produces for the same statements (pinned by
StatementSpec / GqlSpec on the JVM side).

Run from the repo root after `sbt compile`:

    python3 -m pytest python/test_graft.py -q
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = os.path.join(REPO, "target", "scala-2.13", "classes")


@pytest.fixture(scope="module")
def spark():
    s = (SparkSession.builder
         .master("local[4]")
         .appName("graft-pysdk-test")
         .config("spark.driver.extraClassPath", CLASSES)
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    yield s
    s.stop()


@pytest.fixture(scope="module")
def session(spark):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from graft import GraphLite

    wh = tempfile.mkdtemp(prefix="graft-pysdk")
    gls = GraphLite.open(spark, wh)
    s = gls.session("py")
    s.execute("CREATE GRAPH IF NOT EXISTS /py/g")
    s.use_graph("/py/g")
    yield s
    shutil.rmtree(wh, ignore_errors=True)


def test_insert_and_gql_aggregate(session):
    session.execute(
        "INSERT (:Account {id: 1, name: 'alice', balance: 100.0, seg: 'A'}), "
        "(:Account {id: 2, name: 'bob', balance: 50.0, seg: 'B'}), "
        "(:Account {id: 3, name: 'carol', balance: 150.0, seg: 'A'}), "
        "(:Account {id: 4, name: 'dave', balance: 75.0, seg: 'B'})")
    # gql01's shape: filter + group + aggregate + order
    rows = session.gql(
        "MATCH (a:Account) WHERE a.balance > 60 "
        "RETURN a.seg AS seg, count(a) AS n, max(a.balance) AS hi "
        "ORDER BY seg").collect()
    assert [(r.seg, r.n, r.hi) for r in rows] == [("A", 2, 150.0), ("B", 1, 75.0)]


def test_dml_set_visible_to_next_query(session):
    session.execute("MATCH (a:Account {id: 2}) SET a.balance = 500.0")
    rows = session.gql(
        "MATCH (a:Account) WHERE a.balance >= 150 "
        "RETURN a.name AS name ORDER BY name").collect()
    assert [r.name for r in rows] == ["bob", "carol"]


def test_edges_and_parameters(session):
    session.execute(
        "MATCH (a:Account {id: 1}), (b:Account {id: 3}) "
        "INSERT (a)-[:OWES {amount: 25.0}]->(b)")
    session.set_parameter("minamt", 10.0)
    rows = session.gql(
        "MATCH (a:Account)-[o:OWES]->(b:Account) WHERE o.amount > $minamt "
        "RETURN a.name AS src, b.name AS dst, o.amount AS amt").collect()
    assert [(r.src, r.dst, r.amt) for r in rows] == [("alice", "carol", 25.0)]


def test_explain_is_plan_only(session):
    trace = session.explain("MATCH (a:Account) RETURN count(a) AS n")
    assert "Physical plan" in trace and "AST" in trace


def test_result_is_real_pyspark_dataframe(session):
    df = session.gql("MATCH (a:Account) RETURN a.id AS id")
    # lazy plan: PySpark transformations compose on the engine's output
    assert df.filter(df.id > 2).count() == 2


def test_save_and_reload(session, spark):
    session.save_graph_as("/py/g2", force=True)
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from graft import GraphLite
    s2 = GraphLite.open(spark, session._j.gls().warehouse()).session("py")
    s2.use_graph("/py/g2")
    assert s2.gql("MATCH (a:Account) RETURN count(a) AS n").collect()[0].n == 4
