package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** WALK/TRAIL/ACYCLIC/SIMPLE revisit rules — reference semantics at
  * ast.rs:275-308 with the quantifier cap at executor.rs:6505-6510.
  * Graph: 1→2, 2→3, 3→1 (cycle) plus 1→3 (shortcut).
  */
class PathSemanticsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private lazy val g: PropertyGraph = {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 1L, 3L), (1L, 3L, 4L))
      .toDF("src", "dst", "eid")
    new PropertyGraph(Map("N" -> nodes),
      Map("E" -> (EdgeType("E", "N", "N"), edges)))
  }

  private def pathsFrom(sem: PathSemantics, maxHops: Int): Seq[(Long, Int)] = {
    import spark.implicits._
    val start = Seq(1L).toDF("start_id")
    g.paths(start, "E", 1, maxHops, sem)
      .select("end_id", "depth").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
  }

  test("WALK allows node and edge revisits") {
    // depth 3 from 1: 1→2→3→1 and 1→3→1→2, 1→3→1→3 … includes returning to 1
    val p = pathsFrom(PathSemantics.Walk, 3)
    assert(p.contains((1L, 3)))  // cycle closes and may continue
    assert(p.count(_._2 == 3) == 3) // 1-2-3-1, 1-3-1-2, 1-3-1-3
  }

  test("ACYCLIC never revisits a node") {
    val p = pathsFrom(PathSemantics.Acyclic, 4)
    // from 1: 1→2, 1→3, 1→2→3 only (no path may return to 1)
    assert(p == Seq((2L, 1), (3L, 1), (3L, 2)))
  }

  test("SIMPLE forbids any node revisit, start included (executor.rs:6632-6635)") {
    val p = pathsFrom(PathSemantics.Simple, 3)
    // the reference's SimplePath checks !path.contains(next) with the start
    // in `path`, so closed cycles 1→2→3→1 / 1→3→1 are rejected too —
    // identical result set to ACYCLIC on this graph
    assert(p == Seq((2L, 1), (3L, 1), (3L, 2)))
    assert(!p.exists(_._1 == 1L)) // no path returns to start
  }

  test("TRAIL never reuses an edge but may revisit nodes") {
    val p = pathsFrom(PathSemantics.Trail, 4)
    // 1→3(e4)→1(e3)→2(e1)→3(e2): node 3 revisited, all edges distinct
    assert(p.contains((3L, 4)))
  }

  test("quantifier caps at 10 hops (reference parity)") {
    import spark.implicits._
    val start = Seq(1L).toDF("start_id")
    val p = g.paths(start, "E", 1, 99, PathSemantics.Walk)
    assert(p.agg(org.apache.spark.sql.functions.max("depth")).collect()
      .head.getInt(0) == 10)
  }
}
