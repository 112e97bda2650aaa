package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Connected components: the driver-facing oracle is g13; this spec pins
  * the two execution paths against each other — the small-edge-set local
  * union-find finish and the distributed pointer-jumping loop (forced via
  * localEdgeLimit = 0) must agree exactly, including isolated vertices
  * and the label-is-minimum-id contract.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Chain components of varying length plus isolated vertices: ids
    * 0..99 in chains of 10 (components 0,10,…,90), ids 100..109 isolated.
    */
  private def chainGraph: PropertyGraph = {
    import spark.implicits._
    val nodes = (0L until 110L).toDF("id")
    val edges = (0L until 100L).filter(i => i % 10 != 9)
      .map(i => (i, i + 1)).toDF("src", "dst")
    new PropertyGraph(
      Map("n" -> nodes),
      Map("E" -> (EdgeType("E", "n", "n"), edges)))
  }

  private def expected: Map[Long, Long] =
    ((0L until 100L).map(i => i -> (i / 10) * 10) ++
      (100L until 110L).map(i => i -> i)).toMap

  test("local union-find path matches the chain model") {
    val got = Analytics.connectedComponents(spark, chainGraph, "n", "E")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("distributed pointer-jumping path agrees with the local path") {
    val got = Analytics.connectedComponents(spark, chainGraph, "n", "E",
      localEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("bfs local adjacency path agrees with the distributed loop") {
    import spark.implicits._
    val g = chainGraph
    val sources = Seq(0L, 30L, 105L).toDF("root_id")
    def rows(limit: Long) =
      g.bfs(sources, "E", maxIter = 4, localEdgeLimit = limit)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val local = rows(2000000L)
    val dist = rows(0L)
    assert(local == dist)
    // chain 0→1→…→9 truncated at depth 4; isolated root sees only itself
    assert(local.filter(_._1 == 0L) ==
      (0L to 4L).map(i => (0L, i, i)).toSet)
    assert(local.filter(_._1 == 105L) == Set((105L, 105L, 0L)))
  }

  test("bfs paths agree on duplicate-root inputs (one BFS per distinct root)") {
    import spark.implicits._
    val g = chainGraph
    // round-7 advice: the local path deduped duplicate root_ids while the
    // distributed loop emitted one row-set per duplicate — compare as
    // multisets so a multiplicity disagreement cannot hide
    val sources = Seq(0L, 0L, 30L, 30L, 30L).toDF("root_id")
    def rows(limit: Long) =
      g.bfs(sources, "E", maxIter = 3, localEdgeLimit = limit)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
    val local = rows(2000000L)
    val dist = rows(0L)
    assert(local == dist)
    assert(local.map(_._1).distinct.sorted == Seq(0L, 30L))
    // exactly one row-set per distinct root: (depth 0..3) x 2 roots
    assert(local.size == 8)
  }
}
