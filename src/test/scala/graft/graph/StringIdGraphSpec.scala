package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** String node ids end-to-end (reference parity: ids are Strings in
  * storage/types.rs:68-72 and GraphIndexScan ops are id-type-agnostic,
  * plan/operators/physical.rs:42-67). Round 13 made string ids idiomatic
  * at the INSERT surface; this spec pins the analytics/procedure surface
  * on top of them: BFS-backed CALL procedures, PageRank / connected
  * components / triangles / shortest-path-lengths via surrogate Long
  * keys, and the id-type coherence invariants (edge endpoint widening,
  * mixed-id INSERT batches).
  */
class StringIdGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Chain u0→u1→…→u9 plus isolated x0, x1 — string ids throughout. */
  private def chainGraph: PropertyGraph = {
    import spark.implicits._
    val nodes = ((0 until 10).map(i => s"u$i") ++ Seq("x0", "x1")).toDF("id")
    val edges = (0 until 9).map(i => (s"u$i", s"u${i + 1}")).toDF("src", "dst")
    new PropertyGraph(
      Map("n" -> nodes),
      Map("E" -> (EdgeType("E", "n", "n"), edges)))
  }

  /** The same topology on Long ids (i ↔ s"u$i", 100/101 ↔ x0/x1). */
  private def longChainGraph: PropertyGraph = {
    import spark.implicits._
    val nodes = ((0L until 10L) ++ Seq(100L, 101L)).toDF("id")
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    new PropertyGraph(
      Map("n" -> nodes),
      Map("E" -> (EdgeType("E", "n", "n"), edges)))
  }

  test("bfs: string roots traverse a string-id graph on both paths") {
    import spark.implicits._
    val g = chainGraph
    val sources = Seq("u0", "u7", "x0").toDF("root_id")
    def rows(limit: Long) =
      g.bfs(sources, "E", 3, localEdgeLimit = limit)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
    val expected = (
      Seq(("u0", "u0", 0L), ("u0", "u1", 1L), ("u0", "u2", 2L), ("u0", "u3", 3L)) ++
      Seq(("u7", "u7", 0L), ("u7", "u8", 1L), ("u7", "u9", 2L)) ++
      Seq(("x0", "x0", 0L))).toSet
    assert(rows(2000000L) == expected) // local adjacency path
    assert(rows(0L) == expected)       // distributed frontier path
  }

  test("connected components: string labels are the lexicographic min") {
    val g = chainGraph
    val expected = ((0 until 10).map(i => s"u$i" -> "u0") ++
      Seq("x0" -> "x0", "x1" -> "x1")).toMap
    def got(limit: Long) =
      Analytics.connectedComponents(spark, g, "n", "E", localEdgeLimit = limit)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got(2000000L) == expected) // local union-find
    assert(got(0L) == expected)       // distributed pointer jumping
  }

  test("pageRank on string ids matches the same topology on Long ids") {
    val sRanks = Analytics.pageRank(spark, chainGraph, "n", "E", 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val lRanks = Analytics.pageRank(spark, longChainGraph, "n", "E", 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sRanks.size == 12)
    (0 until 10).foreach { i =>
      assert(sRanks(s"u$i") == lRanks(i.toLong), s"rank mismatch at u$i")
    }
    assert(sRanks("x0") == lRanks(100L))
  }

  test("triangleCount and shortestPathLengths re-key to string ids") {
    import spark.implicits._
    // triangle a-b-c (undirected via canonicalization) plus a pendant d
    val nodes = Seq("a", "b", "c", "d").toDF("id")
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst")
    val g = new PropertyGraph(Map("n" -> nodes),
      Map("E" -> (EdgeType("E", "n", "n"), edges)))
    val tri = Analytics.triangleCount(spark, g, "n", "E")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tri == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 0L))
    val sp = Analytics
      .shortestPathLengths(spark, chainGraph, "n", "E", Seq("u0"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // ShortestPaths runs along OUT edges toward landmarks: nodes that can
    // reach u0 — only u0 itself on a forward chain
    assert(sp.toSet == Set(("u0", "u0", 0L)))
    val sp9 = Analytics
      .shortestPathLengths(spark, chainGraph, "n", "E", Seq("u9"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    (0 until 10).foreach { i => assert(sp9(s"u$i") == (9L - i)) }
  }

  test("paths and bfs directions are id-type-agnostic") {
    import spark.implicits._
    // paths() needs edge identities (eid) for TRAIL bookkeeping
    val nodes = ((0 until 10).map(i => s"u$i") ++ Seq("x0", "x1")).toDF("id")
    val edges = (0 until 9).map(i => (s"u$i", s"u${i + 1}", i.toLong))
      .toDF("src", "dst", "eid")
    val g = new PropertyGraph(Map("n" -> nodes),
      Map("E" -> (EdgeType("E", "n", "n"), edges)))
    // var-length path enumeration: path arrays carry the string ids
    val p = g.paths(Seq("u0").toDF("start_id"), "E", 1, 3)
      .orderBy(col("depth"), col("end_id")).collect()
    assert(p.map(r => (r.getString(1), r.getInt(2))).toSeq ==
      Seq(("u1", 1), ("u2", 2), ("u3", 3)))
    assert(p.last.getSeq[String](3) == Seq("u0", "u1", "u2", "u3"))
    // reverse BFS reaches u0 from u3 over In direction
    val in = g.bfs(Seq("u3").toDF("root_id"), "E", 5,
        direction = Direction.In)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(in("u0") == 3L)
  }

  test("surrogate keying preserves identities past Double's 2^53 range") {
    import spark.implicits._
    // two ids whose Long values collide when compared as Doubles — the
    // exact failure PromoteStrings coercion would introduce
    val a = (1L << 60) + 1L
    val b = (1L << 60) + 2L
    val nodes = Seq(a.toString, b.toString, "z").toDF("id")
    val edges = Seq((a.toString, "z")).toDF("src", "dst")
    val g = new PropertyGraph(Map("n" -> nodes),
      Map("E" -> (EdgeType("E", "n", "n"), edges)))
    val comp = Analytics.connectedComponents(spark, g, "n", "E")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comp(b.toString) == b.toString) // b is NOT merged with a
    assert(comp(a.toString) == comp("z"))
  }
}
