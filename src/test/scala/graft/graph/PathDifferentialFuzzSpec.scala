package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import scala.math.Ordering.Implicits.seqOrdering

/** Differential fuzz for variable-length path traversal and BFS:
  * random small multigraphs (parallel edges + self-loops allowed) run
  * through [[PropertyGraph.paths]] / [[PropertyGraph.bfs]] and through a
  * ~20-line model DFS/BFS; the full result multisets must agree for every
  * (semantics, direction, minHops) combination. PathSemanticsSpec pins
  * the reference's revisit rules (ast.rs:275-308, executor.rs:6623-6641)
  * on one hand-picked graph; this spec checks the same rules hold on
  * graphs nobody hand-picked — cycles through parallel edges, self-loops
  * under ACYCLIC, TRAIL reusing a Both-direction edge's eid, etc.
  */
class PathDifferentialFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private case class Arc(src: Long, dst: Long, eid: Long)

  /** Model: depth-first path enumeration under the reference's revisit
    * rules. Returns one (start, end, depth, nodePath, edgePath) per path
    * with depth in [minHops, maxHops].
    */
  private def modelPaths(arcs: Seq[Arc], starts: Seq[Long], minHops: Int,
      maxHops: Int, sem: PathSemantics): Seq[(Long, Long, Int, Seq[Long], Seq[Long])] = {
    val out = arcs.groupBy(_.src)
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Int, Seq[Long], Seq[Long])]
    def walk(start: Long, nodePath: Vector[Long], edgePath: Vector[Long]): Unit = {
      val depth = edgePath.size
      if (depth >= minHops) acc += ((start, nodePath.last, depth, nodePath, edgePath))
      if (depth < maxHops) out.getOrElse(nodePath.last, Nil).foreach { a =>
        val legal = sem match {
          case PathSemantics.Walk => true
          case PathSemantics.Trail => !edgePath.contains(a.eid)
          case PathSemantics.Acyclic | PathSemantics.Simple =>
            !nodePath.contains(a.dst)
        }
        if (legal) walk(start, nodePath :+ a.dst, edgePath :+ a.eid)
      }
    }
    starts.foreach(s => walk(s, Vector(s), Vector.empty))
    acc.toSeq
  }

  /** Model BFS distances from each root (≤ maxIter hops). */
  private def modelBfs(arcs: Seq[Arc], roots: Seq[Long],
      maxIter: Int): Seq[(Long, Long, Int)] = {
    val out = arcs.groupBy(_.src)
    roots.flatMap { r =>
      val dist = scala.collection.mutable.Map(r -> 0)
      var frontier = Set(r)
      (1 to maxIter).foreach { d =>
        frontier = frontier.flatMap(n => out.getOrElse(n, Nil).map(_.dst))
          .filterNot(dist.contains)
        frontier.foreach(n => dist(n) = d)
      }
      dist.toSeq.map { case (n, d) => (r, n, d) }
    }
  }

  private def oriented(edges: Seq[Arc], dir: Direction): Seq[Arc] = dir match {
    case Direction.Out  => edges
    case Direction.In   => edges.map(a => Arc(a.dst, a.src, a.eid))
    case Direction.Both => edges ++ edges.map(a => Arc(a.dst, a.src, a.eid))
  }

  private val rnd = new scala.util.Random(
    sys.env.getOrElse("GRAFT_PATH_FUZZ_SEED", "20260815").toLong)
  private val nodeIds = (1L to 5L).toSeq

  (1 to 3).foreach { gi =>
    val edges = (0 until (8 + rnd.nextInt(5))).map { i =>
      Arc(nodeIds(rnd.nextInt(5)), nodeIds(rnd.nextInt(5)), i.toLong)
    }
    lazy val g: PropertyGraph = {
      import spark.implicits._
      new PropertyGraph(
        Map("N" -> nodeIds.toDF("id")),
        Map("E" -> (EdgeType("E", "N", "N"),
          edges.map(a => (a.src, a.dst, a.eid)).toDF("src", "dst", "eid"))))
    }

    for {
      sem <- Seq(PathSemantics.Walk, PathSemantics.Trail,
        PathSemantics.Acyclic, PathSemantics.Simple)
      dir <- Seq(Direction.Out, Direction.In, Direction.Both)
    } test(s"graph $gi [${edges.size} edges]: paths $sem $dir match the model") {
      import spark.implicits._
      val minHops = rnd.nextInt(2)
      val got = g.paths(nodeIds.toDF("start_id"), "E", minHops, 3, sem, dir,
          keepEdges = true)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getSeq[Long](3), r.getSeq[Long](4)))
        .toSeq
      val want = modelPaths(oriented(edges, dir), nodeIds, minHops, 3, sem)
      assert(got.sorted == want.sorted,
        s"minHops=$minHops edges=$edges\nonly engine: ${(got.diff(want)).take(5)}\n" +
          s"only model: ${(want.diff(got)).take(5)}")
    }

    Seq(Direction.Out, Direction.Both).foreach { dir =>
      test(s"graph $gi: bfs $dir matches the model on both code paths") {
        import spark.implicits._
        val want = modelBfs(oriented(edges, dir), nodeIds, 4).sorted
        // default gate takes the ≤2M-edge driver fast path; localEdgeLimit=0
        // forces the distributed frontier loop — both must agree with the model
        Seq(2000000L, 0L).foreach { limit =>
          val got = g.bfs(nodeIds.toDF("root_id"), "E", 4, dir, limit)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt))
            .toSeq.sorted
          assert(got == want, s"localEdgeLimit=$limit edges=$edges")
        }
      }
    }
  }
}
