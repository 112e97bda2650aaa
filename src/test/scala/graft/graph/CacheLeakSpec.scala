package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Session-lifetime cache discipline for the analytics surface.
  *
  * Non-Long-id graphs key GraphX through a cached surrogate idMap
  * (Analytics.graphxRdds); before round 15 that frame was cached on
  * every pageRank/triangleCount/shortestPaths call and never
  * unpersisted, so a long-lived session accumulated one CacheManager
  * entry per analytics call. This pins the fix the same way the DML
  * plan-height fuzz pinned statement-loop growth: run a long sequence
  * of analytics calls and assert the SQL cache stays empty.
  */
class CacheLeakSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def stringGraph: PropertyGraph = {
    import spark.implicits._
    val nodes = ((0 until 10).map(i => s"u$i") ++ Seq("x0", "x1")).toDF("id")
    val edges = ((0 until 9).map(i => (s"u$i", s"u${i + 1}")) ++
      Seq(("u0", "u2"), ("u1", "u3"))).toDF("src", "dst")
    new PropertyGraph(
      Map("n" -> nodes),
      Map("E" -> (EdgeType("E", "n", "n"), edges)))
  }

  test("100 analytics calls on a string-id graph leave the SQL cache flat") {
    // suites share one forked JVM and run sequentially; earlier suites
    // may leave legitimately cached frames behind — this spec owns the
    // cache-flatness claim only for ITS calls, so start from empty
    spark.catalog.clearCache()
    val g = stringGraph
    // the surrogate idMap is the only frame these paths cache; a leak
    // shows up as one lingering CacheManager entry per call
    (1 to 40).foreach { _ =>
      Analytics.pageRank(spark, g, "n", "E", iterations = 2).collect()
    }
    (1 to 30).foreach { _ =>
      Analytics.triangleCount(spark, g, "n", "E").collect()
    }
    (1 to 30).foreach { _ =>
      Analytics.shortestPathLengths(spark, g, "n", "E", Seq("u0")).collect()
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "analytics calls must unpersist their surrogate idMap frames")
  }
}
