package graft

import graft.graph.PropertyGraph

/** Scratch reproduction main (not a spec) — safe to delete. */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val s = SparkFixture.gqlSession(new PropertyGraph(Map.empty, Map.empty))
    s.execute("INSERT (:PathNode {id: 1, tag: 'A'}), (:PathNode {id: 2, tag: 'B'}), " +
      "(:PathNode {id: 3, tag: 'C'}), (:PathNode {id: 4, tag: 'D'}), " +
      "(:PathNode {id: 5, tag: 'E'})")
    val n = s.execute(
      "MATCH (a:PathNode {tag: 'A'}), (b:PathNode {tag: 'B'}), " +
        "(c:PathNode {tag: 'C'}), (d:PathNode {tag: 'D'}), (e:PathNode {tag: 'E'}) " +
        "INSERT (a)-[:PATH {weight: 1}]->(b)-[:PATH {weight: 1}]->(e), " +
        "(a)-[:PATH {weight: 1}]->(c)-[:PATH {weight: 2}]->(d)-[:PATH {weight: 1}]->(e), " +
        "(a)-[:PATH {weight: 5}]->(e)").collect().head.getLong(0)
    println(s"== inserted: $n")
    println("== PATH edge table:")
    s.graph.edgeTables("PATH")._2.show(20, false)
    println("== PathNode table:")
    s.graph.nodeTables("PathNode").show(20, false)
    println("== traversal rows:")
    s.gql("MATCH (a:PathNode {tag: 'A'})-[:PATH*1..3]->(e:PathNode {tag: 'E'}) " +
      "RETURN count(e) AS n").show(false)
    s.gql("MATCH p = (a:PathNode {tag: 'A'})-[:PATH*1..3]->(e:PathNode {tag: 'E'}) " +
      "RETURN a.tag, e.tag").show(false)
  }
}
