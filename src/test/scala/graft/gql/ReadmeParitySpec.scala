package graft.gql

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.graph.PropertyGraph

/** The reference README walkthrough (readme_examples_test.rs) run
  * end-to-end against this engine: id-less INSERTs (auto-assigned node
  * ids), MATCH…INSERT relationship creation with properties, and the
  * pattern-matching queries a first-time reference user runs.
  */
class ReadmeParitySpec extends AnyFunSuite {

  private def setup(): graft.GqlSession = {
    val s = SparkFixture.gqlSession(
      new PropertyGraph(Map.empty, Map.empty))
    s.execute("INSERT (:Person {name: 'Alice', age: 30, city: 'NYC'}), " +
      "(:Person {name: 'Bob', age: 25, city: 'NYC'}), " +
      "(:Person {name: 'Carol', age: 28, city: 'SF'}), " +
      "(:Person {name: 'Dave', age: 35, city: 'NYC'})")
    s.execute("INSERT (:Company {name: 'TechCorp', founded: '2010-01-01'}), " +
      "(:Company {name: 'DataInc', founded: '2015-06-15'})")
    Seq("Alice" -> "Bob", "Bob" -> "Carol", "Alice" -> "Dave",
      "Carol" -> "Dave").foreach { case (a, b) =>
      s.execute(s"MATCH (x:Person {name: '$a'}), (y:Person {name: '$b'}) " +
        "INSERT (x)-[:KNOWS {since: '2020-01-01'}]->(y)")
    }
    s.execute("MATCH (p:Person {name: 'Alice'}), (c:Company {name: 'TechCorp'}) " +
      "INSERT (p)-[:WORKS_AT {role: 'Engineer'}]->(c)")
    s.execute("MATCH (p:Person {name: 'Bob'}), (c:Company {name: 'TechCorp'}) " +
      "INSERT (p)-[:WORKS_AT {role: 'Designer'}]->(c)")
    s.execute("MATCH (p:Person {name: 'Carol'}), (c:Company {name: 'DataInc'}) " +
      "INSERT (p)-[:WORKS_AT {role: 'Analyst'}]->(c)")
    s
  }

  test("id-less INSERT auto-assigns distinct node ids") {
    val s = setup()
    assert(s.gql("MATCH (p:Person) RETURN count(p) AS n")
      .collect().head.getLong(0) == 4L)
    // identical repeated insert creates a SECOND node
    // (duplicate_insert_test.rs)
    s.execute("INSERT (:Person {name: 'Alice', age: 30, city: 'NYC'})")
    assert(s.gql("MATCH (p:Person) WHERE p.name = 'Alice' " +
      "RETURN count(p) AS n").collect().head.getLong(0) == 2L)
    val ids = s.gql("MATCH (p:Person) RETURN ID(p) AS i ORDER BY i")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == ids.distinct)
  }

  test("friends of friends (readme pattern matching)") {
    val s = setup()
    val fof = s.gql("MATCH (person:Person)-[:KNOWS]->(friend:Person)" +
      "-[:KNOWS]->(fof:Person) WHERE person.name = 'Alice' " +
      "RETURN fof.name AS name ORDER BY name")
      .collect().map(_.getString(0)).toSeq
    assert(fof == Seq("Carol"))
  }

  test("colleagues via shared employer (readme join pattern)") {
    val s = setup()
    val rows = s.gql("MATCH (a:Person)-[:WORKS_AT]->(c:Company)" +
      "<-[:WORKS_AT]-(b:Person) WHERE a.name < b.name " +
      "RETURN a.name AS a, b.name AS b, c.name AS company")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("Alice", "Bob", "TechCorp")))
  }

  test("aggregation by city (readme analytics)") {
    val s = setup()
    val rows = s.gql("MATCH (p:Person) RETURN p.city AS city, " +
      "count(p) AS n, avg(p.age) AS avg_age ORDER BY city")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("NYC", 3L, 30.0), ("SF", 1L, 28.0)))
  }

  test("multi-hop and multi-path MATCH…INSERT (pattern_tests.rs path setup)") {
    val s = SparkFixture.gqlSession(new PropertyGraph(Map.empty, Map.empty))
    s.execute("INSERT (:PathNode {id: 1, tag: 'A'}), (:PathNode {id: 2, tag: 'B'}), " +
      "(:PathNode {id: 3, tag: 'C'}), (:PathNode {id: 4, tag: 'D'}), " +
      "(:PathNode {id: 5, tag: 'E'})")
    // one statement inserts two chains + a direct edge (reference's
    // shortest-path fixture: A→B→E, A→C→D→E, A→E)
    val n = s.execute(
      "MATCH (a:PathNode {tag: 'A'}), (b:PathNode {tag: 'B'}), " +
        "(c:PathNode {tag: 'C'}), (d:PathNode {tag: 'D'}), (e:PathNode {tag: 'E'}) " +
        "INSERT (a)-[:PATH {weight: 1}]->(b)-[:PATH {weight: 1}]->(e), " +
        "(a)-[:PATH {weight: 1}]->(c)-[:PATH {weight: 2}]->(d)-[:PATH {weight: 1}]->(e), " +
        "(a)-[:PATH {weight: 5}]->(e)").collect().head.getLong(0)
    assert(n == 6L)
    // idempotent re-run inserts nothing new
    assert(s.execute(
      "MATCH (a:PathNode {tag: 'A'}), (e:PathNode {tag: 'E'}) " +
        "INSERT (a)-[:PATH {weight: 5}]->(e)").collect().head.getLong(0) == 0L)
    // traversal sees all three routes A→…→E (depths 1, 2, 3)
    val depths = s.gql("MATCH (a:PathNode {tag: 'A'})-[:PATH*1..3]->" +
      "(e:PathNode {tag: 'E'}) RETURN count(e) AS n").collect().head.getLong(0)
    assert(depths == 3L)
  }

  test("relationship properties round-trip") {
    val s = setup()
    val roles = s.gql("MATCH (p:Person)-[w:WORKS_AT]->(c:Company) " +
      "RETURN p.name AS name, w.role AS role ORDER BY name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    assert(roles == Seq("Alice" -> "Engineer", "Bob" -> "Designer",
      "Carol" -> "Analyst"))
  }
}
