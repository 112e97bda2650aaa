package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, Path}
import graft.SparkFixture

/** Crash-atomicity of the graph-save swap (VERDICT r16 #1).
  *
  * [[GraphCatalog.saveGraph]] promotes its staging dir through
  * rename-aside (live → `.old_<name>`, staging → live, delete `.old` —
  * the IncrementalDedup compaction protocol), and a new catalog over
  * the warehouse rolls any interrupted swap forward or back at open.
  * Each test constructs the exact on-disk aftermath of a kill at one
  * protocol point (the PipelineSpec crash-simulation idiom — the state
  * a SIGKILL leaves is just files, so we build it directly) and
  * asserts the next catalog open recovers a complete graph: the NEW
  * version when the staging had committed (its `_meta` marker written),
  * the OLD version otherwise. The reference covers this class of crash
  * with WAL recovery (graphlite/src/txn/recovery.rs); this is the
  * copy-on-write analog.
  */
class SaveCrashRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def mkGraph(n: Int) = {
    import spark.implicits._
    val nodes = (1L to n.toLong).map(i => (i, s"name$i")).toDF("id", "nm")
    new PropertyGraph(Map("user" -> nodes), Map.empty)
  }

  private def fixture(name: String = "g1"): (GraphCatalog, String) = {
    val wh = Files.createTempDirectory("graft-crash").toString
    val cat = new GraphCatalog(spark, wh)
    cat.createSchema("s")
    cat.saveGraph("s", name, mkGraph(5)) // live v1: 5 rows
    (cat, wh)
  }

  /** Build a COMPLETE v2 staging dir for `name` (the state just before
    * the swap begins): save v2 under a scratch name and rename that
    * saved dir — it has exactly a staging's layout (datasets + `_meta`
    * marker last).
    */
  private def plantCompleteStaging(cat: GraphCatalog, wh: String,
      name: String, rows: Int, nanos: Long = 12345L): Path = {
    cat.saveGraph("s", s"__scratch_$name", mkGraph(rows))
    val staging = Paths.get(s"$wh/s/.staging_${name}_$nanos")
    Files.move(Paths.get(s"$wh/s/__scratch_$name"), staging)
    staging
  }

  private def rowCount(wh: String, name: String): Long = {
    val cat2 = new GraphCatalog(spark, wh) // open = recovery point
    cat2.loadGraph("s", name).nodeTables("user").count()
  }

  test("clean save leaves no .old or staging leftovers") {
    val (cat, wh) = fixture()
    cat.saveGraph("s", "g1", mkGraph(9))
    val leftovers = Files.list(Paths.get(s"$wh/s"))
    val names = try {
      import scala.jdk.CollectionConverters._
      leftovers.iterator.asScala.map(_.getFileName.toString).toSeq
    } finally leftovers.close()
    assert(names.sorted == Seq("g1"), s"unexpected entries: $names")
    assert(rowCount(wh, "g1") == 9L)
  }

  test("kill mid-staging (no _meta marker): live v1 intact, orphan " +
      "staging swept") {
    val (_, wh) = fixture()
    // aftermath: a partial staging — dataset dir present, NO _meta
    val staging = Paths.get(s"$wh/s/.staging_g1_99999")
    Files.createDirectories(staging.resolve("nodes_user"))
    Files.writeString(staging.resolve("nodes_user/part-0.parquet"), "junk")
    assert(rowCount(wh, "g1") == 5L) // v1 survives
    assert(!Files.exists(staging), "incomplete staging must be deleted")
    assert(!Files.exists(Paths.get(s"$wh/s/.old_g1")))
  }

  test("kill between rename-aside and promote: rolls FORWARD to the " +
      "committed staging") {
    val (cat, wh) = fixture()
    val staging = plantCompleteStaging(cat, wh, "g1", 9)
    // aftermath of the first rename: live moved aside, staging complete
    Files.move(Paths.get(s"$wh/s/g1"), Paths.get(s"$wh/s/.old_g1"))
    assert(rowCount(wh, "g1") == 9L) // v2 promoted
    assert(!Files.exists(staging))
    assert(!Files.exists(Paths.get(s"$wh/s/.old_g1")))
  }

  test("kill between rename-aside and promote with an INCOMPLETE " +
      "staging: rolls BACK to .old") {
    val (_, wh) = fixture()
    Files.move(Paths.get(s"$wh/s/g1"), Paths.get(s"$wh/s/.old_g1"))
    val staging = Paths.get(s"$wh/s/.staging_g1_55555")
    Files.createDirectories(staging.resolve("nodes_user")) // no _meta
    assert(rowCount(wh, "g1") == 5L) // v1 restored
    assert(!Files.exists(staging))
    assert(!Files.exists(Paths.get(s"$wh/s/.old_g1")))
  }

  test("kill between promote and .old cleanup: live v2 wins, backup " +
      "dropped") {
    val (cat, wh) = fixture()
    val staging = plantCompleteStaging(cat, wh, "g1", 9)
    Files.move(Paths.get(s"$wh/s/g1"), Paths.get(s"$wh/s/.old_g1"))
    Files.move(staging, Paths.get(s"$wh/s/g1")) // promote happened
    assert(rowCount(wh, "g1") == 9L)
    assert(!Files.exists(Paths.get(s"$wh/s/.old_g1")))
  }

  test("recovery keys on the LAST underscore: graph names with " +
      "underscores and trailing digits recover to the right dir") {
    val wh = Files.createTempDirectory("graft-crash").toString
    val cat = new GraphCatalog(spark, wh)
    cat.createSchema("s")
    cat.saveGraph("s", "g_2", mkGraph(5))
    val staging = plantCompleteStaging(cat, wh, "g_2", 9)
    Files.move(Paths.get(s"$wh/s/g_2"), Paths.get(s"$wh/s/.old_g_2"))
    assert(rowCount(wh, "g_2") == 9L)
    assert(!Files.exists(staging))
    assert(!Files.exists(Paths.get(s"$wh/s/.old_g_2")))
  }

  test("newest complete staging wins when several survive") {
    val (cat, wh) = fixture()
    val s1 = plantCompleteStaging(cat, wh, "g1", 7, nanos = 12345L)
    val s2 = plantCompleteStaging(cat, wh, "g1", 9, nanos = 99999L)
    Files.move(Paths.get(s"$wh/s/g1"), Paths.get(s"$wh/s/.old_g1"))
    assert(rowCount(wh, "g1") == 9L) // nanos 99999 > 12345
    assert(!Files.exists(s1) && !Files.exists(s2))
    assert(!Files.exists(Paths.get(s"$wh/s/.old_g1")))
  }

  // ---- metadata torn-write protection: catalog files (`_indexes`,
  // `_security`, procedure/graph-type defs) write through a same-dir
  // `.tmp_` sibling + atomic rename, so a kill mid-write never truncates
  // the live file; stale temps are swept at open.

  test("kill mid-metadata-write: live _indexes/_security intact, " +
      ".tmp_ leftovers swept at open") {
    val (cat, wh) = fixture()
    cat.createIndex("ix1", "nodes_user", Seq("id"))
    cat.createPrincipal("user", "alice")
    // aftermath of a kill mid-writeAtomic: a half-written temp beside
    // each live file (the live file itself was never opened)
    Files.writeString(Paths.get(s"$wh/.tmp__indexes_777"), "ix-half\tnod")
    Files.writeString(Paths.get(s"$wh/.tmp__security_777"), "user\tmal")
    Files.createDirectories(Paths.get(s"$wh/_procedures"))
    Files.writeString(Paths.get(s"$wh/_procedures/.tmp_p.gql_777"), "RET")
    val cat2 = new GraphCatalog(spark, wh) // open = sweep point
    assert(cat2.listIndexes().map(_._1) == Seq("ix1"))
    assert(cat2.listPrincipals("user").contains("alice"))
    assert(!Files.exists(Paths.get(s"$wh/.tmp__indexes_777")))
    assert(!Files.exists(Paths.get(s"$wh/.tmp__security_777")))
    assert(!Files.exists(Paths.get(s"$wh/_procedures/.tmp_p.gql_777")))
    // and the temp names never leak into listings even BEFORE a sweep
    assert(!cat2.listSchemas().exists(_.startsWith(".")))
  }

  test("metadata writes leave no temp files behind and replace " +
      "atomically-in-place") {
    val (cat, wh) = fixture()
    cat.createIndex("ixa", "nodes_user", Seq("id"))
    cat.createIndex("ixb", "nodes_user", Seq("nm"))
    cat.setIndexOption("ixa", "buckets", "4")
    cat.createPrincipal("user", "bob", Some("pw"))
    cat.saveProcedure("p1", "RETURN 1 AS x")
    cat.saveGraphType(graft.graph.GraphType.GraphTypeDef("t1",
      Seq(graft.graph.GraphType.NodeTypeDef("user",
        Seq(graft.graph.GraphType.PropDef("id", "INT", required = true)))),
      Seq.empty))
    import scala.jdk.CollectionConverters._
    def temps(p: Path): Seq[String] = {
      val s = Files.list(p)
      try s.iterator.asScala.map(_.getFileName.toString)
        .filter(_.startsWith(".tmp_")).toSeq
      finally s.close()
    }
    assert(temps(Paths.get(wh)).isEmpty)
    assert(temps(Paths.get(s"$wh/_procedures")).isEmpty)
    assert(temps(Paths.get(s"$wh/_graph_types")).isEmpty)
    // replacement really replaced: both indexes visible after two writes
    assert(cat.listIndexes().map(_._1).sorted == Seq("ixa", "ixb"))
    assert(cat.listIndexOptions("ixa").contains(("buckets", "4")))
    assert(cat.loadProcedure("p1").contains("RETURN 1 AS x"))
  }
}
