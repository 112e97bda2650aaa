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
}
