package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Recall-floor DRIFT alarm (round-14 verdict item): the e04/e05/e06
  * static floors (0.6 / 0.1 / 0.3) are measured-min constants — a
  * datagen change could park actual recall just above a broken index
  * and the oracle gates would stay green forever. This spec measures
  * the REAL mean recall@10 on the driver's sf0.01 corpus and fails
  * when any family slides more than 0.15 below its recorded trailing
  * value, even while still clearing the static floor.
  *
  * Trailing values are the sf0.01 measurements recorded in
  * BENCH_NOTES.md ("recall trail" table); update BOTH together when an
  * intentional index/datagen change moves them.
  */
class RecallDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.01"

  /** Trailing measured recall@10 at sf0.01 (round 14; e08 round 19). */
  private val trailing = Map(
    "e04_ivf" -> 0.94,
    "e05_pq" -> 0.34,
    "e06_pqr" -> 0.62,
    "e08_hier" -> 0.94)

  private val staticFloors = Map(
    "e04_ivf" -> 0.6,
    "e05_pq" -> 0.1,
    "e06_pqr" -> 0.3,
    "e08_hier" -> 0.6)

  test("measured recall stays within 0.15 of the recorded trail") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists,
      "driver testdata not present")
    val got = graft.queries.PipelineQueries.measuredRecall(spark, sfDir)
    info(s"measured recall@10 at sf0.01: $got")
    trailing.foreach { case (k, trail) =>
      val m = got(k)
      assert(m >= staticFloors(k),
        s"$k measured recall $m is below its static floor ${staticFloors(k)}")
      assert(m >= trail - 0.15,
        s"$k measured recall $m dropped >0.15 below the trailing $trail — " +
          "index regression or datagen drift hiding under the static floor")
    }
  }
}
