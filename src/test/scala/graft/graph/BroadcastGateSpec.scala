package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** broadcastIfSmall must gate on estimated BYTES, not raw row count: a
  * narrow table under the limit gets the hint, a wide-schema table with
  * the same row count (embedding vectors, long strings) defers to AQE.
  */
class BroadcastGateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def hasBroadcastHint(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.logical.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      case u: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => u
    }.nonEmpty

  test("narrow table under the byte limit is broadcast") {
    import spark.implicits._
    val nodes = (1L to 100L).toDF("id")
    val g = new PropertyGraph(Map("N" -> nodes), Map.empty)
    assert(hasBroadcastHint(g.broadcastIfSmall("N", nodes)))
  }

  test("wide-schema table with modest row count is NOT force-broadcast") {
    import spark.implicits._
    // 1M rows (old gate: would broadcast) of ~(48*3 + 128*4) B estimated
    // width — an embedding column plus strings pushes the estimate past
    // 100 MB, so the hint must NOT be applied. Built lazily; never executed.
    val wide = spark.range(1000000L).select(
      col("id"),
      lit("x").as("name"), lit("y").as("title"), lit("z").as("body"),
      array((0 until 4).map(i => lit(i.toFloat)): _*).as("embedding"))
    val g = new PropertyGraph(Map("W" -> wide), Map.empty)
    g.nodeCountCache.put("W", 1000000L) // avoid executing the count
    assert(!hasBroadcastHint(g.broadcastIfSmall("W", wide)))
  }

  test("row-width estimate is pessimistic for variable-length types") {
    import org.apache.spark.sql.types._
    val g = new PropertyGraph(Map.empty, Map.empty)
    val narrow = StructType(Seq(StructField("id", LongType)))
    val withVec = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType))))
    assert(g.estimatedRowBytes(narrow) === 8L)
    // array<float> must NOT be costed at Catalyst's 4-byte defaultSize
    assert(g.estimatedRowBytes(withVec) >= 128L * 4L)
  }
}
