package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{call_function, lit, xxhash64}
import org.apache.spark.util.sketch.BloomFilter

/** Distributed Bloom-filter build + codegen probe, on Spark's own
  * native expressions (the machinery behind runtime bloom-filter joins):
  *
  *   - [[agg]] wraps `BloomFilterAggregate` — each task inserts its
  *     partition's keys into a partial filter, partials merge up the
  *     normal partial-aggregation tree, and the driver only ever sees the
  *     final serialized bitset. Unlike `df.stat.bloomFilter` there is no
  *     RDD detour and no per-partition filter landing on the driver.
  *   - [[mightContain]] wraps `BloomFilterMightContain` — a native
  *     Catalyst predicate evaluated inside the scan stage, vs a Scala
  *     UDF boxing every row.
  *
  * Keys are `xxhash64` of the column (the same keying Spark's runtime
  * filters use), so build and probe must both go through these helpers.
  * The serialized bytes are the standard `org.apache.spark.util.sketch`
  * V1 format: [[BloomFilter.readFrom]] can merge two compatible results
  * driver-side (a bit-OR, no re-scan).
  */
object BloomFunctions {
  private val AggName = "graft_bloom_agg"
  private val ProbeName = "graft_bloom_might_contain"

  private def register(spark: SparkSession): Unit = {
    // idempotent — re-registering logs a "replaced" WARN per query
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(AggName))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      AggName, exprs => {
        require(exprs(1).foldable && exprs(2).foldable,
          s"$AggName capacity/bits must be literals")
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ProbeName, exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }

  /** Bits for `expectedItems` at `fpp` — the same sizing formula
    * `BloomFilter.create` uses, so filters built here merge with ones
    * built there (bitSize and hash count both derive from it).
    */
  def optimalBits(expectedItems: Long, fpp: Double): Long =
    math.ceil(-(expectedItems * math.log(fpp)) /
      (math.log(2) * math.log(2))).toLong

  /** Largest capacity the session will actually honor at `fpp`:
    * `BloomFilterAggregate` silently clamps its numItems/numBits inputs
    * to `spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits}`
    * (4M items / 8 MB of bits by default) — a request above either cap
    * builds a SMALLER filter than asked with no error, so any sizing
    * logic layered on [[agg]] must clamp to this first or its metadata
    * will describe a filter that was never built. Deployments targeting
    * larger corpora raise those confs cluster-wide; this helper then
    * honors the higher cap automatically.
    */
  def maxHonoredCapacity(spark: SparkSession, fpp: Double): Long = {
    val maxItems = spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    // invert optimalBits: the item count whose optimal bit size is maxBits
    val itemsForBits =
      (maxBits * math.log(2) * math.log(2) / -math.log(fpp)).toLong
    math.min(maxItems, itemsForBits)
  }

  /** Aggregate column: serialized Bloom filter over `xxhash64(key)`.
    * Evaluates to NULL on empty input.
    */
  def agg(spark: SparkSession, key: Column, expectedItems: Long,
      fpp: Double): Column = {
    register(spark)
    call_function(AggName, xxhash64(key), lit(expectedItems),
      lit(optimalBits(expectedItems, fpp)))
  }

  /** Predicate column: does the serialized filter possibly contain
    * `xxhash64(key)`? NULL keys hash to the seed constant, so they probe
    * (and may route to the authoritative join) but never error.
    */
  def mightContain(spark: SparkSession, bloomBytes: Array[Byte],
      key: Column): Column = {
    register(spark)
    call_function(ProbeName, lit(bloomBytes), xxhash64(key))
  }
}
