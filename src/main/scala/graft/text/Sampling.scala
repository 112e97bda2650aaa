package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: stratified
  * down-sampling and train/val/test splits keyed on a stable content or
  * id hash instead of an RNG.
  *
  * Hash-keyed sampling is the 100 TB idiom: the decision is a pure
  * per-row function (narrow map, no shuffle, no seed coordination across
  * executors), re-running the pipeline reproduces the same sample
  * bit-for-bit, and late-arriving rows of the same key land in the same
  * split — none of which `df.sample()` guarantees. The hash is the
  * engine-stable md5-based [[TextAnalysis.stableHash60]], so a DuckDB
  * oracle reproduces every decision exactly.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from a stable hash of `key`; `salt`
    * decorrelates independent decisions on the same key (the sample
    * filter and the split assignment must not share a hash).
    */
  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column =
    pmod(TextAnalysis.stableHash60(concat(lit(salt), key.cast("string"))),
      lit(buckets.toLong))

  /** Keep-percentage per stratum value (percent in [0, 100]); strata not
    * listed keep `defaultPct`. Appends nothing — returns the filtered
    * frame (rows whose hash bucket clears their stratum's rate).
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct.toLong)) {
      case (acc, (stratum, pct)) =>
        when(col(strataCol) === stratum, lit(pct.toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 100) < rate)
  }

  /** Deterministic train/val/test assignment: `trainPct`/`valPct` percent
    * boundaries, remainder = test. Salted independently from
    * [[stratifiedSample]] so sampling and splitting don't correlate.
    */
  def split(key: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    val b = hashBucket(key, 100, salt = "s")
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }
}
