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

  /** Multi-source mixture sampling (the data-mixture step of a training
    * pipeline): down-sample each listed source so the KEPT token mass
    * follows `weights`, without upsampling anything. The budget is set
    * by the binding source — `B = min_s(tokens_s / w_s)` over the
    * normalized weights — so the scarcest-relative-to-its-weight source
    * keeps 100% and every other source keeps
    * `rate_s = w_s · B / tokens_s`. The keep decision is the same
    * hash-keyed per-row rule as [[stratifiedSample]] (ppm granularity,
    * salt "mix"): pure narrow map after a broadcast of the ≤|sources|
    * rate rows — the corpus never shuffles, re-runs reproduce the same
    * sample bit-for-bit, and the DuckDB oracle replays every decision.
    * Sources not in `weights` are excluded (mixture definition = the
    * listed sources). Output carries the per-source `rate_ppm` so the
    * realized mixture is auditable downstream.
    */
  def mixtureSample(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixtureSample needs positive weights for at least one source")
    val wsum = weights.values.sum
    val wCol = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (src, w)) =>
        when(col(sourceCol) === src, lit(w / wsum)).otherwise(acc)
    }
    val in = df.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
    val perSrc = in.groupBy(col(sourceCol))
      .agg(sum(TextAnalysis.tokenCount(col(textCol))).cast("double").as("toks"))
      .withColumn("w", wCol)
    val budget = perSrc.agg(min(col("toks") / col("w")).as("budget"))
    // floor(x + 0.5): the binding source's rate is algebraically 1.0
    // but w·(toks/w)/toks can land at 0.999999… in doubles — a bare
    // floor would silently drop its ppm-999999 docs and break the
    // "binding source keeps 100%" contract. Half-up rounding keeps that
    // invariant unconditionally (the oracle applies the same formula).
    val rates = perSrc.crossJoin(broadcast(budget))
      .select(col(sourceCol),
        floor(col("w") * col("budget") / col("toks") * lit(1000000.0)
          + lit(0.5)).cast("long").as("rate_ppm"))
    in.join(broadcast(rates), sourceCol)
      .filter(hashBucket(col(idCol), 1000000, salt = "mix") < col("rate_ppm"))
  }
}
