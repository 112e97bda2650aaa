package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-supplied parquet tables (TESTDATA.md).
  *
  * All queries read through here so that scan-level concerns stay in one
  * place: parquet scans get Catalyst's predicate pushdown + column pruning
  * for free, and at cluster scale the same entry point is where a
  * partitioned/bucketed warehouse layout would plug in.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark has no
    * native type for — read nanos as long and floor-convert to a
    * microsecond timestamp (same truncation DuckDB's
    * `date_trunc('microseconds', ts)` applies on the oracle side).
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` at session
    * build time (every entry-point main and the test fixture set it) —
    * a loader must not mutate the caller's session conf mid-query, so a
    * session missing it fails fast here instead.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .contains("true"),
      "events.parquet needs spark.sql.legacy.parquet.nanosAsLong=true " +
        "set when the SparkSession is built")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  /** The text/vector tables feed CPU-heavy per-row operators (md5
    * shingling, minhash, cosine). The local test files are single-row-
    * group parquet, so the scan plans as ONE task and serializes all that
    * compute; when scan parallelism is far below the session's cores,
    * redistribute once up front. On a real multi-file warehouse the scan
    * already parallelizes and this is a no-op.
    */
  private def widen(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, target / 2)) df.repartition(target)
    else df
  }

  def documents(s: SparkSession, d: String): DataFrame =
    widen(s, load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    widen(s, load(s, d, "embeddings"))
}
