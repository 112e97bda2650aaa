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
  def customer(s: SparkSession, d: String): DataFrame =
    widen(s, load(s, d, "customer"), FactMinBytes)
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame =
    widen(s, load(s, d, "part"), FactMinBytes)
  def orders(s: SparkSession, d: String): DataFrame =
    widen(s, load(s, d, "orders"), FactMinBytes)
  def lineitem(s: SparkSession, d: String): DataFrame =
    widen(s, load(s, d, "lineitem"), FactMinBytes)
  /** events.parquet's `ts` column has shipped in two physical encodings
    * across test-data generations: TIMESTAMP(NANOS) (surfacing as BIGINT
    * nanos under `spark.sql.legacy.parquet.nanosAsLong=true`) and plain
    * TIMESTAMP(MICROS) (surfacing as TIMESTAMP or TIMESTAMP_NTZ). Branch
    * on the loaded dtype instead of assuming one generation:
    *   - LongType            → nanos; floor-convert to micros (matches the
    *                           DuckDB oracle's implicit micros truncation)
    *   - TIMESTAMP_NTZ       → reinterpret as a session-TZ instant, same
    *                           naive-timestamp semantics DuckDB applies
    *   - TimestampType       → use as-is
    * A session without nanosAsLong simply fails at read time on the nanos
    * generation (Spark's own error is clear), so no pre-check is needed.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros, to_timestamp}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", to_timestamp(raw("ts")))
      case _ => raw
    }
  }
  /** The local test files are single-row-group parquet, so a scan plans
    * as ONE task: the text/vector tables then serialize CPU-heavy per-row
    * operators (md5 shingling, minhash, cosine), and the fact tables
    * (lineitem/orders/...) serialize full-scan agg/join work the same way.
    * When the estimated scan parallelism is far below the session's cores,
    * redistribute once up front. On a real multi-file warehouse the scan
    * already parallelizes and this is a no-op (the estimate meets the
    * target and no shuffle is added). Catalyst still pushes filters and
    * column pruning through the Repartition to the scan.
    *
    * `minBytes` gates the shuffle: redistribution is one extra pass over
    * the data, which only pays when each resulting task still has real
    * work. The fact tables use [[FactMinBytes]] — measured locally,
    * widening a 300 KB customer table made every downstream query ~1.7×
    * SLOWER (stage + shuffle overhead, no compute to parallelize), while
    * widening the 11 MB lineitem made full scans 2–4× faster. The
    * CPU-heavy text/vector tables keep minBytes = 0: per-row md5/minhash
    * work dwarfs the shuffle even on tiny files.
    */
  private val FactMinBytes: Long = 8L << 20

  /** Widen gate for GRAPH-build fact loads — higher than [[FactMinBytes]]
    * because the costs differ: a relational query reads the fact table
    * once, while the memoized graph's edge lineage re-executes the widen
    * exchange in EVERY hop of every query. Measured at sf0.1 (10.8 MB
    * single-row-group lineitem): widening all graph facts cost ~25 %
    * across the 43 graph queries (11.3 s → 14.2 s wall) — the per-query
    * exchange outweighs the parallelism on a ~100 ms serial chunk. At
    * the 10× probe tier (105 MB), the RAW load ran 10 heavy ~600 ms scan
    * tasks while 21 cores idled inside the broadcast-fused hop stage
    * (skew 6-13×) — there the exchange pays for itself several times
    * over. 32 MB splits the two regimes: a serial chunk under it fuses
    * in well under a second; over it, redistribution wins and keeps
    * winning as data grows. On a multi-row-group warehouse the scan
    * parallelizes natively and the gate is moot (est ≥ cores/2 → no-op).
    */
  private val GraphFactMinBytes: Long = 32L << 20

  /** Fact-table load for graph construction — see [[GraphFactMinBytes]]. */
  def graphFact(s: SparkSession, d: String, name: String): DataFrame =
    widen(s, load(s, d, name), GraphFactMinBytes)

  /** Total bytes of a frame's scan input files — THE byte accounting the
    * widen gate uses, exposed so audits assert against the same number
    * (None when a file can't be stat-ed locally; widen then falls back
    * to the partition count and the gate is not byte-driven).
    */
  def scanBytes(df: DataFrame): Option[Long] =
    try Some(df.inputFiles.map(f => java.nio.file.Files.size(
      java.nio.file.Paths.get(new java.net.URI(f)))).sum)
    catch { case _: Exception => None }

  private def widen(s: SparkSession, df: DataFrame,
      minBytes: Long = 0L, fullTarget: Boolean = false): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    // estimate the scan's task count from file bytes ÷ maxPartitionBytes
    // (the split rule the scan itself uses) instead of materializing an
    // RDD handle per load just to read its partition count. The conf
    // value may carry a size suffix ("64m"); a file whose size this
    // process can't stat (non-local filesystem) falls back to the
    // authoritative partition count rather than guessing low and
    // forcing a pointless full shuffle of a big remote scan.
    val maxPart = math.max(1L, org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(
        s.conf.get("spark.sql.files.maxPartitionBytes", "134217728")))
    val (est, totalBytes, avgFileBytes) =
      try {
        val sizes = df.inputFiles.map(f => java.nio.file.Files.size(
          java.nio.file.Paths.get(new java.net.URI(f))))
        (sizes.map(b => math.max(1L, (b + maxPart - 1) / maxPart)).sum,
          sizes.sum, if (sizes.isEmpty) 0L else sizes.sum / sizes.length)
      } catch {
        case _: Exception =>
          (df.rdd.getNumPartitions.toLong, Long.MaxValue, Long.MaxValue)
      }
    // CPU-dense tables (fullTarget) additionally redistribute when the
    // table is fragmented into SMALL files AND the packed-split estimate
    // actually starves the cores. `est` counts one task per file, but
    // Spark bin-packs small files into shared splits and a row group
    // lands entirely in whichever split holds its midpoint — measured at
    // the 100× probe tier, a 100-file / 0.6 MB-each corpus planned 54
    // scan tasks of which only 25 carried rows, idling ~20 % of the
    // cores through a 2 s md5/minhash CPU wave. The bin estimate mirrors
    // Spark's own split sizing (openCost padding, bytes-per-core floor);
    // requiring bins < 2× target leaves margin for the midpoint rule
    // emptying up to half the bins, while a LARGE fragmented warehouse
    // (common streaming-ingest layout) packs into plenty of full bins
    // and adds no exchange. Files at/above the split size never enter
    // this branch at all, and the byte-cheap fact scans keep the plain
    // half-target bar: an extra exchange there costs more than the tail
    // it fills.
    // the bar itself differs by COST MODEL, not taste: for byte-cheap
    // fact scans the exchange competes with cheap per-row work, so only
    // sub-half-target parallelism justifies it; for CPU-dense tables a
    // missing core means seconds of md5/minhash wave per wave, which
    // dwarfs shipping the text once — they widen whenever the scan
    // cannot fill EVERY core (e.g. 20 × 20 MB files on 32 cores)
    val smallFiles = fullTarget && avgFileBytes != Long.MaxValue &&
      avgFileBytes < maxPart / 8 && {
        val openCost = math.max(1L, org.apache.spark.network.util.JavaUtils
          .byteStringAsBytes(
            s.conf.get("spark.sql.files.openCostInBytes", "4194304")))
        val nFiles = math.max(1L, totalBytes / math.max(1L, avgFileBytes))
        val padded = totalBytes + nFiles * openCost
        val maxSplit = math.min(maxPart,
          math.max(openCost, padded / math.max(1, target)))
        val bins = (padded + maxSplit - 1) / maxSplit
        bins < 2L * target
      }
    val bar = if (fullTarget) target else math.max(2, target / 2)
    if (totalBytes >= minBytes && (est < bar || smallFiles))
      df.repartition(target)
    else df
  }

  def documents(s: SparkSession, d: String): DataFrame =
    widen(s, load(s, d, "documents"), fullTarget = true)
  def embeddings(s: SparkSession, d: String): DataFrame =
    widen(s, load(s, d, "embeddings"), fullTarget = true)
}
