package graft.dedup

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Cross-run deduplication: a persisted sketch of everything already
  * accepted, so NEW batches dedupe against the whole corpus history
  * without rescanning it (beyond-reference extension; ROADMAP §pipeline).
  *
  * State layout (append-only parquet — a batch commit appends files, it
  * never rewrites history; at 100 TB the state grows by the survivors of
  * each batch only):
  *  - `<state>/exact`     (fp: long)            — exact fingerprints
  *  - `<state>/shingles`  (id, shingles)        — accepted docs' shingle sets
  *  - `<state>/buckets`   (id, band, bucket)    — accepted docs' LSH buckets
  *
  * Both entry points materialize the survivor set BEFORE appending it to
  * the state, so the returned DataFrame stays stable however often the
  * caller re-executes it. The only shuffles are the fingerprint/bucket
  * equi-joins — probes touch matching state partitions, never all pairs.
  */
object IncrementalDedup {

  /** Exact dedupe of `batch` against itself and all prior runs.
    * Within the batch the smallest id per fingerprint survives. Returns
    * the surviving rows (original columns) and commits their fingerprints.
    *
    * A Bloom sidecar (`<state>/exact_bloom`, merged incrementally per
    * batch) pre-filters the history probe: rows whose fingerprint the
    * bloom has definitely never seen bypass the anti-join entirely — at
    * scale, the novel majority of each batch never shuffles against the
    * history table, only the maybe-seen minority does. False positives
    * just take the (authoritative) anti-join path, so results are exact.
    */
  def dedupeExact(batch: DataFrame, idCol: String, textCol: String,
      statePath: String): DataFrame = {
    val spark = batch.sparkSession
    recoverCompaction(statePath)
    val path = s"$statePath/exact"
    val bloomPath = Paths.get(s"$statePath/exact_bloom")
    val fp = batch.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    val batchKeep = fp.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    var keep = batchKeep
    val hasHistory = Files.exists(Paths.get(path))
    if (hasHistory) {
      val history = spark.read.parquet(path).select(col("fp").as("__fp"))
      keep =
        if (Files.exists(bloomPath)) {
          val bf = loadBloom(bloomPath)
          val bfBc = spark.sparkContext.broadcast(bf)
          // null fingerprints (null text) are never "seen" — they fall
          // through to the keep set exactly like the plain anti-join path
          val mightSeen = udf((s: String) =>
            s != null && bfBc.value.mightContainString(s))
          val novel = batchKeep.filter(!mightSeen(col("__fp")))
          val candidates = batchKeep.filter(mightSeen(col("__fp")))
            .join(history, Seq("__fp"), "left_anti")
          novel.unionByName(candidates)
        } else batchKeep.join(history, Seq("__fp"), "left_anti")
    }
    val out = keep.localCheckpoint(true)
    // Bloom invariant: the sidecar must NEVER under-cover the history
    // table (a false negative would skip the authoritative anti-join and
    // admit a duplicate). Hence: (a) a missing sidecar over existing
    // history rebuilds from the FULL history, not just this batch;
    // (b) the merged bloom is saved BEFORE the parquet append — a crash
    // between the two leaves it over-covering, which only routes rows to
    // the exact join. All blooms share one fixed capacity so they merge;
    // a capacity change also triggers the full rebuild.
    val needRebuild = hasHistory && !Files.exists(bloomPath)
    if (!out.isEmpty || needRebuild) {
      val newBloom =
        if (out.isEmpty) null
        else out.stat.bloomFilter("__fp", BloomCapacity, 0.01)
      val merged =
        if (needRebuild) {
          val hist = spark.read.parquet(path)
            .stat.bloomFilter("fp", BloomCapacity, 0.01)
          if (newBloom != null) hist.mergeInPlace(newBloom) else hist
        } else if (Files.exists(bloomPath)) {
          try loadBloom(bloomPath).mergeInPlace(newBloom)
          catch {
            case _: org.apache.spark.util.sketch.IncompatibleMergeException =>
              val hist = spark.read.parquet(path)
                .stat.bloomFilter("fp", BloomCapacity, 0.01)
              hist.mergeInPlace(newBloom)
          }
        } else newBloom
      saveBloom(bloomPath, merged)
    }
    out.select(col("__fp").as("fp")).write.mode("append").parquet(path)
    out.drop("__fp")
  }

  /** Restore any dataset left aside by a crashed [[compactState]] swap:
    * if the live dir is missing but its `.old_` backup exists, the swap
    * died between renames — move the backup back before reading state.
    */
  private def recoverCompaction(statePath: String): Unit =
    Seq("exact", "shingles", "buckets").foreach { sub =>
      val p = Paths.get(s"$statePath/$sub")
      val old = Paths.get(s"$statePath/.old_$sub")
      if (!Files.exists(p) && Files.exists(old)) Files.move(old, p)
    }

  /** Fixed sidecar capacity (~12 MB of bits at 1% fpp) — sized for 10M
    * accepted docs; raise for larger corpora (triggers a one-time
    * rebuild from the history table).
    */
  val BloomCapacity: Long = 10000000L

  private def loadBloom(p: java.nio.file.Path): org.apache.spark.util.sketch.BloomFilter = {
    val in = Files.newInputStream(p)
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
    finally in.close()
  }

  private def saveBloom(p: java.nio.file.Path,
      bf: org.apache.spark.util.sketch.BloomFilter): Unit = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    val outS = Files.newOutputStream(tmp)
    try bf.writeTo(outS) finally outS.close()
    Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** MinHash/LSH near-dedupe of `batch` against itself and all prior
    * runs: candidates come from shared LSH band buckets (within the
    * batch, and new-bucket × state-bucket), then exact n-gram Jaccard
    * ≥ `tau` confirms. Survivors are returned and committed (shingle
    * sets + buckets appended).
    */
  def dedupeNear(batch: DataFrame, idCol: String, textCol: String,
      statePath: String, n: Int = 3, numHashes: Int = 32, bands: Int = 0,
      tau: Double = 0.7): DataFrame = {
    val spark = batch.sparkSession
    recoverCompaction(statePath)
    val nBands = if (bands > 0) bands
      else graft.similarity.Similarity.tuneBanding(numHashes, tau)._1
    val rpb = numHashes / nBands
    val bucketsPath = s"$statePath/buckets"
    val shinglesPath = s"$statePath/shingles"

    // one md5 pass per doc; everything downstream reads the materialized
    // (id, shingles, sig) frame
    val sigs = batch.select(col(idCol).as("id"),
        Dedup.shingleHashes(col(textCol), n).as("shingles"))
      .withColumn("sig", Dedup.minhashFromHashes(col("shingles"), numHashes))
      .localCheckpoint(true)
    val newBuckets = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(nBands - 1)),
          b => slice(col("sig"), b * rpb + 1, lit(rpb)))))
      .select(col("id"), col("pos").as("band"),
        TextAnalysis.stableHash60(to_json(col("col"))).as("bucket"))

    // within-batch: higher id of each confirmed pair drops
    val cands = Dedup.lshCandidatePairs(sigs, "id", "sig", nBands, rpb)
    val innerDrop = cands
      .join(sigs.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .filter(Dedup.jaccard(col("sh_a"), col("sh_b")) >= tau)
      .select(col("id_b").as("id")).distinct()
    var keep = sigs.join(innerDrop, Seq("id"), "left_anti")

    // vs state: bucket-join new docs to history, confirm by Jaccard
    if (Files.exists(Paths.get(bucketsPath))) {
      val stBuckets = spark.read.parquet(bucketsPath)
        .select(col("id").as("old_id"), col("band"), col("bucket"))
      val stShingles = spark.read.parquet(shinglesPath)
        .select(col("id").as("old_id"), col("shingles").as("sh_old"))
      val candOld = newBuckets.join(keep.select("id"), "id")
        .join(stBuckets, Seq("band", "bucket"))
        .select("id", "old_id").distinct()
      val dupVsState = candOld
        .join(keep.select(col("id"), col("shingles").as("sh_new")), "id")
        .join(stShingles, "old_id")
        .filter(Dedup.jaccard(col("sh_new"), col("sh_old")) >= tau)
        .select("id").distinct()
      keep = keep.join(dupVsState, Seq("id"), "left_anti")
    }

    val out = keep.localCheckpoint(true)
    out.select("id", "shingles").write.mode("append").parquet(shinglesPath)
    newBuckets.join(out.select("id"), "id")
      .select("id", "band", "bucket").write.mode("append").parquet(bucketsPath)
    batch.join(out.select(col("id").as(idCol)).distinct(), Seq(idCol))
  }

  /** Compact the append-only state: each dataset rewrites as one sorted,
    * deduplicated snapshot (range-partitioned so parquet min/max stats
    * prune probe joins). Run periodically — every batch appends a few
    * files, and compaction bounds the small-file count without changing
    * any dedupe outcome. The rewrite materializes fully into a staging
    * dir before the old files are swapped out.
    */
  def compactState(spark: org.apache.spark.sql.SparkSession,
      statePath: String): Unit = {
    recoverCompaction(statePath) // restore any prior crashed swap first
    def compact(sub: String, sortCols: Seq[String]): Unit = {
      val p = Paths.get(s"$statePath/$sub")
      if (!Files.exists(p)) return
      val tmp = s"$statePath/.compact_$sub"
      spark.read.parquet(p.toString).distinct()
        .repartitionByRange(sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.mode("overwrite").parquet(tmp)
      def rmrf(d: java.nio.file.Path): Unit =
        if (Files.exists(d)) {
          import scala.jdk.CollectionConverters._
          Files.walk(d).iterator.asScala.toSeq.reverse.foreach(Files.delete)
        }
      // swap by rename-aside: the live dataset is absent only between
      // two renames (not during the whole rewrite job), and a crash
      // leaves the history recoverable in .old_<sub>
      val old = Paths.get(s"$statePath/.old_$sub")
      rmrf(old)
      Files.move(p, old)
      Files.move(Paths.get(tmp), p)
      rmrf(old)
    }
    compact("exact", Seq("fp"))
    compact("shingles", Seq("id"))
    compact("buckets", Seq("bucket", "band"))
  }
}
