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
  *  - `<state>/exact`     (fp, rid)             — exact fingerprints +
  *    committing id (rid, string; NULL in pre-r18 files = always-drop)
  *  - `<state>/shingles`  (id, shingles)        — accepted docs' shingle sets
  *  - `<state>/buckets`   (id, band, bucket)    — accepted docs' LSH buckets
  *
  * Crash/retry contract: the returned admissions materialize BEFORE any
  * state append, and the history probe never lets a doc's OWN committed
  * entry suppress it — so re-running a batch whose process died at ANY
  * point (before, between, or after the appends) returns the same
  * admissions the failed attempt would have, and the duplicate state
  * rows it may re-append are semantically inert (every probe is
  * DISTINCT-folded) until [[compactState]] folds them away. Requires
  * ids unique across different batches.
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
    * A Bloom sidecar (`<state>/exact_bloom2`, merged incrementally per
    * batch) pre-filters the history probe: rows whose fingerprint the
    * bloom has definitely never seen bypass the anti-join entirely — at
    * scale, the novel majority of each batch never shuffles against the
    * history table, only the maybe-seen minority does. False positives
    * just take the (authoritative) anti-join path, so results are exact.
    * Built and probed by Spark's native bloom expressions — see
    * [[graft.functions.BloomFunctions]].
    */
  def dedupeExact(batch: DataFrame, idCol: String, textCol: String,
      statePath: String): DataFrame = {
    val spark = batch.sparkSession
    recoverCompaction(statePath)
    val path = s"$statePath/exact"
    // RETRY IDEMPOTENCE (r18): state rows carry the committing doc's id
    // (as string — stable across callers' id types), and the history
    // drop rule excludes a doc's OWN committed row. A batch whose
    // process died after the state append can then simply be re-run:
    // its docs match only their own entries and are re-admitted with
    // the same result the crashed attempt would have returned — no
    // "ghost suppression" where a fingerprint lives in state but its
    // document surfaced in no successful run's output. Requires ids
    // unique across DIFFERENT batches (the existing contract). Legacy
    // state files lack the id column; their rows read as NULL and drop
    // every probe (the old always-drop behavior).
    // v2 sidecar: keys are xxhash64(fp), built DISTRIBUTED by Spark's
    // BloomFilterAggregate and probed by the native BloomFilterMightContain
    // predicate (codegen stage, no Scala UDF, no driver-side build). The
    // retired v1 sidecar hashed raw strings — incompatible key space, so
    // its presence is simply ignored and a fresh v2 rebuilds from history.
    val bloomPath = Paths.get(s"$statePath/exact_bloom2")
    val fp = batch.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    val batchKeep = fp.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    var keep = batchKeep
    val hasHistory = Files.exists(Paths.get(path))
    // a sidecar whose insert count has run far past its (possibly conf-
    // clamped) capacity answers "maybe seen" for most keys — probing it
    // only adds a pass over the batch before the same anti-join runs
    // anyway, so a saturated filter is bypassed outright
    val metaAtProbe = readBloomMeta(bloomPath)
    val bloomSaturated = metaAtProbe.exists { case (cap, ins) => ins > 4 * cap }
    if (bloomSaturated)
      System.err.println(s"[incremental-dedup] bloom sidecar saturated " +
        s"(inserted ${metaAtProbe.get._2} > 4x capacity ${metaAtProbe.get._1}); " +
        "probing skipped — raise spark.sql.optimizer.runtime.bloomFilter." +
        "maxNumItems/maxNumBits to restore the pre-filter at this corpus size")
    if (hasHistory) {
      // mergeSchema: appends may mix legacy (fp) and current (fp, rid)
      // footers; a missing rid column reads as NULL (always-drop)
      val history0 = spark.read.option("mergeSchema", "true").parquet(path)
      val history = (if (history0.columns.contains("rid")) history0
        else history0.withColumn("rid", lit(null).cast("string")))
        .select(col("fp").as("__hfp"), col("rid").as("__rid"))
      // drop iff some history row carries this fingerprint under a
      // DIFFERENT (or legacy-unknown) id — a doc's own committed row
      // does not suppress its retry
      def dropRule(b: DataFrame) =
        b.join(history, b("__fp") === col("__hfp") &&
          (col("__rid").isNull ||
            col("__rid") =!= b(idCol).cast("string")), "left_anti")
      keep =
        if (Files.exists(bloomPath) && !bloomSaturated) {
          val bytes = Files.readAllBytes(bloomPath)
          // NULL fingerprints hash to the seed constant: at worst they
          // probe "maybe seen" and take the authoritative anti-join,
          // where NULL never equi-matches — so they survive, exactly
          // like the plain path
          val mightSeen =
            graft.functions.BloomFunctions.mightContain(spark, bytes, col("__fp"))
          val novel = batchKeep.filter(!mightSeen)
          val candidates = dropRule(batchKeep.filter(mightSeen))
          novel.unionByName(candidates)
        } else dropRule(batchKeep)
    }
    val out = keep.localCheckpoint(true)
    // Bloom invariants:
    //  - the sidecar must NEVER under-cover the history table (a false
    //    negative would skip the authoritative anti-join and admit a
    //    duplicate). Hence a missing sidecar over existing history
    //    rebuilds from the FULL history, and the merged bloom saves
    //    BEFORE the parquet append — a crash between the two leaves it
    //    over-covering, which only routes rows to the exact join.
    //  - capacity is ADAPTIVE: it starts small and grows by rebuild (the
    //    meta sidecar tracks capacity + inserted count; once inserted
    //    exceeds half the capacity, the next commit rebuilds at 4× the
    //    corpus). A fixed cluster-scale capacity would make every small
    //    run pay a multi-MB bitset through the aggregate shuffle and the
    //    probe plan; adaptive sizing keeps the filter proportional to
    //    the corpus at every scale, with amortized O(1) rebuild cost.
    def buildBloom(df: DataFrame, capacity: Long): Array[Byte] =
      df.agg(graft.functions.BloomFunctions
        .agg(spark, col("__fp"), capacity, 0.01).as("bf"))
        .head.getAs[Array[Byte]]("bf") // null on empty input
    // capacity is clamped to what BloomFilterAggregate will actually
    // honor (it silently caps numItems/numBits at the session's runtime
    // bloom confs — see BloomFunctions.maxHonoredCapacity); without the
    // clamp, the meta sidecar would record a capacity the filter never
    // had and the rebuild-at-half-capacity trigger would stop restoring
    // 1% fpp past ~2M fingerprints
    val maxCap = math.max(MinBloomCapacity,
      graft.functions.BloomFunctions.maxHonoredCapacity(spark, 0.01))
    var clampLogged = false
    def nextCapacity(n: Long): Long = {
      var c = MinBloomCapacity
      while (c < 4 * n && (c << 1) <= maxCap) c <<= 1
      if (c < 4 * n && !clampLogged) {
        clampLogged = true
        System.err.println(s"[incremental-dedup] bloom capacity clamped to " +
          s"$c by spark.sql.optimizer.runtime.bloomFilter.maxNumItems/" +
          s"maxNumBits (corpus $n); fpp degrades above this size")
      }
      c
    }
    val outCount = out.count()
    val meta = metaAtProbe // nothing touches the sidecar between reads
    val needRebuild = (hasHistory && !Files.exists(bloomPath)) ||
      (Files.exists(bloomPath) && meta.isEmpty) ||
      // a rebuild only helps if it can actually grow the filter — once
      // nextCapacity is pinned at the conf clamp, rebuilding the full
      // history at the same size every batch would be pure overhead
      meta.exists { case (cap, ins) =>
        (ins + outCount) * 2 > cap && nextCapacity(ins + outCount) > cap }
    if (outCount > 0 || needRebuild) {
      val hist =
        if (Files.exists(Paths.get(path)))
          Some(spark.read.parquet(path).select(col("fp").as("__fp")))
        else None
      val (mergedBytes, newMeta): (Array[Byte], (Long, Long)) =
        if (needRebuild || meta.isEmpty) {
          // one distributed pass over history ∪ batch survivors, at a
          // capacity sized 4× the full corpus
          val full = (hist.toSeq :+ out.select("__fp")).reduce(_ unionByName _)
          val total = hist.map(_.count()).getOrElse(0L) + outCount
          val cap = nextCapacity(total)
          (buildBloom(full, cap), (cap, total))
        } else {
          val (cap, ins) = meta.get
          val newBytes = buildBloom(out.select("__fp"), cap)
          try {
            val merged = loadBloom(bloomPath)
              .mergeInPlace(deserializeBloom(newBytes))
            (serializeBloom(merged), (cap, ins + outCount))
          } catch {
            case _: org.apache.spark.util.sketch.IncompatibleMergeException =>
              val full = (hist.toSeq :+ out.select("__fp"))
                .reduce(_ unionByName _)
              val total = hist.map(_.count()).getOrElse(0L) + outCount
              val cap2 = nextCapacity(total)
              (buildBloom(full, cap2), (cap2, total))
          }
        }
      // an all-empty history+batch yields no filter — nothing to save
      if (mergedBytes != null) {
        saveBloomBytes(bloomPath, mergedBytes)
        saveBloomMeta(bloomPath, newMeta._1, newMeta._2)
      }
    }
    out.select(col("__fp").as("fp"),
        col(idCol).cast("string").as("rid"))
      .write.mode("append").parquet(path)
    out.drop("__fp")
  }

  /** Smallest sidecar capacity (≈80 KB of bits at 1 % fpp); doubles by
    * rebuild as the corpus grows — see the invariant note in
    * [[dedupeExact]].
    */
  val MinBloomCapacity: Long = 1L << 16

  private def bloomMetaPath(p: java.nio.file.Path): java.nio.file.Path =
    p.resolveSibling(p.getFileName.toString + ".meta")

  /** (capacity, inserted) recorded next to the sidecar; None when absent
    * or unreadable (treated as "rebuild", never trusted blindly).
    */
  private def readBloomMeta(p: java.nio.file.Path): Option[(Long, Long)] =
    try {
      val parts = Files.readString(bloomMetaPath(p)).trim.split(",")
      Some((parts(0).toLong, parts(1).toLong))
    } catch { case _: Exception => None }

  private def saveBloomMeta(p: java.nio.file.Path, capacity: Long,
      inserted: Long): Unit = {
    val mp = bloomMetaPath(p)
    val tmp = mp.resolveSibling(mp.getFileName.toString + ".tmp")
    Files.writeString(tmp, s"$capacity,$inserted")
    Files.move(tmp, mp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
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

  private def loadBloom(p: java.nio.file.Path): org.apache.spark.util.sketch.BloomFilter =
    deserializeBloom(Files.readAllBytes(p))

  private def deserializeBloom(bytes: Array[Byte]): org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))

  private def serializeBloom(
      bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  private def saveBloomBytes(p: java.nio.file.Path, bytes: Array[Byte]): Unit = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, bytes)
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

    // one md5 pass per doc, then EXACT-duplicate shingle sets collapse
    // to their min id BEFORE the LSH join; everything downstream reads
    // the single materialized representative frame. The collapse is
    // bit-equivalent to the pair rule: identical sets share every band
    // bucket (minhash is a set function) and confirm at jaccard exactly
    // 1 >= tau, so every non-minimum group member drops no matter what
    // else is in the batch, and the minimum's fate against OTHER
    // sets/state depends only on its set — which the representative
    // carries. Without it, a corpus with a large exact-duplicate group
    // (the NORM in production dedup corpora) is a clique in the
    // candidate join: one (band, bucket) key holding the whole group
    // turns into a single ~|group|²-pair straggler task. One window
    // shuffle on a 16-byte DIGEST of the sorted set (the d22 unhex-md5
    // convention — r19 verdict #3: partitioning the window by the full
    // sorted array made the per-partition sort compare hundreds of
    // longs per long document; md5 collisions are beyond corpus-scale
    // odds and the digest is internal, never surfaced), folded into the
    // same materialization.
    val sigs = batch.select(col(idCol).as("id"),
        Dedup.shingleHashes(col(textCol), n).as("shingles"))
      .withColumn("sig", Dedup.minhashFromHashes(col("shingles"), numHashes))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(unhex(md5(to_json(array_sort(col("shingles"))))))
          .orderBy(col("id"))))
      .filter(col("__rn") === 1).drop("__rn")
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
        // retry idempotence (r18, same contract as dedupeExact): a
        // doc's own committed state entry must not suppress its re-run
        // — exclude self-pairs, so re-processing a crashed batch
        // returns exactly what the crashed attempt would have
        .filter(col("id") =!= col("old_id"))
        .select("id", "old_id").distinct()
      val dupVsState = candOld
        .join(keep.select(col("id"), col("shingles").as("sh_new")), "id")
        .join(stShingles, "old_id")
        .filter(Dedup.jaccard(col("sh_new"), col("sh_old")) >= tau)
        .select("id").distinct()
      keep = keep.join(dupVsState, Seq("id"), "left_anti")
    }

    val out = keep.localCheckpoint(true)
    // the two state appends are independent — both read only the
    // checkpointed survivor rows (and sigs, also checkpointed) and
    // target different directories — so they run as CONCURRENT jobs
    // (guide §2.6), overlapping each other's commit tails. Crash
    // semantics are unchanged in kind: the serial order could already
    // leave "shingles without buckets"; concurrency adds the mirror
    // window ("buckets without shingles"), and the state probe treats
    // both identically — a candidate pair whose old_id lacks its
    // shingles row simply fails to confirm, and the crashed batch's
    // retry re-admits the same rows (the self-pair exclusion never
    // needs both datasets to agree). dedupeExact's bloom-then-append
    // order, by contrast, IS an invariant (an early append could leave
    // an under-covering bloom = false negatives) and stays serial.
    val appendPool = java.util.concurrent.Executors.newFixedThreadPool(2,
      (r: Runnable) => {
        val t = new Thread(r, "graft-near-state-append")
        t.setDaemon(true); t
      })
    try {
      val fShingles = appendPool.submit(new Runnable {
        def run(): Unit = out.select("id", "shingles")
          .write.mode("append").parquet(shinglesPath)
      })
      val fBuckets = appendPool.submit(new Runnable {
        def run(): Unit = newBuckets.join(out.select("id"), "id")
          .select("id", "band", "bucket")
          .write.mode("append").parquet(bucketsPath)
      })
      def await(f: java.util.concurrent.Future[_]): Unit =
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException => throw e.getCause
        }
      await(fShingles); await(fBuckets)
    } finally appendPool.shutdownNow()
    batch.join(out.select(col("id").as(idCol)).distinct(), Seq(idCol))
  }

  /** Streaming front door for the cross-run exact dedup: fingerprint a
    * DOCUMENT stream, drop in-stream duplicates within the watermark
    * (`dropDuplicatesWithinWatermark` keys state on the fingerprint and
    * evicts it as the watermark advances — bounded state, unlike a plain
    * dropDuplicates), then remove documents already committed to a batch
    * [[dedupeExact]] state dir via a stream-static LEFT ANTI join on the
    * history parquet. The history is SNAPSHOTTED at stream start (the
    * parquet file listing is captured when the static frame is created;
    * Spark does not re-list it per micro-batch), so the contract is the
    * standard lambda-architecture one: batch commits that land while the
    * stream runs become visible at the next stream (re)start, and
    * [[compactState]] must not rewrite the history under a running
    * stream (the snapshotted listing would dangle). Within that contract
    * the probe is exact — no bloom approximation.
    *
    * Batch mode is exact by construction (the within-watermark dedup is
    * replaced with plain dropDuplicates — Spark rejects the watermark
    * form on batch frames — and the anti join reads current history), so
    * a batch run of this function is the oracle for the streaming run —
    * same contract as EventPipeline.dedupWithinWatermark.
    *
    * Returns the input columns of surviving (novel) documents. Within a
    * watermark window the FIRST arrival of a fingerprint survives
    * (arrival order, not id order — streams have no total id order).
    */
  def dedupeExactStream(stream: DataFrame, idCol: String, textCol: String,
      tsCol: String, statePath: String,
      watermark: String = "10 minutes"): DataFrame = {
    val spark = stream.sparkSession
    recoverCompaction(statePath)
    val withFp = stream
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
    // Spark rejects the within-watermark form on batch frames outright,
    // so the batch oracle path takes the exact spelling explicitly
    val fp =
      if (stream.isStreaming)
        withFp.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("__fp")
      else withFp.dropDuplicates("__fp")
    val path = s"$statePath/exact"
    val out =
      if (!Files.exists(Paths.get(path))) fp
      else fp.join(
        spark.read.parquet(path).select(col("fp").as("__fp")),
        Seq("__fp"), "left_anti")
    out.drop("__fp")
  }

  /** Exactly-once BATCH COMMIT protocol around the exact incremental
    * dedup — the recovery story a 100 TB ingestion pipeline actually
    * needs ([[dedupeExact]]'s flat append-only state assumes each batch
    * runs once; a driver crash between its state append and the
    * caller's output write would make a re-run drop the whole batch as
    * "already seen").
    *
    * Protocol (idempotent under re-runs from ANY crash point):
    *  1. committed marker exists → the batch fully landed; return the
    *     committed output (re-delivery, not re-admission).
    *  2. survivors compute against COMMITTED batches only — a crashed
    *     attempt's partial state dir is invisible to the history probe
    *     by construction, so the re-run never deduplicates a batch
    *     against its own half-written fingerprints.
    *  3. the batch's fingerprints and its output both write with
    *     OVERWRITE into per-batch directories (a re-run replaces any
    *     partial files), and the marker is created LAST — the single
    *     atomic commit point covering state and output together.
    *
    * State layout: `<state>/exact_batches/ingest_<id>/` (fingerprints),
    * `<out>/<id>/` (surviving rows), `<state>/exact_commits/<id>`
    * (marker). The bloom sidecar is not used on this path — it is a
    * pre-filter optimization of the flat layout; the anti-join here is
    * the authoritative (and only) probe, so results stay exact.
    */
  def dedupeExactCommit(batch: DataFrame, idCol: String, textCol: String,
      statePath: String, outPath: String, batchId: String): DataFrame = {
    require(batchId.matches("[A-Za-z0-9_-]+"), s"unsafe batch id: $batchId")
    val spark = batch.sparkSession
    val commits = Paths.get(s"$statePath/exact_commits")
    val marker = commits.resolve(batchId)
    val outDir = s"$outPath/$batchId"
    if (Files.exists(marker)) return spark.read.parquet(outDir)
    val committedDirs: Seq[String] =
      if (!Files.exists(commits)) Seq.empty
      else {
        import scala.jdk.CollectionConverters._
        val listing = Files.list(commits)
        // Files.list leaks a directory handle unless closed (ADVICE r16)
        val ids = try listing.iterator.asScala
          .map(_.getFileName.toString).toSeq finally listing.close()
        ids.map(id => s"$statePath/exact_batches/ingest_$id")
          .filter(d => Files.exists(Paths.get(d))).sorted
      }
    val fp = batch.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    var keep = fp.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    if (committedDirs.nonEmpty)
      keep = keep.join(
        spark.read.parquet(committedDirs: _*).select(col("fp").as("__fp")),
        Seq("__fp"), "left_anti")
    // checkpoint before the two writes: both must see the SAME survivor
    // set, and the second write must not recompute a lineage that reads
    // state the first write just changed
    val out = keep.localCheckpoint(true)
    out.select(col("__fp").as("fp")).write.mode("overwrite")
      .parquet(s"$statePath/exact_batches/ingest_$batchId")
    out.drop("__fp").write.mode("overwrite").parquet(outDir)
    Files.createDirectories(commits)
    Files.createFile(marker) // the commit point
    spark.read.parquet(outDir)
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
      // mergeSchema: the exact dataset may mix legacy (fp) and current
      // (fp, rid) footers — a one-footer read would silently drop the
      // retry-id column from the compacted snapshot
      spark.read.option("mergeSchema", "true").parquet(p.toString).distinct()
        .repartitionByRange(sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.mode("overwrite").parquet(tmp)
      def rmrf(d: java.nio.file.Path): Unit =
        if (Files.exists(d)) {
          import scala.jdk.CollectionConverters._
          val w = Files.walk(d) // closed: fd-leak class (ADVICE r16)
          val all = try w.iterator.asScala.toSeq finally w.close()
          all.reverse.foreach(Files.delete)
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
