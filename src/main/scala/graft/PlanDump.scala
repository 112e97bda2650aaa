package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Writes the `.explain("formatted")` before/after evidence for the
  * queries the round-20 optimization work touched, to
  * `plans/r20/<query>_{before,after}.txt`.
  *
  * "Before" is generated at the SAME HEAD with the specific optimization
  * disabled (rule toggle / interpreted expression variant / the pre-r20
  * window key expression), so each pair isolates exactly the change its
  * header names — nothing else about the build differs.
  *
  * Run: `sbt "runMain graft.PlanDump /root/testdata/sf0.01 plans/r20"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "plans/r20"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    def dump(file: String, header: String, df: => DataFrame): Unit = {
      val plan = df.queryExecution.explainString(FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$file.txt"),
        (header.stripMargin.trim + "\n\n" + plan).getBytes("UTF-8"))
      println(s"wrote $outDir/$file.txt")
    }

    // ---- gql39_seeded_reverse_hop: the join-seeded reverse expand.
    // After: BucketDynamicPrune's mirror arm re-points the h2 scan at
    // .mirror_edges_LINKH and injects a DynamicPruningSubquery on the
    // mirror's __ixb (look for "Scan parquet" over ".mirror_edges_LINKH"
    // with "dynamicpruningexpression" in its PartitionFilters).
    // Before: the rule disabled — the h2 hop scans the full main layout
    // (edges_LINKH) with no runtime filter.
    val gql39 = SparkEntry.queries("gql39_seeded_reverse_hop")
    // try/finally: a throw inside the before-dump must not leave the
    // optimizer rule disabled for the rest of a shared JVM (ADVICE r20)
    graft.plans.BucketDynamicPrune.enabled = false
    try dump("gql39_seeded_reverse_hop_before",
      """# gql39_seeded_reverse_hop — BEFORE (BucketDynamicPrune.enabled = false)
        |# The seeded reverse hop h2 reads the FULL src-clustered edges_LINKH
        |# layout: the hop key is the edge's dst, which carries no layout, and
        |# the seed values are runtime join outputs no static rule can see.
        |# Generated at r20 HEAD with the r20 rule toggled off — this is the
        |# exact plan the r19 compiler produced for this shape.""",
      gql39(spark, sfDir))
    finally graft.plans.BucketDynamicPrune.enabled = true
    dump("gql39_seeded_reverse_hop_after",
      """# gql39_seeded_reverse_hop — AFTER (mirror-aware BucketDynamicPrune)
        |# The h2 scan is re-pointed at .mirror_edges_LINKH (dst-clustered
        |# dual) and carries dynamicpruningexpression(__ixb IN subquery) —
        |# the runtime frontier's bucket set prunes the read to O(seed
        |# buckets): 295K vs 4.5M rows read at 30x, 259K vs 15.0M at 100x
        |# (ScaleProbe mirror_dpp_seeded_{swapped,full}).""",
      gql39(spark, sfDir))

    // ---- d25/d26 collapse stage: dedupeNear's exact-duplicate collapse
    // window (IncrementalDedup.scala:296). The declared queries
    // localCheckpoint this stage, so the board rows' final explain can't
    // show it; this reconstructs the exact stage frame (same public
    // expression helpers, same params as d25: n=3, numHashes=32) with
    // the two window partition keys. d26 runs the identical stage three
    // times (commit + crash-retry + run 2).
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    // the d25/e10 parameters come from the queries module itself, so the
    // dump can never silently diverge from the board rows (ADVICE r20)
    def collapseStage(key: org.apache.spark.sql.Column): DataFrame =
      docs.select(col("doc_id").as("id"),
          graft.dedup.Dedup.shingleHashes(col("text"),
            graft.queries.PipelineQueries.NearN).as("shingles"))
        .withColumn("sig",
          graft.dedup.Dedup.minhashFromHashes(col("shingles"),
            graft.queries.PipelineQueries.NearHashes))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(key).orderBy(col("id"))))
        .filter(col("__rn") === 1).drop("__rn")
    dump("d25_d26_collapse_before",
      """# d25/d26 collapse stage — BEFORE (r19 code: window partitioned by
        |# the full sorted shingle array). The Exchange hashpartitions on
        |# array_sort(shingles) — full arrays (hundreds of longs for a long
        |# document) are the shuffle key AND the per-partition sort key.""",
      collapseStage(array_sort(col("shingles"))))
    dump("d25_d26_collapse_after",
      """# d25/d26 collapse stage — AFTER (r20: window partitioned by the
        |# 16-byte unhex(md5(to_json(array_sort(shingles)))) digest, the d22
        |# convention). Same plan shape (one Exchange + Sort + Window), but
        |# the shuffle/sort key is a fixed 16-byte binary instead of the full
        |# array. Board rows d25/d26 unchanged (digest only groups; minhash
        |# equality of grouped rows is set-determined).""",
      collapseStage(unhex(md5(to_json(array_sort(col("shingles")))))))

    // ---- e10_hier_probe_batch: 1000-query batch probe. After: the
    // codegen'd HierProbeCidsGen projection (probe stays inside
    // WholeStageCodegen). Before: the interpreted CodegenFallback
    // HierProbeCids — the projection stage drops out of codegen.
    // Dumped frame = the approx (annTopK) side, where the probe
    // expression lives; the declared e10 row joins it to the cached
    // exact answer for the recall gate.
    val emb = Tables.embeddings(spark, sfDir)
    val qs = {
      val base = emb.filter(col("vec_id") < 500)
      base.unionByName(
        base.withColumn("vec_id", col("vec_id") + 10000))
    }
    dump("e10_hier_probe_batch_before",
      """# e10 batch probe — BEFORE (interpreted HierProbeCids,
        |# codegenProbe = false). The probe generator at node (10) is
        |# `graft_hier_probe(qvec, [[F@..., [[[F@..., pSup, nprobe)` — a
        |# CodegenFallback expression whose matrix arguments are boxed plan
        |# objects, interpreted per row (301 us/row at 30x, k=16384 —
        |# HierIvfProfileSpec).""",
      new graft.similarity.Similarity.HierIvfIndex(
          k = graft.queries.PipelineQueries.HierK,
          nprobe = graft.queries.PipelineQueries.HierNprobe,
          codegenProbe = false)
        .annTopK(emb, "vec_id", "embedding", qs, "vec_id", "embedding", 10))
    dump("e10_hier_probe_batch_after",
      """# e10 batch probe — AFTER (HierProbeCidsGen): node (10)'s generator
        |# is `graft_hier_probe_gen(qvec, HierProbeHelper@...)` — a
        |# doGenCode expression calling one shared primitive-float-matrix
        |# helper per row (no per-call boxing): 249 us/row at 30x, k=16384
        |# (HierIvfProfileSpec, gated < 1 ms). Bit-identical cid lists to
        |# the interpreted variant, and the Project shape's WholeStageCodegen
        |# span is pinned, both in HierIvfSpec ("codegen'd batch probe").""",
      new graft.similarity.Similarity.HierIvfIndex(
          k = graft.queries.PipelineQueries.HierK,
          nprobe = graft.queries.PipelineQueries.HierNprobe)
        .annTopK(emb, "vec_id", "embedding", qs, "vec_id", "embedding", 10))

    // ---- e09_hier_ivf_bigk: NEW row this round (k=4096 on the driver
    // board — r19 verdict #6); no pre-r20 plan exists. The evidence is
    // the posting-list cid equi-join (no cartesian) at the big-k shape.
    dump("e09_hier_ivf_bigk_after",
      """# e09 hier-IVF k=4096 — NEW row this round (no before-plan: the
        |# row itself is the regression guard the r19 verdict asked for).
        |# Pin: corpus-vs-query matching is a cid equi-join (SortMergeJoin/
        |# ShuffledHashJoin on cid, never a cartesian), assignment is the
        |# fused HierCid codegen expression over primitive matrices.""",
      SparkEntry.queries("e09_hier_ivf_bigk")(spark, sfDir))

    spark.stop()
  }
}
