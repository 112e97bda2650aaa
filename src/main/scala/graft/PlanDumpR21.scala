package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Round-21 plan/stage evidence, to `plans/r21/` (same conventions as
  * [[PlanDump]]: every "before" is generated at THIS head with the
  * named change toggled off — the save-parallelism conf, the m02
  * checkpoint variant — so each pair isolates exactly one change).
  *
  * Run: `sbt "runMain graft.PlanDumpR21 /root/testdata/sf0.01 plans/r21"`.
  */
object PlanDumpR21 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "plans/r21"
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

    def write(file: String, content: String): Unit = {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$file.txt"),
        content.getBytes("UTF-8"))
      println(s"wrote $outDir/$file.txt")
    }
    def dump(file: String, header: String, df: => DataFrame): Unit =
      write(file, header.stripMargin.trim + "\n\n" +
        df.queryExecution.explainString(FormattedMode))

    // ---- save-class rows (gql34/36/37/38/39): the r21 change runs the
    // dirty staging writes as CONCURRENT jobs. The query plan is
    // untouched — the evidence is GraphCatalog.lastSaveStages wall
    // clocks with the concurrency toggled off (parallelism=1 == the r20
    // serial chain) vs on (default 3), at the same HEAD.
    def saveStages(label: String): String = {
      val t0 = System.nanoTime()
      SparkEntry.queries("gql38_reverse_hop")(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      f"[$label] gql38 total ${total}%.3f s; stages: " +
        graft.graph.GraphCatalog.lastSaveStages
          .map { case (k, v) => f"$k=$v%.3f" }.mkString(", ")
    }
    saveStages("warm-up (unmeasured)") // JVM/codegen/footer warm-up
    spark.conf.set("spark.graft.save.parallelism", "1")
    val serial =
      try saveStages("save.parallelism=1 (r20 serial chain)")
      finally spark.conf.unset("spark.graft.save.parallelism")
    val conc = saveStages("save.parallelism=3 (r21 default)")
    write("gql38_save_stages_before_after",
      """# gql38_reverse_hop — serial vs concurrent staging writes (r21).
        |# The r21 change is job SCHEDULING, not plan shape: saveGraph
        |# submits the four independent dirty writes (nodes_customer,
        |# nodes_orders, edges_PLACED, .mirror_edges_PLACED) from a pool
        |# of 3 instead of back to back. "Before" = the same HEAD with
        |# spark.graft.save.parallelism=1, which IS the r20 serial chain.
        |# Stage entries time each write's own wall — under concurrency
        |# they overlap, so the entries sum to MORE than the elapsed save
        |# while the row total drops. Both runs in this file executed
        |# back to back on one JVM (warm).
        |""".stripMargin + "\n" + serial + "\n" + conc + "\n")

    // ---- m02: media generator materialized once (localCheckpoint) —
    // the resize branch now scans an ExistingRDD instead of re-running
    // the WAV/BMP/PNG encoders per branch. (The ImageIO cache fix is
    // JVM state, invisible in plans — PipelineSpec pins getUseCache and
    // OPTIMIZATION_r21.md carries the 8/32-core wall table.)
    import graft.multimodal.Multimodal
    def m02Shape(media: org.apache.spark.sql.Dataset[Multimodal.MediaRecord])
        : DataFrame = {
      import spark.implicits._
      val resized = Multimodal.resizeStage(media, 64, 64).toDF()
        .select($"media_id", $"kind", $"format",
          $"src_width".cast("long").as("src_width"),
          $"src_height".cast("long").as("src_height"),
          $"width".cast("long").as("width"),
          $"height".cast("long").as("height"),
          $"px_mean",
          lit(0L).as("n_frames_sampled"), lit(0L).as("sample_sum"))
      val frames = Multimodal.frameSampleStage(media, everyN = 97).toDF()
        .groupBy($"media_id", $"kind", $"format")
        .agg(count(lit(1)).as("n_frames_sampled"),
          sum($"frame_value").as("sample_sum"))
        .select($"media_id", $"kind", $"format",
          lit(0L).as("src_width"), lit(0L).as("src_height"),
          lit(0L).as("width"), lit(0L).as("height"),
          lit(0.0).as("px_mean"), $"n_frames_sampled", $"sample_sum")
      resized.unionByName(frames).orderBy($"media_id")
    }
    dump("m02_multimodal_stages_before",
      """# m02_multimodal_stages — BEFORE (r20 shape, no checkpoint): both
        |# union branches re-evaluate syntheticMediaMixed — every WAV/BMP/
        |# PNG file encodes twice (two SerializeFromObject→MapPartitions
        |# chains over the documents scan).""",
      m02Shape(Multimodal.syntheticMediaMixed(Tables.documents(spark, sfDir))))
    dump("m02_multimodal_stages_after",
      """# m02_multimodal_stages — AFTER (r21): the synthesized media
        |# materializes ONCE (localCheckpoint) and both branches read the
        |# checkpointed rows (Scan ExistingRDD), so the generator runs
        |# once per query instead of twice. The ImageIO disk-cache fix
        |# (the m02 32-core collapse, r20 verdict #3) is JVM state:
        |# getUseCache=false is pinned in PipelineSpec; measured walls in
        |# OPTIMIZATION_r21.md.""",
      m02Shape(Multimodal.syntheticMediaMixed(Tables.documents(spark, sfDir))
        .localCheckpoint(true)))

    // ---- e10: the probe cost change is INSIDE HierProbeHelper (norm
    // precompute + interleaved dots + radix ranking) — the plan carries
    // the same graft_hier_probe_gen node before and after. Committed
    // evidence: the POST-AQE final plan, which shows the Generate inside
    // a WholeStageCodegen span (`*(n) Generate`) and the join broadcast
    // side AQE actually picks — the two things the r20 verdict's item #4
    // asked to confirm or fix.
    val emb = Tables.embeddings(spark, sfDir)
    val qs = {
      val base = emb.filter(col("vec_id") < 500)
      base.unionByName(base.withColumn("vec_id", col("vec_id") + 10000))
    }
    val e10df = new graft.similarity.Similarity.HierIvfIndex(
        k = graft.queries.PipelineQueries.HierK,
        nprobe = graft.queries.PipelineQueries.HierNprobe)
      .annTopK(emb, "vec_id", "embedding", qs, "vec_id", "embedding", 10)
    e10df.collect() // AQE finalizes THIS QueryExecution
    write("e10_hier_probe_batch_final_executed",
      """# e10 batch probe — POST-AQE FINAL EXECUTED PLAN (r21).
        |# Two pins the r20 verdict's item #4 asked for:
        |#  - the probe Generate runs INSIDE a WholeStageCodegen span:
        |#    look for the `*(n) Generate explode(graft_hier_probe_gen`
        |#    prefix below (the r20 "half-fused" reading came from the
        |#    AQE-initial formatted plan, which never shows codegen
        |#    markers);
        |#  - AQE broadcasts the exploded PROBE side (BuildLeft), so the
        |#    corpus stream is never shuffled by the candidate join.
        |# The r21 per-row probe cost change lives inside HierProbeHelper
        |# (centroid-norm precompute, interleaved dot chains, radix
        |# ranking — bit-identical, parity-pinned in HierIvfSpec):
        |# 236.8 -> 65.9 us/row at the 30x tier, k=16384 nprobe=2048
        |# (HierIvfProfileSpec).
        |""".stripMargin + "\n" + e10df.queryExecution.executedPlan.toString)

    spark.stop()
  }
}
