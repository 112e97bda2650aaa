package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture
import graft.similarity.Similarity

/** Scratch profile harness for the 2-level IVF stages (not part of the
  * census claims — delete or keep as a timing canary).
  */
class HierIvfProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("stage timings at the 30x tier (skipped when tier absent)") {
    val d = "/tmp/graft_scale30x"
    assume(new java.io.File(s"$d/embeddings.parquet").exists())
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, d).localCheckpoint(true)
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[hier-prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val idx = new Similarity.HierIvfIndex(k = 16384, nprobe = 2048)
    val (sup, ch) = t("train")(idx.train(emb, "vec_id", "embedding"))
    val assigned = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
      .withColumn("cid", idx.cidCol($"vec", sup, ch))
    t("assign+agg")(assigned.agg(sum($"cid")).collect()) // forces cid eval
    t("assign+count")(assigned.count())
    val qs = emb.filter($"vec_id" < 5)
    val probed = qs.select($"vec_id".as("qid"), $"embedding".as("qvec"))
      .withColumn("cid", explode(idx.probeCidsPublic($"qvec", sup, ch)))
    t("probe-explode")(probed.count())
    val cands = probed.join(
      assigned.withColumnRenamed("id", "cand_id"), "cid")
    t("cand-join")(cands.count())
    t("annTopKTrained")(idx.annTopKTrained(sup, ch, emb, "vec_id",
      "embedding", qs, "vec_id", "embedding", 10).count())
    t("brute")(Similarity.knnBruteForce(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", 10).count())
  }

  test("batch probe per-row cost at the 30x tier: codegen vs " +
      "interpreted (skipped when tier absent)") {
    val d = "/tmp/graft_scale30x"
    assume(new java.io.File(s"$d/embeddings.parquet").exists())
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, d).localCheckpoint(true)
    val nRows = emb.count()
    val gen = new Similarity.HierIvfIndex(k = 16384, nprobe = 2048)
    val interp = new Similarity.HierIvfIndex(k = 16384, nprobe = 2048,
      codegenProbe = false)
    val (sup, ch) = gen.train(emb, "vec_id", "embedding")
    def perRow(label: String, idx: Similarity.HierIvfIndex): Double = {
      // warm once (codegen compile, JIT), then measure
      emb.limit(64)
        .select(size(idx.probeCidsPublic($"embedding", sup, ch)).as("s"))
        .agg(sum($"s")).collect()
      val t0 = System.nanoTime()
      emb.select(size(idx.probeCidsPublic($"embedding", sup, ch)).as("s"))
        .agg(sum($"s")).collect()
      val us = (System.nanoTime() - t0) / 1e3 / nRows
      println(f"[hier-prof] batch-probe $label: $us%.1f us/row over $nRows rows")
      us
    }
    val usGen = perRow("codegen", gen)
    perRow("interpreted", interp)
    // the serving contract: µs-class per probe row at the 16384-list
    // shape (wall/row, 32 local threads — i.e. core-µs within ~100x)
    assert(usGen < 1000.0, f"codegen batch probe $usGen%.1f us/row")
  }
}
