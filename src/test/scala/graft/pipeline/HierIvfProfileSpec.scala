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
}
