package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture
import graft.similarity.Similarity

/** Hierarchical 2-level IVF (r18 verdict #4): the trainer must reach
  * list counts far past the flat driver-draw cap with bounded draws at
  * every stage, and the index must rank genuinely (recall far above
  * chance) with assignment/probe staying equi-join shaped.
  */
class HierIvfSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def recallAt10(k: Int, nprobe: Int): Double = {
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val emb = graft.Tables.embeddings(spark, d)
    val qs = emb.filter($"vec_id" < 5)
    val approx = new Similarity.HierIvfIndex(k = k, nprobe = nprobe)
      .annTopK(emb, "vec_id", "embedding", qs, "vec_id", "embedding", 10)
    val exact = Similarity.knnBruteForce(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", 10)
    val hits = approx.join(exact.select($"qid", $"id"), Seq("qid", "id"))
      .groupBy($"qid").agg(count(lit(1)).as("n_hit"))
    exact.groupBy($"qid").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("qid"), "left")
      .select((coalesce($"n_hit", lit(0L)) / $"n_exact").as("r"))
      .agg(avg($"r")).head.getDouble(0)
  }

  test("hier IVF k=256 ranks genuinely at sf0.01 (measurement + floor)") {
    for (np <- Seq(32, 96, 160)) {
      val r = recallAt10(256, np)
      info(f"k=256 nprobe=$np recall@10 = $r%.3f")
      println(f"[hier-ivf] k=256 nprobe=$np recall@10 = $r%.3f")
    }
    assert(recallAt10(256, 160) > 0.3)
  }
}
