package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkFixture
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Property-style invariants over the text/dedup/similarity operators:
  * seeded scalacheck generators (deterministic — no runtime randomness)
  * produce input corpora that are checked in ONE Spark job per property
  * against independent JVM-side models.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)
  private val text: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  /** Deterministic sample set from a generator. */
  private def samples(g: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(20240801L + i)))

  test("whitespace token count equals the split model on generated text") {
    import spark.implicits._
    val texts = samples(text, 200)
    val got = texts.toDF("t")
      .select(col("t"), TextAnalysis.tokenCount(col("t")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    got.foreach { case (s, n) =>
      assert(n == s.trim.split("\\s+").length.toLong, s"text='$s'")
    }
  }

  test("bpe token count is 0 iff the text is blank, else positive") {
    import spark.implicits._
    val texts = samples(text, 200)
    texts.toDF("t")
      .select(col("t"), TextAnalysis.bpeTokenCount(col("t")).as("n"))
      .collect().foreach { r =>
        if (r.getString(0).trim.isEmpty) assert(r.getLong(1) == 0L)
        else assert(r.getLong(1) >= 1L, s"text='${r.getString(0)}'")
      }
  }

  test("fingerprint is whitespace/case-insensitive and content-sensitive") {
    import spark.implicits._
    val texts = samples(text, 200)
    val rows = texts.map(s => (s, "  " + s.toUpperCase.replace(" ", "   ") + " "))
    val got = rows.toDF("a", "b").select(
      TextAnalysis.fingerprint(col("a")).as("fa"),
      TextAnalysis.fingerprint(col("b")).as("fb"),
      col("a")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"text='${r.getString(2)}'"))
    // distinct normalized content → distinct fingerprints (md5 injective
    // for practical purposes)
    def norm(s: String) = s.trim.toLowerCase.split("\\s+").mkString(" ")
    val byNorm = texts.groupBy(norm)
    val fps = texts.toDF("a")
      .select(col("a"), TextAnalysis.fingerprint(col("a")).as("f"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    byNorm.values.flatten.groupBy(s => fps(s)).foreach { case (_, same) =>
      assert(same.map(norm).toSet.size == 1)
    }
  }

  test("jaccard is symmetric, bounded in [0,1], and 1 on self") {
    import spark.implicits._
    val nonEmpty = samples(text.suchThat(_.trim.nonEmpty), 100)
    val pairs = nonEmpty.zip(nonEmpty.reverse)
    val got = pairs.toDF("a", "b").select(
      Dedup.jaccard(Dedup.shingleHashes(col("a"), 2),
        Dedup.shingleHashes(col("b"), 2)).as("ab"),
      Dedup.jaccard(Dedup.shingleHashes(col("b"), 2),
        Dedup.shingleHashes(col("a"), 2)).as("ba"),
      Dedup.jaccard(Dedup.shingleHashes(col("a"), 2),
        Dedup.shingleHashes(col("a"), 2)).as("aa")).collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // symmetric
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(2) == 1.0) // identical shingle sets
    }
  }

  test("minhash signatures are deterministic with the declared width") {
    import spark.implicits._
    val texts = samples(text.suchThat(_.trim.nonEmpty), 100)
    val sigs = (texts ++ texts).toDF("t")
      .select(col("t"), Dedup.minhashSignature(col("t"), 2, 8).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1))
    sigs.groupBy(_._1).values.foreach { same =>
      assert(same.map(_._2).distinct.size == 1) // same text → same sig
      assert(same.head._2.length == 8)
    }
  }

  test("simhash distance stays within the 60-bit space; 0 on self") {
    import spark.implicits._
    val nonEmpty = samples(text.suchThat(_.trim.nonEmpty), 100)
    val got = nonEmpty.zip(nonEmpty.reverse).toDF("a", "b").select(
      Dedup.simhash60(col("a")).as("ha"),
      Dedup.simhash60(col("b")).as("hb")).collect()
    got.foreach { r =>
      val d = java.lang.Long.bitCount(r.getLong(0) ^ r.getLong(1))
      assert(d >= 0 && d <= 60)
    }
  }

  test("tuneBanding always returns a valid factorization") {
    for (h <- Seq(8, 16, 32, 64); tau <- Seq(0.1, 0.3, 0.5, 0.7, 0.9)) {
      val (b, r) = Similarity.tuneBanding(h, tau)
      assert(b * r == h && b >= 1 && r >= 1, s"h=$h tau=$tau")
    }
  }
}
