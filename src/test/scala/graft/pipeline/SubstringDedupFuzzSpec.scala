package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.dedup.Dedup

/** Differential fuzz for exact substring dedup: random corpora over a
  * tiny token alphabet (so k-token windows collide often) run through
  * [[Dedup.substringSpans]] and through an independent ~20-line Scala
  * model (window multiset → duplicated set → interval merge). The
  * PipelineSpec case pins seven hand-built edge cases; this covers the
  * combinational space around them — span fragmentation, whole-doc
  * duplication, repeats within one document, docs at exactly k tokens,
  * and empty/short docs.
  *
  * Seed env-tunable via GRAFT_SUBSTR_FUZZ_SEED, doc count via
  * GRAFT_SUBSTR_FUZZ_N (default 60 docs × 3 rounds with k ∈ {2,3,5}).
  */
class SubstringDedupFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val seed =
    sys.env.getOrElse("GRAFT_SUBSTR_FUZZ_SEED", "20260816").toLong
  private val nDocs =
    sys.env.getOrElse("GRAFT_SUBSTR_FUZZ_N", "60").toInt

  /** Independent model: duplicated k-windows merged into maximal spans.
    * Tokenization mirrors the Spark side exactly: split(trim(text)) on
    * whitespace — blank text still yields one empty token.
    */
  private def model(docs: Seq[(Long, String)],
      k: Int): Seq[(Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val wins: Seq[(Long, Int, String)] = toks.flatMap { case (id, ts) =>
      (0 to ts.length - k).map(i => (id, i, ts.slice(i, i + k).mkString(" ")))
    }
    val dupSet = wins.groupBy(_._3).filter(_._2.size > 1).keySet
    val byDoc = wins.filter(w => dupSet.contains(w._3))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    toks.map { case (id, ts) =>
      val positions = byDoc.getOrElse(id, Seq.empty)
      // interval merge of [p, p+k): extend the open span while p <= its
      // end (adjacent coalesces), otherwise start a new one
      var spans = List.empty[(Int, Int)]
      positions.foreach { p =>
        spans match {
          case (s, e) :: rest if p <= e => spans = (s, math.max(e, p + k)) :: rest
          case _ => spans = (p, p + k) :: spans
        }
      }
      val dupToks = spans.map { case (s, e) => (e - s).toLong }.sum
      (id, ts.length.toLong, spans.size.toLong, dupToks,
        ts.length.toLong - dupToks)
    }.sortBy(_._1)
  }

  test(s"substringSpans matches the window/merge model (seed=$seed)") {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    for (k <- Seq(2, 3, 5)) {
      val alphabet = Vector("aa", "bb", "cc", "dd", "ee")
      val docs: Seq[(Long, String)] = (1L to nDocs.toLong).map { id =>
        val len = rnd.nextInt(14) // 0..13 tokens — includes < k and == k
        val body = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size)))
        id -> body.mkString(" ")
      }
      val got = Dedup.substringSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", k)
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      val want = model(docs, k)
      assert(got == want, s"k=$k diverged\n got=$got\nwant=$want")

      // the removal pass against the same model's covered-index set
      val gotClean = Dedup.substringClean(docs.toDF("doc_id", "text"),
          "doc_id", "text", k)
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      val wantClean = cleanModel(docs, k)
      assert(gotClean == wantClean,
        s"k=$k clean diverged\n got=$gotClean\nwant=$wantClean")
    }
  }

  /** Removal-pass model: drop tokens covered by any duplicated window. */
  private def cleanModel(docs: Seq[(Long, String)],
      k: Int): Seq[(Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val wins: Seq[(Long, Int, String)] = toks.flatMap { case (id, ts) =>
      (0 to ts.length - k).map(i => (id, i, ts.slice(i, i + k).mkString(" ")))
    }
    val dupSet = wins.groupBy(_._3).filter(_._2.size > 1).keySet
    val covByDoc = wins.filter(w => dupSet.contains(w._3))
      .groupBy(_._1).view
      .mapValues(_.flatMap(w => w._2 until w._2 + k).toSet).toMap
    toks.map { case (id, ts) =>
      val cov = covByDoc.getOrElse(id, Set.empty)
      // zero-length tokens dropped, mirroring the engine: a blank doc
      // keeps 0 tokens, not the phantom [""] of split-on-blank
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !cov(i) && t.nonEmpty => t
      }
      (id, kept.size.toLong, kept.mkString(" "))
    }.sortBy(_._1)
  }
}
