package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics operators for training-data curation: Gopher-style
  * within-document repetition metrics and FineWeb-style source-level
  * filtering.
  *
  * Scale shapes (100 TB): repetition stats are one explode + hash
  * aggregations all keyed by the document id (map-side partial
  * aggregation applies; the per-doc window shares the doc-id hash
  * partitioning). Source filtering aggregates to one row per source —
  * a set small enough to broadcast back, so the corpus never shuffles
  * for the filter join.
  */
object CorpusStats {

  /** Within-document repetition metrics (the Gopher quality rules):
    * most-frequent-word fraction and most-frequent-bigram fraction.
    * High values indicate boilerplate/spam (e.g. keyword stuffing).
    * Fractions are exact-integer-count divisions, so the DuckDB oracle
    * reproduces them bit-for-bit.
    */
  def repetitionStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val words = docs.select(col(idCol),
      posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "word")))
    val wc = words.groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("c"))
    val topWord = wc.groupBy(col(idCol))
      .agg(max(col("c")).as("top_word_n"), sum(col("c")).as("n_tokens"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val bigrams = words
      .withColumn("nxt", lead(col("word"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col(idCol), concat_ws(" ", col("word"), col("nxt")).as("bigram"))
    val bc = bigrams.groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("c"))
    val topBigram = bc.groupBy(col(idCol))
      .agg(max(col("c")).as("top_bigram_n"), sum(col("c")).as("n_bigrams"))
    // left join: a one-token document has NO bigram rows but must still
    // report its word stats (n_bigrams 0, bigram fraction NULL) — an
    // inner join would silently drop it from the curation signal
    topWord.join(topBigram, Seq(idCol), "left")
      .select(col(idCol),
        col("n_tokens").cast("long").as("n_tokens"),
        col("top_word_n").cast("long").as("top_word_n"),
        (col("top_word_n") / col("n_tokens").cast("double"))
          .as("top_word_frac"),
        coalesce(col("n_bigrams").cast("long"), lit(0L)).as("n_bigrams"),
        col("top_bigram_n").cast("long").as("top_bigram_n"),
        (col("top_bigram_n") / col("n_bigrams").cast("double"))
          .as("top_bigram_frac"))
  }

  /** Source-level filtering (the FineWeb/CCNet recipe: score each
    * source/domain by an aggregate statistic, then keep or drop ALL of
    * its documents). Returns the surviving documents with their source's
    * aggregate. The per-source aggregate divides an exact integer sum by
    * an exact count, so the threshold compare is deterministic across
    * engines.
    */
  def filterBySourceStat(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, minAvgTokens: Double): DataFrame = {
    val withTok = docs.select(col(idCol), col(sourceCol),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
    val bySource = withTok.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("src_docs"),
        (sum(col("n_tokens")).cast("double") / count(lit(1)))
          .as("src_avg_tokens"))
      .filter(col("src_avg_tokens") >= minAvgTokens)
    withTok.join(broadcast(bySource), Seq(sourceCol))
      .select(col(idCol), col(sourceCol), col("src_docs"),
        col("src_avg_tokens"))
  }

  /** Corpus vocabulary with cumulative coverage — the tokenizer-prep
    * statistic: the `topN` most frequent tokens, each with its count,
    * corpus frequency, and the running coverage fraction of the corpus
    * a vocabulary truncated at that rank would reach. Rank ties break
    * by token text, so the output is deterministic on any engine.
    *
    * Scale: one explode + hash-aggregate on the token (map-side partial
    * combine does the heavy lifting — distinct tokens, not corpus
    * tokens, cross the wire). Top-N runs as TakeOrderedAndProject
    * (distributed per-partition heaps, never a global sort), so the
    * single-partition ranking window only ever sees N rows — the
    * full-vocabulary frame is never single-partitioned at any corpus
    * size.
    */
  def vocabCoverage(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__t"))
    val top = counts.orderBy(col("n").desc, col("token")).limit(topN)
    val rankW = Window.orderBy(col("n").desc, col("token"))
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(rankW))
      // exact long-count division (no rounding): IEEE double division of
      // two integer-valued operands is deterministic across engines
      .withColumn("coverage",
        sum(col("n")).over(rankW.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double") / col("__t").cast("double"))
      .select(col("rank").cast("long").as("rank"), col("token"), col("n"),
        col("coverage"))
  }
}
