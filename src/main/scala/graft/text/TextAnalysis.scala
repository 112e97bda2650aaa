package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, language id, quality scoring, fingerprinting.
  *
  * Everything is a pure `Column` composition (codegen'd by Catalyst, no
  * UDFs), so the operators inline into whole-stage codegen and scale
  * linearly with the scan. Formulas are deliberately expressible in ANSI
  * SQL so the DuckDB oracle can replicate them exactly.
  */
object TextAnalysis {

  /** Whitespace-normalized lowercase form (basis for fingerprints). */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace token count. Empty-ish text still counts 1 (split
    * semantics match DuckDB's regexp split on both engines).
    */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** Tokens of the raw text (whitespace split). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** GPT-2-style BPE pre-tokenization pattern: contraction suffixes,
    * letter runs, digit runs, and symbol runs, each optionally taking one
    * leading space. Restricted to syntax Java regex and RE2 interpret
    * identically (ASCII classes, non-capturing groups), so the DuckDB
    * oracle counts the same tokens.
    */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  /** BPE-ish token count — the pre-merge token stream length a BPE
    * tokenizer would start from (the training-pipeline budget metric;
    * merges only shrink it deterministically per vocabulary).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0))).cast("long")

  /** Sliding-window document chunking — the long-document preparation
    * step for pretraining and embedding indexing: windows of up to
    * `maxTokens` whitespace tokens, starts every `stride` tokens
    * (overlap = maxTokens − stride), last window may be partial, every
    * token is covered. A pure narrow map (tokens → posexplode of the
    * start sequence → slice), no shuffle at any corpus size; chunk text
    * is the space-rejoin of the token slice (whitespace-normalized by
    * construction — the contract, since windows are token-addressed).
    * Output: (id, chunk_id, n_chunk_tokens, chunk_text).
    */
  def chunkByTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxTokens: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(maxTokens > 0 && stride > 0 && stride <= maxTokens,
      "chunkByTokens needs 0 < stride <= maxTokens")
    val toks = tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"), size(toks).as("__n"))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0),
          greatest(col("__n") - 1, lit(0)), lit(stride))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        least(lit(maxTokens.toLong), col("__n") - col("col"))
          .as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("col") + 1, lit(maxTokens)), " ")
          .as("chunk_text"))
  }

  // ---- PII scrubbing (the standard web-corpus redaction stage:
  // C4/FineWeb-style pipelines replace emails / IP addresses / phone
  // numbers with placeholder tokens before training) ----

  /** Patterns restricted to the Java-regex ∩ RE2 common subset (no
    * lookaround, ASCII classes) so the DuckDB oracle replicates the
    * replacements byte-for-byte.
    */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe: String =
    "\\+?[0-9]{1,3}[ .-]?\\(?[0-9]{3}\\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}"

  /** Redact emails, then IPv4 addresses, then phone numbers (IP before
    * phone: an IP's digit runs could otherwise half-match the phone
    * pattern). Pure codegen'd regexp_replace chain — scales with the
    * scan, no UDF.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Engine-stable 60-bit hash: first 15 hex digits of md5 as a long.
    * Reproducible in DuckDB as
    * `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`.
    */
  def stableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Document fingerprint: md5 of the normalized text (exact-dup key). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Marker-word tables for the n-gram language heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "es" -> Seq(" el ", " y ", " los "))

  /** Language id: CJK characters → zh; otherwise argmax of marker-word
    * counts with first-listed-language tie-break; all-zero → 'unknown'.
    */
  def langId(text: Column): Column = {
    // one fused lowercase+scan pass for ALL markers (MarkerCounts)
    // instead of a regex traversal per marker — identical counts, the
    // DuckDB oracle keeps its regexp length-diff formula
    val all = langMarkers.flatMap(_._2)
    val counts = graft.functions.TextHashFunctions.markerCounts(
      org.apache.spark.sql.SparkSession.active, text, all)
    var idx = 0
    val scores = langMarkers.map { case (lang, ms) =>
      val sc = ms.indices.map(k => element_at(counts, idx + k + 1))
        .reduce(_ + _)
      idx += ms.size
      lang -> sc
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("unknown")) { case (acc, (lang, sc)) =>
      when(sc > 0 && sc === best, lit(lang)).otherwise(acc)
    }
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh")).otherwise(pick)
  }

  /** Number of punctuation characters (simple class, oracle-parity). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", "")).cast("long")

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / length(text))

  /** Ratio of digit characters. */
  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text))

  /** English stopword markers used by [[stopHits]] / [[stopwordRatio]]. */
  val stopMarkers: Seq[String] = Seq(" the ", " and ", " of ", " a ", " in ", " to ")

  /** Total stopword-marker occurrences (integer-valued). */
  def stopHits(text: Column): Column = {
    // fused scan, same counts as the per-marker regex formula (langId)
    val counts = graft.functions.TextHashFunctions.markerCounts(
      org.apache.spark.sql.SparkSession.active, text, stopMarkers)
    stopMarkers.indices.map(k => element_at(counts, k + 1))
      .reduce(_ + _).cast("long")
  }

  /** English stopword-token ratio. */
  def stopwordRatio(text: Column): Column =
    stopHits(text).cast("double") / tokenCount(text)

  /** Composite quality score in (0,1): logistic over stopword density,
    * length, and punctuation noise. Same closed form runs in the oracle.
    */
  def qualityScore(text: Column): Column = {
    val z = lit(-2.0) + lit(20.0) * stopwordRatio(text) +
      lit(0.1) * log(lit(1.0) + tokenCount(text)) -
      lit(5.0) * punctRatio(text)
    round(lit(1.0) / (lit(1.0) + exp(-z)), 4)
  }
}
