package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training batches (beyond-reference pipeline
  * operator, SURVEY.md §2.10 family): concatenate documents in a
  * deterministic order and split the stream every `budget` tokens — the
  * standard concat-and-chunk packing — assigning each document to the
  * chunk its FIRST token lands in.
  *
  * Scale design (the 100 TB question): a single global concatenation
  * order would serialize into one window partition, so packing runs per
  * `shard` (= doc_id mod `shards`): one hash shuffle on the shard key,
  * then a per-shard running sum — each shard's stream is independent, so
  * shard count scales with the cluster (set it ≈ total cores at real
  * scale; 8 in the oracle-gated query keeps sf-sized data deterministic).
  * Chunks never cross shards, matching how production packers shard the
  * corpus before concatenation.
  */
object SeqPack {

  /** Per-document pack assignment: adds `shard`, `tok` (this doc's token
    * count), and `seq_id` (the chunk index within the shard).
    * `tokens` defaults to whitespace token count; pass
    * [[TextAnalysis.bpeTokenCount]] for a BPE-ish budget.
    */
  def packAssignments(docs: DataFrame, budget: Int, shards: Int,
      tokens: Column => Column = TextAnalysis.tokenCount(_),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs
      .withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("tok", tokens(col(textCol)))
      .withColumn("cum", sum(col("tok")).over(w))
      // first-token offset = cum - tok; its chunk = offset div budget
      .withColumn("seq_id", floor((col("cum") - col("tok")) / budget))
      .drop("cum")
  }

  /** Packed-sequence manifest: one row per (shard, seq_id) with document
    * and token counts — the unit a training loader would fetch.
    */
  def packedSequences(docs: DataFrame, budget: Int, shards: Int,
      tokens: Column => Column = TextAnalysis.tokenCount(_),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    packAssignments(docs, budget, shards, tokens, idCol, textCol)
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc"))
}
