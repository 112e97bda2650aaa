package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate line removal — the C4/RefinedWeb recipe:
  * drop every line that repeats across ≥ `minDocs` distinct documents
  * (navigation chrome, cookie banners, copyright footers), keeping each
  * document's unique content in its original order.
  *
  * Scale shape (100 TB): one explode + hash aggregation finds the
  * frequent-line set, which is TINY by construction (only boilerplate
  * crosses the threshold), so the removal anti-join broadcasts — the
  * exploded corpus never shuffles for it. Per-document reassembly is one
  * hash aggregation on the doc id. No all-pairs step anywhere; the
  * frequent-set aggregation benefits from map-side partial counts
  * because boilerplate lines repeat within partitions.
  */
object LineDedup {

  def dropFrequentLines(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Long): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val frequent = lines.groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("line"))
    val kept = lines.join(broadcast(frequent), Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")),
        "\n").as("clean_text"))
    // a document whose every line was boilerplate keeps an empty text
    // (it still exists — dropping rows silently would misreport corpus
    // size downstream)
    docs.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
  }
}
