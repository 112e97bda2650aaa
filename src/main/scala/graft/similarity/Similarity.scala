package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers, per SURVEY.md §M6 and the 100 TB design point:
  *  - [[knnBruteForce]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; one scan, no shuffle of the corpus, then a
  *    per-query top-k window. The baseline and the verifier for ANN.
  *  - [[RandomHyperplaneLsh]]: sign-random-projection LSH — corpus hashed
  *    once into band buckets (narrow map + one shuffle), probes join only
  *    their buckets, exact rerank confined to candidates. This is the path
  *    that survives a 10^9-row corpus where brute force cannot.
  *
  * All math in double precision via explicit fold (deterministic
  * accumulation order → bit-identical across engines, oracle-friendly).
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision (0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0, lit(0.0)).otherwise(d / nn)
  }

  /** Exact top-k by cosine: for each row of `queries` (qid, qvec) return
    * the k nearest rows of `corpus` (id, vec), excluding self-matches on
    * id. The query side is broadcast — the corpus is scanned exactly once
    * with no shuffle; ranking is a per-query window.
    */
  def knnBruteForce(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int): DataFrame = {
    val cos = graft.functions.VectorFunctions
      .cosine(corpus.sparkSession, col("qvec"), col("vec"))
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .crossJoin(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), cos.as("score"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), round(col("score"), 6).as("score"),
        col("rk").cast("long").as("rk"))
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the corpus;
    * each vector lives in the posting list of its nearest centroid, and a
    * query proves only its `nprobe` nearest centroids' lists before the
    * exact cosine rerank. The second scale path next to hyperplane LSH
    * (ROADMAP §pipeline): for a 10^9-row corpus, nprobe/k bound the
    * scanned fraction to nprobe/k of the data.
    *
    * Train is one Spark ML KMeans fit (seeded, deterministic); assignment
    * and probing are narrow maps against the broadcast centroid matrix —
    * the only shuffle is the candidate equi-join on centroid id.
    */
  final class IvfIndex(k: Int, nprobe: Int, seed: Long = 20240303L) {
    require(nprobe <= k, "nprobe must be <= k")

    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    /** Train centroids on (vecCol: array<float>) and return the corpus
      * tagged with its centroid id: (id, vec, cid).
      */
    def assign(corpus: DataFrame, idCol: String, vecCol: String): (DataFrame, Array[Array[Double]]) = {
      val spark = corpus.sparkSession
      val feat = corpus.select(col(idCol).as("id"),
          col(vecCol).as("vec"))
        .withColumn("features", array_to_vector(
          col("vec").cast("array<double>")))
      val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10)
        .fit(feat)
      val centroids = model.clusterCenters.map(_.toArray)
      val assigned = model.transform(feat)
        .select(col("id"), col("vec"), col("prediction").as("cid"))
      (assigned, centroids)
    }

    /** Nearest-`nprobe` centroid ids of a vector column, as array<int>. */
    private def probeCids(vec: Column, centroids: Array[Array[Double]]): Column = {
      val dists = centroids.zipWithIndex.map { case (c, i) =>
        val cLit = array(c.map(x => lit(x.toFloat)): _*)
        struct(graft.functions.VectorFunctions
          .cosine(org.apache.spark.sql.SparkSession.active, vec, cLit).as("sim"),
          lit(i).as("cid"))
      }
      // top-nprobe by cosine: sort the k (sim, cid) structs descending
      slice(reverse(array_sort(array(dists: _*))), 1, nprobe)
        .getField("cid")
    }

    /** Approximate top-k neighbors: probe nprobe centroid posting lists,
      * exact-cosine rerank candidates.
      */
    def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
        queries: DataFrame, qidCol: String, qvecCol: String, topK: Int): DataFrame = {
      val spark = corpus.sparkSession
      val (assigned, centroids) = assign(corpus, idCol, vecCol)
      val probed = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
        .withColumn("cid", explode(probeCids(col("qvec"), centroids)))
      val cands = probed.join(assigned.withColumnRenamed("id", "cand_id"), "cid")
        .filter(col("cand_id") =!= col("qid"))
      val cos = graft.functions.VectorFunctions
        .cosine(spark, col("qvec"), col("vec"))
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
      cands.select(col("qid"), col("cand_id").as("id"), cos.as("score"))
        .distinct()
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= topK)
        .select(col("qid"), col("id"), round(col("score"), 6).as("score"),
          col("rk").cast("long").as("rk"))
    }
  }

  /** Solve LSH banding parameters for a target Jaccard threshold: among
    * (bands, rowsPerBand) factorizations of `numHashes`, pick the one
    * whose S-curve inflection (1/b)^(1/r) lands nearest the threshold —
    * the standard Leskovec/Rajaraman/Ullman tuning rule.
    */
  def tuneBanding(numHashes: Int, tau: Double): (Int, Int) = {
    val options = (1 to numHashes)
      .filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
    options.minBy { case (b, r) => math.abs(math.pow(1.0 / b, 1.0 / r) - tau) }
  }

  /** Sign-random-projection (SimHash-style) LSH for cosine similarity.
    *
    * `planes(p)(i)` are deterministic pseudo-random ±1 hyperplane weights
    * from a fixed-seed LCG (no runtime randomness — resumable, and the
    * same buckets on every engine/run). Signature bit p = sign(v · plane_p);
    * `bands` groups of `rowsPerBand` bits form bucket keys.
    */
  final class RandomHyperplaneLsh(dim: Int, numPlanes: Int, bands: Int) {
    require(numPlanes % bands == 0, "numPlanes must divide into bands")
    val rowsPerBand: Int = numPlanes / bands

    private val planes: Array[Array[Double]] = {
      var state = 20240202L
      def next(): Long = { state = (state * 48271L) % 2147483647L; state }
      Array.fill(numPlanes, dim)(if ((next() & 1L) == 0L) -1.0 else 1.0)
    }

    /** The hyperplane matrix (for oracle SQL generation — the same ±1
      * constants interpolate into DuckDB `list_dot_product` literals).
      */
    def planeRows: Seq[Seq[Double]] = planes.map(_.toSeq).toSeq

    /** Signature bits as array<int> of 0/1. sign(v·plane) == sign of the
      * cosine, so the codegen'd CosineSimilarity expression serves here
      * too (planes are ±1.0, exact in float).
      */
    def signature(spark: org.apache.spark.sql.SparkSession, vec: Column): Column = {
      val bits = planes.map { p =>
        val planeLit = array(p.map(x => lit(x.toFloat)): _*)
        when(graft.functions.VectorFunctions.cosine(spark, vec, planeLit) >= 0,
          lit(1)).otherwise(lit(0))
      }
      array(bits.toIndexedSeq: _*)
    }

    /** (id, band, bucket) — one row per band per input row. */
    def buckets(df: DataFrame, idCol: String, vecCol: String): DataFrame =
      df.select(col(idCol).as("id"),
        signature(df.sparkSession, col(vecCol)).as("sig"))
        .select(col("id"), posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            b => to_json(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
        .select(col("id"), col("pos").as("band"), col("col").as("bucket"))

    /** Approximate top-k: candidates = corpus rows sharing >= 1 band
      * bucket with the query; exact cosine rerank on candidates only.
      */
    def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
        queries: DataFrame, qidCol: String, qvecCol: String, k: Int): DataFrame = {
      val cb = buckets(corpus, idCol, vecCol)
      val qb = buckets(queries, qidCol, qvecCol)
        .withColumnRenamed("id", "qid")
      val cands = cb.join(qb, Seq("band", "bucket"))
        .filter(col("id") =!= col("qid"))
        .select("qid", "id").distinct()
      val withVecs = cands
        .join(corpus.select(col(idCol).as("id"), col(vecCol).as("vec")), "id")
        .join(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))), "qid")
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
      val cos = graft.functions.VectorFunctions
        .cosine(corpus.sparkSession, col("qvec"), col("vec"))
      withVecs.select(col("qid"), col("id"), cos.as("score"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col("qid"), col("id"), round(col("score"), 6).as("score"),
          col("rk").cast("long").as("rk"))
    }
  }
}
