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

  /** IVF (inverted-file) ANN: k-means coarse quantizer over a corpus
    * sample; each vector lives in the posting list of its nearest
    * centroid, and a query probes only its `nprobe` nearest centroids'
    * lists before the exact cosine rerank. The second scale path next to
    * hyperplane LSH (ROADMAP §pipeline): for a 10^9-row corpus, nprobe/k
    * bound the scanned fraction.
    *
    * The quantizer trains FAISS-style on a bounded driver-side SAMPLE
    * (local Lloyd iterations, seeded/deterministic) — training on the
    * full corpus through distributed k-means costs a fleet of jobs and
    * buys nothing: centroids only partition the space. Assignment and
    * probing are then narrow codegen'd maps against the centroid
    * literals; the only shuffle is the candidate equi-join on cid.
    */
  final class IvfIndex(k: Int, nprobe: Int, seed: Long = 20240303L,
      trainSample: Int = 10000) {
    require(nprobe <= k, "nprobe must be <= k")

    /** Local Lloyd k-means over the sample (Euclidean, 10 rounds). */
    private def lloyd(sample: Array[Array[Float]]): Array[Array[Double]] = {
      val n = sample.length
      val dim = sample.head.length
      var state = seed
      def next(): Long = { state = (state * 48271L) % 2147483647L; state }
      val centroids = Array.tabulate(math.min(k, n))(_ =>
        sample((next() % n).toInt.abs).map(_.toDouble))
      val assignOf = new Array[Int](n)
      for (_ <- 0 until 10) {
        var i = 0
        while (i < n) {
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < centroids.length) {
            var d = 0.0; var j = 0
            while (j < dim) {
              val diff = sample(i)(j) - centroids(c)(j); d += diff * diff; j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          assignOf(i) = best
          i += 1
        }
        val sums = Array.fill(centroids.length, dim)(0.0)
        val counts = new Array[Int](centroids.length)
        i = 0
        while (i < n) {
          val c = assignOf(i); counts(c) += 1
          var j = 0
          while (j < dim) { sums(c)(j) += sample(i)(j); j += 1 }
          i += 1
        }
        var c = 0
        while (c < centroids.length) {
          if (counts(c) > 0) {
            var j = 0
            while (j < dim) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
          }
          c += 1
        }
      }
      centroids
    }

    /** Train centroids on a corpus sample and return the corpus tagged
      * with its nearest-centroid id: (id, vec, cid).
      */
    def assign(corpus: DataFrame, idCol: String, vecCol: String): (DataFrame, Array[Array[Double]]) = {
      // deterministic spread draw: rank by a hash of the id and take the
      // first trainSample — Spark executes orderBy+limit as TakeOrdered
      // (per-partition heap, no full sort), and the hash order is unbiased
      // even for sorted/clustered corpora, where a bare limit() would
      // train on the first file's rows only
      val sample = corpus
        .select(col(vecCol).as("vec"), col(idCol).as("id"))
        .orderBy(xxhash64(col("id")), col("id"))
        .limit(trainSample)
        .select(col("vec"))
        .collect().map(_.getSeq[Float](0).toArray)
      if (sample.isEmpty) throw new IllegalArgumentException(
        "IvfIndex: cannot train the quantizer on an empty corpus")
      val centroids = lloyd(sample)
      val assigned = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
        .withColumn("cid",
          element_at(probeCids(col("vec"), centroids, 1), 1))
      (assigned, centroids)
    }

    /** Nearest-`np` centroid ids of a vector column, as array<int>. */
    private def probeCids(vec: Column, centroids: Array[Array[Double]],
        np: Int): Column = {
      val dists = centroids.zipWithIndex.map { case (c, i) =>
        val cLit = array(c.map(x => lit(x.toFloat)): _*)
        struct(graft.functions.VectorFunctions
          .cosine(org.apache.spark.sql.SparkSession.active, vec, cLit).as("sim"),
          lit(i).as("cid"))
      }
      // top-np by cosine: sort the k (sim, cid) structs descending
      slice(reverse(array_sort(array(dists: _*))), 1, np)
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
        .withColumn("cid", explode(probeCids(col("qvec"), centroids, nprobe)))
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

  /** Product-quantization codec (Jégou et al., the FAISS IVFADC building
    * block): vectors split into `m` subspaces, each encoded as the index
    * of its nearest sub-centroid (16 per subspace). A 128-float vector
    * becomes m small ints — the memory-bound scale path where posting
    * lists must live in RAM: 16-32× smaller than raw floats, scored
    * without decoding via asymmetric distance (query-slice → selected
    * sub-centroid), all as Column expressions over the codes column.
    *
    * Training is driver-side per-subspace Lloyd on a bounded sample
    * (same architecture as [[IvfIndex]]); encoding and ADC scoring are
    * distributed narrow maps.
    */
  final class PqCodec(dim: Int, m: Int = 4, seed: Long = 20240404L) {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    private val sub = dim / m
    private val K = 16
    private var codebooks: Array[Array[Array[Double]]] = _ // m × K × sub

    private def lloydK(sample: Array[Array[Float]]): Array[Array[Double]] = {
      val n = sample.length
      var state = seed
      def next(): Long = { state = (state * 48271L) % 2147483647L; state }
      val cents = Array.tabulate(math.min(K, n))(_ =>
        sample((next() % n).toInt.abs).map(_.toDouble))
      val assign = new Array[Int](n)
      for (_ <- 0 until 10) {
        var i = 0
        while (i < n) {
          var best = 0; var bestD = Double.MaxValue; var c = 0
          while (c < cents.length) {
            var d = 0.0; var j = 0
            while (j < sub) {
              val diff = sample(i)(j) - cents(c)(j); d += diff * diff; j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          assign(i) = best; i += 1
        }
        val sums = Array.fill(cents.length, sub)(0.0)
        val counts = new Array[Int](cents.length)
        i = 0
        while (i < n) {
          val c = assign(i); counts(c) += 1
          var j = 0
          while (j < sub) { sums(c)(j) += sample(i)(j); j += 1 }
          i += 1
        }
        var c = 0
        while (c < cents.length) {
          if (counts(c) > 0) {
            var j = 0
            while (j < sub) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
          }
          c += 1
        }
      }
      cents
    }

    /** Train sub-codebooks on a driver-side sample. */
    def train(sample: Array[Array[Float]]): this.type = {
      require(sample.nonEmpty, "PqCodec: empty training sample")
      codebooks = Array.tabulate(m)(j =>
        lloydK(sample.map(_.slice(j * sub, (j + 1) * sub))))
      this
    }

    /** Train from a corpus column (hash-spread draw, like IvfIndex). */
    def train(corpus: DataFrame, idCol: String, vecCol: String,
        trainSample: Int = 10000): this.type =
      train(corpus.select(col(vecCol).as("v"), col(idCol).as("i"))
        .orderBy(xxhash64(col("i")), col("i")).limit(trainSample)
        .select("v").collect().map(_.getSeq[Float](0).toArray))

    private def litVec(c: Array[Double]): Column =
      array(c.map(x => lit(x)): _*)

    private def l2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b,
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, v) => acc + v)

    /** Codes column (array<int> of length m) for a vector column. */
    def encode(vec: Column): Column = array((0 until m).map { j =>
      val s = slice(vec, j * sub + 1, sub)
      val dists = codebooks(j).zipWithIndex.map { case (c, i) =>
        struct(l2(s, litVec(c)).as("d"), lit(i).as("i"))
      }
      array_min(array(dists: _*)).getField("i")
    }: _*)

    /** Asymmetric distance: query slices against the code-selected
      * sub-centroids — the vector itself is never decoded.
      */
    def adcDistance(qvec: Column, codes: Column): Column =
      (0 until m).map { j =>
        val qs = slice(qvec, j * sub + 1, sub)
        val sel = element_at(array(codebooks(j).map(litVec): _*),
          element_at(codes, j + 1).cast("int") + 1)
        l2(qs, sel)
      }.reduce(_ + _)

    /** Top-k by ADC over an encoded corpus (id, codes). */
    def adcTopK(encoded: DataFrame, queries: DataFrame, qidCol: String,
        qvecCol: String, topK: Int): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(col("adist"), col("id"))
      encoded.crossJoin(broadcast(
          queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))))
        .filter(col("id") =!= col("qid"))
        .select(col("qid"), col("id"),
          adcDistance(col("qvec"), col("codes")).as("adist"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= topK)
        .select(col("qid"), col("id"), col("adist"),
          col("rk").cast("long").as("rk"))
    }
  }

  /** Smallest `nprobe` whose measured recall@`topK` against the exact
    * brute-force answer meets `recallTarget`, probing doubling values
    * (1, 2, 4, … k) on a deterministic hash-spread query sample. Offline
    * tuning utility: a handful of small jobs, paid once per index build
    * (ROADMAP §perf — nprobe auto-tune from recall target).
    */
  def tuneNprobe(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      topK: Int, recallTarget: Double, sampleQueries: Int = 16): Int = {
    val queries = corpus.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .orderBy(xxhash64(col("qid")), col("qid")).limit(sampleQueries)
      .localCheckpoint(true)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("qid").cast("long"), col("id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(knnBruteForce(corpus, idCol, vecCol,
      queries, "qid", "qvec", topK))
    if (exact.isEmpty) return 1
    var np = 1
    while (np < k) {
      val approx = pairs(new IvfIndex(k, np).annTopK(corpus, idCol, vecCol,
        queries, "qid", "qvec", topK))
      if (approx.intersect(exact).size.toDouble / exact.size >= recallTarget)
        return np
      np = math.min(np * 2, k)
    }
    k
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
