package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration,
  * output shape — is real and tested. Decode is two-tier: WAV (RIFF PCM)
  * and BMP parse for REAL through [[RealCodec]] (pure byte formats, no
  * library needed — [[decodeFeatures]], driver row m03); codec-library
  * formats (JPEG/MP4/…) stay STUBBED behind [[StubCodec.decodeFake]], a
  * deterministic fake that derives "decoded" dimensions and frames from
  * the bytes (no image/audio codecs in this container). Swapping in a
  * real codec touches only that one function: the `mapPartitions`
  * pipeline around it (the Scala analog of `mapInPandas` batch
  * processing) stays unchanged.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,           // "image" | "audio" | "video"
      payload: Array[Byte],
      meta_source: String)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      byte_entropy: Double,   // real computation on real bytes
      width: Int,             // STUB-derived
      height: Int,            // STUB-derived
      n_frames: Int)          // STUB-derived (1 for image)

  /** STUB: deterministic fake decode. A real implementation would call an
    * image/audio library here; the container has none, so dimensions and
    * frame counts are derived from the payload deterministically. Marked
    * intentionally — DO NOT interpret these values as real media info.
    */
  object StubCodec {
    def decodeFake(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val h = payload.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      val frames = kind match {
        case "image" => 1
        case "audio" => 1 + math.floorMod(h >> 20, 4096).toInt
        case _       => 1 + math.floorMod(h >> 20, 240).toInt
      }
      (w, ht, frames)
    }
  }

  /** Shannon entropy of the byte distribution — a real signal used for
    * corrupt/blank media detection at pipeline scale.
    */
  private def entropy(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0
    val counts = new Array[Long](256)
    bytes.foreach(b => counts(b & 0xff) += 1)
    val n = bytes.length.toDouble
    var e = 0.0
    var i = 0
    while (i < 256) {
      if (counts(i) > 0) { val p = counts(i) / n; e -= p * math.log(p) / math.log(2) }
      i += 1
    }
    e
  }

  /** Batch feature extraction over partitions — one pass per partition,
    * no shuffle; this is where a real decoder would amortize model /
    * codec initialization per partition (exactly like mapInPandas).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (codec handles, model weights)
      it.map { r =>
        val (w, h, f) = StubCodec.decodeFake(r.kind, r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          math.rint(entropy(r.payload) * 10000) / 10000, w, h, f)
      }
    }
  }

  /** A resized media record (STUB-derived dimensions; the payload stays
    * opaque — a real resize would transform it).
    */
  final case class ResizedMedia(media_id: Long, kind: String,
      src_width: Int, src_height: Int, width: Int, height: Int,
      scale: Double)

  /** One sampled frame of a video/audio payload. */
  final case class SampledFrame(media_id: Long, kind: String,
      frame_index: Int, frame_hash: Long)

  /** Resize stage: batched per partition with an explicit `batchSize`
    * knob — the unit a real decoder/resizer would process per call
    * (exactly the `mapInPandas` batch shape). Aspect-preserving fit into
    * (targetW, targetH); decode is STUBBED, the batching/schema plumbing
    * is real.
    */
  def resizeStage(media: Dataset[MediaRecord], targetW: Int, targetH: Int,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init would go here (resizer handles, buffers)
        batch.iterator.map { r =>
          val (w, h, _) = StubCodec.decodeFake(r.kind, r.payload)
          val scale = math.min(targetW.toDouble / w, targetH.toDouble / h)
          ResizedMedia(r.media_id, r.kind, w, h,
            math.max(1, math.round(w * scale).toInt),
            math.max(1, math.round(h * scale).toInt), scale)
        }
      }
    }
  }

  /** Frame-sampling stage: every `everyN`-th frame of video/audio media,
    * batched like [[resizeStage]]. Frame "hashes" derive deterministically
    * from the payload hash + index (STUB for a real frame decode).
    */
  def frameSampleStage(media: Dataset[MediaRecord], everyN: Int,
      batchSize: Int = 64): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    media.filter(r => r.kind == "video" || r.kind == "audio")
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val (_, _, frames) = StubCodec.decodeFake(r.kind, r.payload)
            val base = r.payload.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
            (0 until frames by everyN).map(i =>
              SampledFrame(r.media_id, r.kind, i, base * 31 + i))
          }
        }
      }
  }

  /** Features from a REAL decode ([[RealCodec]]): format sniffed from
    * the magic bytes, then actual header parsing and sample/pixel math.
    * Non-applicable fields are 0 (not NULL) so the driver compare stays
    * dtype-stable. This is the non-stub decode path — WAV and BMP are
    * pure byte formats, so no codec library is needed.
    */
  final case class MediaDecoded(
      media_id: Long, format: String,
      width: Long, height: Long,           // bmp; 0 for wav
      sample_rate: Long, n_samples: Long,  // wav; 0 for bmp
      duration_ms: Double,                 // wav; 0.0 for bmp
      peak: Long,                          // wav max |sample|; 0 for bmp
      mean_val: Double)                    // wav mean |sample| / bmp mean channel

  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val b = r.payload
        if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
          val w = RealCodec.decodeWav(b)
          var peak = 0L; var sum = 0L; var i = 0
          while (i < w.samples.length) {
            val a = math.abs(w.samples(i).toLong)
            if (a > peak) peak = a
            sum += a; i += 1
          }
          MediaDecoded(r.media_id, "wav", 0L, 0L, w.sampleRate.toLong,
            w.nSamples.toLong, w.durationMs, peak,
            sum.toDouble / math.max(w.samples.length, 1))
        } else {
          val img = RealCodec.decodeBmp(b)
          var sum = 0L; var i = 0
          while (i < img.pixels.length) { sum += img.pixels(i); i += 1 }
          MediaDecoded(r.media_id, "bmp", img.width.toLong, img.height.toLong,
            0L, 0L, 0.0, 0L, sum.toDouble / math.max(img.pixels.length, 1))
        }
      }
    }
  }

  /** Deterministic VALID media files per document id (even → PCM-16 WAV,
    * odd → 24-bit BMP) — the m03 oracle reconstructs every expected
    * feature from the same closed-form generators.
    */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 2 == 0) {
        val n = (100 + id % 400).toInt
        val samples = Array.tabulate(n)(i =>
          ((id * 7 + i * 13) % 2001 - 1000).toShort)
        MediaRecord(id, "audio",
          RealCodec.encodeWavPcm16Mono(8000, samples), "synth")
      } else {
        val w = (4 + id % 13).toInt
        val h = (3 + id % 7).toInt
        MediaRecord(id, "image",
          RealCodec.encodeBmp24(w, h,
            (x, y, c) => ((id + 3 * x + 5 * y + c) % 256).toInt), "synth")
      }
    }
  }

  /** Build a media table from the documents table (text bytes as payload)
    * — gives the pipeline a deterministic binary corpus to flow through.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source").as("meta_source"))
      .as[MediaRecord]
  }
}
