package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * Decode is REAL end to end: payloads are sniffed from their magic
  * bytes ([[RealCodec.sniff]]) and parsed — WAV/BMP by the hand codecs,
  * PNG/JPEG/GIF through the JDK's `javax.imageio` ([[RealCodec
  * .decodeRaster]]). A payload no decoder recognizes (e.g. container
  * video — no JDK codec) is FLAGGED, not guessed at: feature stages emit
  * 0-dimensions for it and transform stages drop it, which is exactly
  * what a corpus-hygiene pipeline must do with corrupt media. The
  * `mapPartitions` batch plumbing is the Scala analog of `mapInPandas`:
  * per-partition/per-batch init points mark where codec handles would
  * amortize on a real cluster.
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
      width: Int,             // real decode; 0 when not a raster
      height: Int,            // real decode; 0 when not a raster
      n_frames: Int)          // real decode: WAV sample count, raster 1, unknown 0

  /** Real dimension probe: sniff + decode. Returns
    * (format, width, height, n_frames); undecodable payloads come back
    * ("unknown", 0, 0, 0) so downstream can filter/flag them.
    */
  def probeDims(payload: Array[Byte]): (String, Int, Int, Int) =
    RealCodec.sniff(payload) match {
      case "wav" =>
        val w = RealCodec.decodeWav(payload)
        ("wav", 0, 0, w.nSamples)
      case f @ ("bmp" | "png" | "jpeg" | "gif") =>
        val img = RealCodec.decodeRaster(payload)
        (f, img.width, img.height, 1)
      case _ => ("unknown", 0, 0, 0)
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
        val (_, w, h, f) = probeDims(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          math.rint(entropy(r.payload) * 10000) / 10000, w, h, f)
      }
    }
  }

  /** A really-resized media record: source dims from the actual decode,
    * target dims from an aspect-preserving fit, `px_mean` the mean
    * channel value of the nearest-neighbor-resampled pixels — proof the
    * pixel transform ran, reconstructable in closed form by the oracle.
    */
  final case class ResizedMedia(media_id: Long, kind: String, format: String,
      src_width: Int, src_height: Int, width: Int, height: Int,
      scale: Double, px_mean: Double)

  /** One sampled frame of an audio payload: `frame_value` is the REAL
    * decoded PCM sample at `frame_index`, not a synthetic hash.
    */
  final case class SampledFrame(media_id: Long, kind: String, format: String,
      frame_index: Int, frame_value: Long)

  /** Resize stage: batched per partition with an explicit `batchSize`
    * knob — the unit a real decoder/resizer would process per call
    * (exactly the `mapInPandas` batch shape). Rasters are REALLY decoded
    * ([[RealCodec.decodeRaster]]) and REALLY resampled
    * ([[RealCodec.resizeNearest]]) into an aspect-preserving fit of
    * (targetW, targetH); payloads that aren't decodable rasters are
    * dropped (flag-don't-guess).
    */
  def resizeStage(media: Dataset[MediaRecord], targetW: Int, targetH: Int,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init would go here (resizer handles, buffers)
        batch.iterator.flatMap { r =>
          RealCodec.sniff(r.payload) match {
            case fmt @ ("bmp" | "png" | "jpeg" | "gif") =>
              val img = RealCodec.decodeRaster(r.payload)
              val scale = math.min(
                targetW.toDouble / img.width, targetH.toDouble / img.height)
              // floor(x + 0.5) so the oracle's FLOOR(x + 0.5) is the
              // same rounding function, bit for bit
              val nw = math.max(1, math.floor(img.width * scale + 0.5).toInt)
              val nh = math.max(1, math.floor(img.height * scale + 0.5).toInt)
              val out = RealCodec.resizeNearest(img, nw, nh)
              var sum = 0L; var i = 0
              while (i < out.pixels.length) { sum += out.pixels(i); i += 1 }
              Some(ResizedMedia(r.media_id, r.kind, fmt,
                img.width, img.height, nw, nh, scale,
                sum.toDouble / out.pixels.length))
            case _ => None
          }
        }
      }
    }
  }

  /** Frame-sampling stage: every `everyN`-th REAL decoded PCM sample of
    * audio media, batched like [[resizeStage]]. Non-audio payloads are
    * dropped. (With a container-video codec this is where every-Nth
    * VIDEO frame would decode; the JDK ships none, so audio is the real
    * frame source and video payloads fall out as undecodable.)
    */
  def frameSampleStage(media: Dataset[MediaRecord], everyN: Int,
      batchSize: Int = 64): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          RealCodec.sniff(r.payload) match {
            case "wav" =>
              val w = RealCodec.decodeWav(r.payload)
              (0 until w.nSamples by everyN).map(i =>
                SampledFrame(r.media_id, r.kind, "wav", i,
                  w.samples(i * w.channels).toLong))
            case _ => Seq.empty
          }
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
        RealCodec.sniff(b) match {
          case "wav" =>
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
          case fmt @ ("bmp" | "png" | "jpeg" | "gif") =>
            val img = RealCodec.decodeRaster(b)
            var sum = 0L; var i = 0
            while (i < img.pixels.length) { sum += img.pixels(i); i += 1 }
            MediaDecoded(r.media_id, fmt, img.width.toLong, img.height.toLong,
              0L, 0L, 0.0, 0L, sum.toDouble / math.max(img.pixels.length, 1))
          case _ =>
            // flag-don't-guess (header contract): a payload no decoder
            // recognizes — container video (MP4 — no JDK codec exists),
            // truncated magic, junk — yields the documented flag row
            // (format "unknown", all features 0), never a decode attempt
            // that throws mid-stage at pipeline scale
            MediaDecoded(r.media_id, "unknown", 0L, 0L, 0L, 0L, 0.0, 0L, 0.0)
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

  /** Deterministic VALID media files per document id across THREE real
    * formats — `id % 3`: 0 → PCM-16 WAV, 1 → 24-bit BMP, 2 → PNG (the
    * JDK codec). WAV/BMP use the m03 generators; PNG reuses the BMP
    * pixel formula, so the m02 oracle reconstructs every decoded feature
    * in closed form while the Spark side goes through actual file bytes
    * (including a real zlib-compressed PNG round-trip).
    */
  def syntheticMediaMixed(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      (id % 3) match {
        case 0L =>
          val n = (100 + id % 400).toInt
          val samples = Array.tabulate(n)(i =>
            ((id * 7 + i * 13) % 2001 - 1000).toShort)
          MediaRecord(id, "audio",
            RealCodec.encodeWavPcm16Mono(8000, samples), "synth")
        case rem =>
          val w = (4 + id % 13).toInt
          val h = (3 + id % 7).toInt
          val px = (x: Int, y: Int, c: Int) => ((id + 3 * x + 5 * y + c) % 256).toInt
          val payload = if (rem == 1L) RealCodec.encodeBmp24(w, h, px)
            else RealCodec.encodePng(w, h, px)
          MediaRecord(id, "image", payload, "synth")
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
