package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline: media
  * payloads ride as opaque `binary` columns with typed metadata; decode
  * / feature-extract / resize / frame-sample run as BATCHED
  * per-partition transforms (the Scala analog of `mapInPandas` — same
  * batch shape, same partitioning story).
  *
  * !! The codec step is a STUB: no image/audio libraries ship in this
  * container. `decodeStub` produces a deterministic fake raster/pcm
  * from the payload bytes so the Spark-side plumbing (schema, batch
  * iteration, scratch-buffer reuse, partition sizing) is real and
  * tested; swap `decodeStub` for an actual codec on a real cluster. */
object Media {

  final case class MediaMeta(width: Int, height: Int, sampleRateHz: Int,
      durationMs: Int, codec: String)
  final case class MediaRow(media_id: Long, kind: String,
      payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      luma_hist: Array[Long], luma_sum: Long, mean_luma: Double,
      frames_sampled: Int, thumb_w: Int, thumb_h: Int)

  /** Deterministic synthetic media table derived from the documents
    * table (payload = utf-8 bytes standing in for encoded media). */
  def synthMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, n) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val meta = kind match {
          case "image" => MediaMeta(640 + (id % 4).toInt * 160, 480, 0, 0, "fake-jpeg")
          case "audio" => MediaMeta(0, 0, 16000, (n * 10).toInt, "fake-pcm")
          case _       => MediaMeta(1280, 720, 0, (n * 40).toInt, "fake-h264")
        }
        MediaRow(id, kind, text.getBytes("UTF-8"), meta)
      }
  }

  /** STUB decode: deterministic fake "raster" = the payload bytes
    * themselves; real impl would call the codec here. */
  private def decodeStub(payload: Array[Byte], scratch: Array[Long]): Unit = {
    java.util.Arrays.fill(scratch, 0L)
    var i = 0
    while (i < payload.length) { scratch(payload(i) & 0xff) += 1; i += 1 }
  }

  /** Frame-sampling rule: one frame per 10s of video, min 1; images
    * sample 1; audio samples one window per 30s. */
  def framesToSample(kind: String, meta: MediaMeta): Int = kind match {
    case "video" => math.max(1, meta.durationMs / 10000)
    case "audio" => math.max(1, meta.durationMs / 30000)
    case _       => 1
  }

  /** Thumbnail (resize) rule: fit into 128×128 preserving aspect. */
  def thumbSize(meta: MediaMeta): (Int, Int) =
    if (meta.width <= 0 || meta.height <= 0) (0, 0)
    else if (meta.width >= meta.height) (128, math.max(1, 128 * meta.height / meta.width))
    else (math.max(1, 128 * meta.width / meta.height), 128)

  /** Batched feature extraction — iterates each partition in fixed-size
    * batches with a REUSED scratch histogram (the mapInPandas batch
    * shape: amortized per-batch setup, bounded memory per task). */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val scratch = new Array[Long](256)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          decodeStub(m.payload, scratch)
          val hist = java.util.Arrays.copyOf(scratch, 256)
          var sum = 0L; var n = 0L; var b = 0
          while (b < 256) { sum += hist(b) * b; n += hist(b); b += 1 }
          val (tw, th) = thumbSize(m.meta)
          MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, hist, sum,
            if (n == 0) 0.0 else sum.toDouble / n,
            framesToSample(m.kind, m.meta), tw, th)
        }
      }
    }
  }

  final case class MediaFrame(media_id: Long, kind: String, frame_idx: Long,
      frame_ts_ms: Long, frame_bytes: Long, frame_md5: String)

  /** Frame-sampling EXPLOSION — the operator shape a video pipeline
    * feeds downstream per-frame embedding/dedupe with: one row per
    * sampled frame, carrying the sample timestamp and a frame-payload
    * fingerprint. The stub "frame" is the i-th of nf equal payload
    * slices (byte range [i·len/nf, (i+1)·len/nf)) — deterministic, so
    * the whole output is DuckDB-recomputable from documents.parquet
    * (ASCII corpus ⇒ byte offsets == char offsets; same tripwire as
    * mediaFeatureQuery). Batched per-partition with a reused digest —
    * the same mapInPandas batch story as extractFeatures. */
  def sampleFrames(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          val nf = framesToSample(m.kind, m.meta)
          val len = m.payload.length
          val stepMs = m.kind match {
            case "video" => 10000L; case "audio" => 30000L; case _ => 0L
          }
          (0 until nf).iterator.map { i =>
            val start = (i.toLong * len / nf).toInt
            val end = ((i + 1).toLong * len / nf).toInt
            md.reset()
            md.update(m.payload, start, end - start)
            val hex = md.digest().map(b => f"$b%02x").mkString
            MediaFrame(m.media_id, m.kind, i.toLong, i * stepMs,
              (end - start).toLong, hex)
          }
        }
      }
    }
  }

  /** Registered query surface for the frame explosion (oracled). */
  def mediaFramesQuery(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(synthMedia(spark, dir))
      .toDF()
      .orderBy(col("media_id"), col("frame_idx"))

  /** Shot-boundary segmentation over the sampled frames — the standard
    * video-curation pass (cut detection → per-shot stats → keep one
    * keyframe per shot). A cut is a large jump between consecutive
    * frame SIGNATURES; with the stub codec the signature is the first
    * 24 bits of the frame fingerprint (swap for a perceptual hash on a
    * real cluster — the plumbing is identical). All-integer: lag +
    * running-sum windows per media, exact hash-derived signatures,
    * threshold at half the signature range. Scales: windows partition
    * by media_id; shot state never leaves the executor. */
  def mediaShotsQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fr = sampleFrames(synthMedia(spark, dir)).toDF()
      .select(col("media_id"), col("kind"), col("frame_idx"),
        expr("cast(conv(substring(frame_md5, 1, 6), 16, 10) as bigint)").as("sig"))
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val cuts = fr
      .withColumn("prev", lag(col("sig"), 1).over(w))
      .withColumn("cut", when(col("prev").isNotNull &&
        abs(col("sig") - col("prev")) > 8388608L, 1L).otherwise(0L))
      .withColumn("shot", sum(col("cut")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cuts.groupBy(col("media_id"), col("kind"), col("shot"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("media_id"), col("kind"))
      .agg(sum(col("len")).as("n_frames"), count(lit(1)).as("n_shots"),
        max(col("len")).as("max_shot_len"))
      .orderBy(col("media_id"))
  }

  /** Oracled query surface: the per-kind aggregates that derive
    * deterministically from the documents table (kind = doc_id % 3,
    * n_bytes = UTF-8 byte length, frames from the duration formula) —
    * DuckDB recomputes them from documents.parquet independently. The
    * luma histogram (stub-decode-dependent) stays in the rows-only
    * q_media_features below. */
  def mediaAggQuery(spark: SparkSession, dir: String): DataFrame = {
    extractFeatures(synthMedia(spark, dir))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("frames_sampled").cast("long")).as("frames"))
      .orderBy(col("kind"))
  }

  /** Registered query surface — DuckDB-oracled since round 3: the stub
    * decode is a byte-value histogram of the UTF-8 payload, and the
    * documents corpus is pure ASCII (verified per SF), so every output
    * derives from exact integers DuckDB can recompute from the chars of
    * documents.parquet: luma_sum = Σ byte values, avg_luma = ONE double
    * division of exact integer sums, and the histogram is exercised via
    * its per-kind argmax (most frequent byte, smallest-byte tie-break).
    * A non-ASCII doc would make byte-vs-char counts diverge and fail
    * the oracle loudly — the intended tripwire. */
  def mediaFeatureQuery(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(synthMedia(spark, dir))
    val perKind = feats.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("luma_sum")).as("luma_sum"),
        sum(col("frames_sampled").cast("long")).as("frames"))
      .withColumn("avg_luma", round(col("luma_sum") / col("total_bytes"), 4))
    // per-kind histogram argmax: sum the 256-bin vectors, then take the
    // most frequent byte value (fixed 256-wide explode — bounded)
    val bins = feats.select(col("kind"), posexplode(col("luma_hist")))
      .groupBy(col("kind"), col("pos")).agg(sum(col("col")).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("kind")).orderBy(col("cnt").desc, col("pos"))
    val argmax = bins.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("kind"), col("pos").cast("long").as("top_byte"),
        col("cnt").as("top_byte_n"))
    perKind.join(argmax, "kind")
      .select(col("kind"), col("n"), col("total_bytes"), col("luma_sum"),
        col("avg_luma"), col("frames"), col("top_byte"), col("top_byte_n"))
      .orderBy(col("kind"))
  }
}
