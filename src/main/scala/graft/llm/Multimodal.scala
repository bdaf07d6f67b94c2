package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batched per-partition passes.
  *
  * The Spark-side plumbing — schema, batch iteration, partitioning, feature
  * schema — is real and tested; the actual codec calls are STUBBED with a
  * deterministic fake (`fakeDecode`) because no image/audio libraries exist
  * in this environment. Swapping `fakeDecode` for a real JNI/library call is
  * the only change needed in production.
  *
  * Scale notes: `mapPartitions` processes one partition's blobs as a stream
  * (no per-row lambda dispatch); media tables should be written with
  * `maxRecordsPerFile` tuned so a partition's blobs fit executor memory, and
  * partitioned by `media_type` so an image-only pass prunes audio/video files
  * at the scan.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      mime: String,
      bytes: Array[Byte],
      width: Int, // -1 when unknown/not applicable
      height: Int,
      duration_ms: Long)

  /** Extracted feature row (decode → feature-extract output). */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      content_hash: String,
      // stub "decoded" signals — deterministic functions of the payload
      mean_byte: Double,
      frame_count: Int,
      feature: Array[Float])

  /** STUB decoder: a real implementation would call an image/audio codec.
    * This fake is deterministic in the payload so tests and oracles are
    * stable: an 8-dim "embedding" from byte histogram octants.
    */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    hist.map(h => (h / n).toFloat)
  }

  /** Decode + feature-extract over a media dataset. Batched per partition;
    * the decode is the stub above.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val digest = md.digest(r.bytes).map("%02x".format(_)).mkString
        val sum = r.bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
        val frames = if (r.media_type == "video") math.max(1, (r.duration_ms / 40).toInt) else 1
        MediaFeatures(r.media_id, r.media_type, r.bytes.length.toLong, digest,
          if (r.bytes.isEmpty) 0.0 else sum.toDouble / r.bytes.length,
          frames, fakeDecode(r.bytes))
      }
    }
  }

  /** "Resize" stub: real impl decodes, scales, re-encodes; the stub truncates
    * the payload deterministically to w*h bytes — preserving the plumbing
    * contract (binary in → smaller binary out + updated metadata).
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val target = math.min(r.bytes.length, w * h)
      r.copy(bytes = java.util.Arrays.copyOf(r.bytes, target), width = w, height = h)
    }
  }

  /** Frame-sample stub for video rows: every `everyMs` ms → one "frame"
    * (a deterministic byte slice). Non-video rows pass through unchanged
    * with a single frame. Output: (media_id, frame_idx, frame_bytes).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = if (r.media_type == "video" && r.duration_ms > 0)
        math.max(1, (r.duration_ms / everyMs).toInt) else 1
      val span = math.max(r.bytes.length / math.max(n, 1), 1)
      (0 until n).map { i =>
        val from = math.min(i * span, math.max(r.bytes.length - 1, 0))
        val until = math.min(from + span, r.bytes.length)
        (r.media_id, i, java.util.Arrays.copyOfRange(r.bytes, from, until))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Wrap a text corpus as opaque media payloads — lets the multimodal
    * plumbing run against the driver's `documents` table (no binary fixtures
    * exist in the environment; payload = utf-8 bytes, deterministic).
    */
  def documentsAsMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("media_type"),
      lit("application/octet-stream").as("mime"),
      encode(col("text"), "UTF-8").as("bytes"),
      lit(-1).as("width"), lit(-1).as("height"), lit(0L).as("duration_ms"))
      .as[MediaRow]
  }
}
