package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batched per-partition passes.
  *
  * IMAGE decode is REAL: `javax.imageio` (public JDK API, no external libs)
  * parses PNG/BMP/GIF/JPEG payloads into width/height/pixel statistics on
  * the executor. AUDIO decode is REAL too: `javax.sound.sampled` parses
  * WAV/AIFF/AU PCM payloads into rate/channels/frames/sample statistics.
  * VIDEO decode remains STUBBED with a deterministic fake (`fakeDecode`)
  * because no video codec exists in the JDK or this environment — swapping
  * the stub for a JNI/library call is the only change needed in production;
  * undecodable payloads also fall back to the stub rather than failing the
  * batch (corrupt blobs are data, not bugs, at corpus scale).
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

  /** Extracted feature row (decode → feature-extract output). `decoded`
    * marks rows whose image fields came from a REAL javax.imageio parse
    * (img_w/img_h/px_sum valid, feature = luminance histogram); on false
    * the image fields are -1 and `feature` is the payload-histogram stub.
    */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      content_hash: String,
      mean_byte: Double,
      frame_count: Int,
      feature: Array[Float],
      img_w: Int,
      img_h: Int,
      px_sum: Long,
      decoded: Boolean)

  /** REAL image decode via javax.imageio (PNG/BMP/GIF/JPEG — the formats
    * the JDK ships readers for). Returns (width, height, px_sum, feature):
    * px_sum = Σ(r+g+b) over all pixels (an exact integer an oracle can
    * recompute for a synthetic image), feature = 8-bin luminance histogram
    * normalized by pixel count. None when the payload is not a decodable
    * image — callers fall back to [[fakeDecode]].
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Long, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Long](8)
        var pxSum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            pxSum += r + g + b
            // integer BT.601 luma; >>5 buckets 0..255 into 8 bins
            hist((r * 299 + g * 587 + b * 114) / 1000 >> 5) += 1
            x += 1
          }
          y += 1
        }
        val n = math.max(w * h, 1).toDouble
        Some((w, h, pxSum, hist.map(v => (v / n).toFloat)))
      }
    } catch { case _: Exception => None }

  /** STUB decoder for media the sandbox has no codecs for (audio/video) and
    * undecodable image payloads. Deterministic in the payload so tests and
    * oracles are stable: an 8-dim "embedding" from byte histogram octants.
    */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    hist.map(h => (h / n).toFloat)
  }

  /** Decode + feature-extract over a media dataset. Batched per partition;
    * image rows go through the REAL [[decodeImage]], everything else (and
    * undecodable payloads) through the [[fakeDecode]] stub.
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
        val img = if (r.media_type == "image") decodeImage(r.bytes) else None
        MediaFeatures(r.media_id, r.media_type, r.bytes.length.toLong, digest,
          if (r.bytes.isEmpty) 0.0 else sum.toDouble / r.bytes.length,
          frames,
          img.map(_._4).getOrElse(fakeDecode(r.bytes)),
          img.map(_._1).getOrElse(-1),
          img.map(_._2).getOrElse(-1),
          img.map(_._3).getOrElse(-1L),
          img.isDefined)
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

  /** Extracted audio feature row: `decoded` marks rows whose fields came
    * from a REAL javax.sound.sampled parse; on false the audio fields are
    * -1 (undecodable payloads are data, not bugs).
    */
  final case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      n_channels: Int,
      n_frames: Long,
      sample_sum: Long,
      decoded: Boolean)

  /** REAL audio decode via javax.sound.sampled (public JDK API — WAV/AIFF/AU
    * containers with PCM payloads). Returns (sampleRate, channels, frames,
    * sampleSum) where sampleSum is the exact Σ of signed 16-bit samples —
    * an integer an oracle can recompute for a synthetic waveform. None when
    * the payload is not decodable 16-bit PCM.
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val data = in.readAllBytes()
          val le = !fmt.isBigEndian
          var sum = 0L
          var i = 0
          while (i + 1 < data.length) {
            val lo = data(i) & 0xff
            val hi = data(i + 1) & 0xff
            val s = if (le) (hi << 8) | lo else (lo << 8) | hi
            sum += s.toShort.toLong
            i += 2
          }
          Some((fmt.getSampleRate.toInt, fmt.getChannels,
            data.length.toLong / math.max(fmt.getFrameSize, 1), sum))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Decode + feature-extract for audio rows — batched per partition like
    * [[extractFeatures]]; non-audio or undecodable payloads yield -1 fields
    * with `decoded` false rather than failing the batch.
    */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val au = if (r.media_type == "audio") decodeAudio(r.bytes) else None
        AudioFeatures(r.media_id,
          au.map(_._1).getOrElse(-1), au.map(_._2).getOrElse(-1),
          au.map(_._3).getOrElse(-1L), au.map(_._4).getOrElse(-1L),
          au.isDefined)
      }
    }
  }

  /** A REAL 16-bit PCM mono WAV whose samples are a pure function of
    * `docId`: 8 kHz, 40 + docId%25 frames, sample i =
    * ((docId·31 + i·7) mod 65536) − 32768. The RIFF/fmt/data layout is
    * assembled by hand (chunk sizes, block align, little-endian samples —
    * the details a real parser must get right), so javax.sound.sampled
    * performs a genuine parse while an oracle recomputes frames and
    * sample_sum arithmetically from docId alone.
    */
  def syntheticWav(docId: Long): Array[Byte] = {
    val n = (40 + docId % 25).toInt
    val dataSize = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('R'.toByte).put('I'.toByte).put('F'.toByte).put('F'.toByte)
      .putInt(36 + dataSize)
      .put('W'.toByte).put('A'.toByte).put('V'.toByte).put('E'.toByte)
      .put('f'.toByte).put('m'.toByte).put('t'.toByte).put(' '.toByte)
      .putInt(16).putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(16000).putShort(2).putShort(16) // rate, byteRate, align, bits
      .put('d'.toByte).put('a'.toByte).put('t'.toByte).put('a'.toByte)
      .putInt(dataSize)
    var i = 0
    while (i < n) {
      out.putShort((((docId * 31 + i * 7) % 65536) - 32768).toShort)
      i += 1
    }
    out.array()
  }

  /** One synthetic WAV [[MediaRow]] per document id — the oracle-checkable
    * real-audio-decode path (see [[syntheticWav]]).
    */
  def syntheticWavs(docs: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol)).as[Long].map { id =>
      MediaRow(id, "audio", "audio/wav", syntheticWav(id), -1, -1, 0L)
    }
  }

  /** A REAL 24-bit uncompressed BMP whose pixels are a pure function of
    * `docId`: width 4 + docId%5, height 3 + docId%3, and logical (top-down,
    * row-major) pixel i carries channels R,G,B = (docId·31 + i·7 + c·13) mod
    * 256 for c = 0,1,2. The byte layout is assembled by hand (bottom-up rows,
    * BGR order, 4-byte row padding — the details a real decoder must get
    * right), so javax.imageio performs a genuine parse, while an oracle can
    * recompute width/height/px_sum arithmetically from docId alone.
    */
  def syntheticBmp(docId: Long): Array[Byte] = {
    val w = (4 + docId % 5).toInt
    val h = (3 + docId % 3).toInt
    def v(i: Int, c: Int): Int = (((docId * 31 + i * 7 + c * 13) % 256) + 256).toInt % 256
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var j = 0
    while (j < h) {
      val y = h - 1 - j // positive-height BMP stores rows bottom-up
      var x = 0
      while (x < w) {
        val i = y * w + x
        out.put(v(i, 2).toByte).put(v(i, 1).toByte).put(v(i, 0).toByte)
        x += 1
      }
      var pad = rowSize - 3 * w
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      j += 1
    }
    out.array()
  }

  /** One synthetic BMP [[MediaRow]] per document id — the oracle-checkable
    * real-decode path (see [[syntheticBmp]]).
    */
  def syntheticBmps(docs: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol)).as[Long].map { id =>
      MediaRow(id, "image", "image/bmp", syntheticBmp(id), -1, -1, 0L)
    }
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
