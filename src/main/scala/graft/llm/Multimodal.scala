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
  * VIDEO container-header parsing is REAL as well — pure-JVM MP4 box walk
  * and Matroska EBML walk ([[parseVideoMeta]]) yield genuine
  * width/height/duration for video rows; only FRAME decode remains STUBBED
  * with a deterministic fake (`fakeDecode`) because no video codec exists
  * in the JDK or this environment — swapping that stub for a JNI/library
  * call is the only change needed in production. Undecodable payloads fall
  * back to the stub rather than failing the batch (corrupt blobs are data,
  * not bugs, at corpus scale).
  *
  * Scale notes: `mapPartitions` processes one partition's blobs as a stream
  * (no per-row lambda dispatch); media tables should be written with
  * `maxRecordsPerFile` tuned so a partition's blobs fit executor memory, and
  * partitioned by `media_type` so an image-only pass prunes audio/video files
  * at the scan.
  */
object Multimodal {

  // ImageIO's default stream cache backs every read/write call with a
  // CREATED-AND-DELETED TEMP FILE; at 32 concurrent tasks the filesystem
  // churn dominates tiny-payload codec work (measured r17: the 5000-image
  // synth+decode pass drops 3.05 s → 0.23 s under local[32] with the
  // memory cache). Payloads here are KB-scale, so the in-memory stream
  // cache is strictly better. JVM-global, set once at object init — every
  // decode/encode call site lives in this object, so executors flip it
  // before their first codec task.
  javax.imageio.ImageIO.setUseCache(false)

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
    * image rows go through the REAL [[decodeImage]], video rows through the
    * REAL [[parseVideoMeta]] container parse (dimensions land in
    * img_w/img_h, frame_count derives from the PARSED duration at 25 fps,
    * falling back to the row's metadata duration), everything else (and
    * undecodable payloads) through the [[fakeDecode]] stub with
    * `decoded` false.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val digest = md.digest(r.bytes).map("%02x".format(_)).mkString
        val sum = r.bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
        val img = if (r.media_type == "image") decodeImage(r.bytes) else None
        val vid = if (r.media_type == "video") parseVideoMeta(r.bytes) else None
        val durMs = vid.map(_._4).getOrElse(r.duration_ms)
        val frames = if (r.media_type == "video") math.max(1, (durMs / 40).toInt) else 1
        MediaFeatures(r.media_id, r.media_type, r.bytes.length.toLong, digest,
          if (r.bytes.isEmpty) 0.0 else sum.toDouble / r.bytes.length,
          frames,
          img.map(_._4).getOrElse(fakeDecode(r.bytes)),
          img.map(_._1).orElse(vid.map(_._2)).getOrElse(-1),
          img.map(_._2).orElse(vid.map(_._3)).getOrElse(-1),
          img.map(_._3).getOrElse(-1L),
          img.isDefined || vid.isDefined)
      }
    }
  }

  /** Average-hash (aHash) perceptual fingerprint over REAL decoded pixels —
    * the standard image near-dup key (identical hash → duplicate candidate;
    * small Hamming distance → near-duplicate): integer grayscale per grid
    * cell, bit set iff the cell is at-or-above the image mean. The mean
    * compare is division-free (`g·n >= Σg`), so every bit is exact integer
    * arithmetic an oracle can recompute. Images up to 64 pixels hash on
    * their full grid; larger ones sample a deterministic 8×8 grid
    * (`x = k·w div 8` — index arithmetic, not resampling, so the same
    * pixels are reproducible from the construction). Hash fits a long
    * (≤ 64 bits). Rows that fail to decode emit `decoded = false` with
    * sentinel values rather than vanishing.
    *
    * Scale shape: pure map-side `mapPartitions` over the payload column —
    * zero shuffles; downstream near-dup grouping is a hash groupBy
    * (`d1_dedup_exact`'s shape on the perceptual key).
    */
  def imageAHash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img =
          if (r.media_type == "image")
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes)))
            catch { case _: Exception => None }
          else None
        img match {
          case Some(im) =>
            val w = im.getWidth
            val h = im.getHeight
            val (gw, gh) = if (w.toLong * h <= 64L) (w, h) else (8, 8)
            val n = gw * gh
            val grays = new Array[Long](n)
            var j = 0
            while (j < gh) {
              var k = 0
              while (k < gw) {
                val x = if (gw == w) k else k * w / 8
                val y = if (gh == h) j else j * h / 8
                val rgb = im.getRGB(x, y)
                grays(j * gw + k) =
                  (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                k += 1
              }
              j += 1
            }
            val tot = grays.sum
            var hash = 0L
            var bits = 0
            var i = 0
            while (i < n) {
              if (grays(i) * n >= tot) { hash |= 1L << i; bits += 1 }
              i += 1
            }
            (r.media_id, hash, bits, true)
          case None => (r.media_id, -1L, -1, false)
        }
      }
    }.toDF("media_id", "ahash", "n_bits", "decoded")
  }

  /** Spectral perceptual hash over REAL decoded pixels: a Walsh–Hadamard
    * transform (the exact-integer fast-DCT sibling — ±1 basis instead of
    * cosines, so no float coefficient ever exists) over the row-major
    * grayscale sequence; bit k is the SIGN of spectral coefficient
    * c_k = Σ_i gy_i · (−1)^popcount(i AND k). Where [[imageAHash]] keys on
    * per-pixel brightness vs the mean (spatial), this keys on the
    * frequency envelope — the pHash idea with arithmetic an external
    * engine replays bit-for-bit (the oracle recomputes every coefficient
    * from the synthetic-BMP pixel formula via bit_count). 60 bits keeps
    * 2^k inside a positive long.
    *
    * Scale shape: pure map-side mapPartitions like [[imageAHash]] — zero
    * shuffles; O(nBits · pixels) integer work per image.
    */
  def imageSpectralHash(media: Dataset[MediaRow], nBits: Int = 60): DataFrame = {
    require(nBits >= 1 && nBits <= 62, s"nBits must be in [1,62]: $nBits")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img =
          if (r.media_type == "image")
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes)))
            catch { case _: Exception => None }
          else None
        img match {
          case Some(im) =>
            val w = im.getWidth
            val h = im.getHeight
            val (gw, gh) = if (w.toLong * h <= 64L) (w, h) else (8, 8)
            val n = gw * gh
            val grays = new Array[Long](n)
            var j = 0
            while (j < gh) {
              var k = 0
              while (k < gw) {
                val x = if (gw == w) k else k * w / 8
                val y = if (gh == h) j else j * h / 8
                val rgb = im.getRGB(x, y)
                grays(j * gw + k) =
                  (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                k += 1
              }
              j += 1
            }
            var hash = 0L
            var bits = 0
            var kk = 0
            while (kk < nBits) {
              var c = 0L
              var i = 0
              while (i < n) {
                if ((java.lang.Long.bitCount((i & kk).toLong) & 1) == 1) c -= grays(i)
                else c += grays(i)
                i += 1
              }
              if (c >= 0) { hash |= 1L << kk; bits += 1 }
              kk += 1
            }
            (r.media_id, hash, bits, true)
          case None => (r.media_id, -1L, -1, false)
        }
      }
    }.toDF("media_id", "whash", "n_bits", "decoded")
  }

  /** "Resize" stub for payloads with no decoder (the fallback path of
    * [[resizeImages]]): truncates the payload deterministically to w*h
    * bytes — preserving the plumbing contract (binary in → smaller binary
    * out + updated metadata).
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val target = math.min(r.bytes.length, w * h)
      r.copy(bytes = java.util.Arrays.copyOf(r.bytes, target), width = w, height = h)
    }
  }

  /** Hand-rolled 24-bit BMP encoder (the [[syntheticBmp]] layout
    * generalized to arbitrary pixels): bottom-up BGR rows, 4-byte row
    * padding. `rgb` is row-major TOP-DOWN 0xRRGGBB.
    */
  def encodeBmp(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h, s"need $w*$h pixels, got ${rgb.length}")
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var j = 0
    while (j < h) {
      val y = h - 1 - j
      var x = 0
      while (x < w) {
        val v = rgb(y * w + x)
        out.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
          .put(((v >> 16) & 0xff).toByte)
        x += 1
      }
      var pad = rowSize - 3 * w
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      j += 1
    }
    out.array()
  }

  /** REAL image resize: decode via `javax.imageio`, NEAREST-NEIGHBOR
    * sample with pure index arithmetic (src_x = x·srcW div dstW — no
    * filtering kernel, so every output pixel is an exact copy of a
    * reproducible source pixel an oracle can name), re-encode as 24-bit
    * BMP. The output payload round-trips through the same real decode
    * path ([[decodeImage]]), which is what the m_image_resize entry
    * checks end to end. Payloads that don't decode fall back to the
    * deterministic byte-truncate stub ([[resize]] semantics) rather than
    * failing the batch. Map-side `mapPartitions` (codec work) — zero
    * shuffles.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.bytes)) catch { case _: Exception => null }
        if (img == null) {
          val target = math.min(r.bytes.length, w * h)
          r.copy(bytes = java.util.Arrays.copyOf(r.bytes, target),
            width = w, height = h)
        } else {
          val sw = img.getWidth
          val sh = img.getHeight
          val rgb = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            val sy = y * sh / h
            var x = 0
            while (x < w) {
              rgb(y * w + x) = img.getRGB(x * sw / w, sy) & 0xffffff
              x += 1
            }
            y += 1
          }
          r.copy(bytes = encodeBmp(w, h, rgb), width = w, height = h,
            mime = "image/bmp")
        }
      }
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

  /** Decode a WAV/AIFF/AU payload to its raw samples plus the sample rate.
    * PRECONDITION: 16-bit MONO only — any multi-channel or non-16-bit
    * stream returns None (it is NOT decoded interleaved), which downstream
    * ([[decimateAudio]]) surfaces as an undecimated pass-through that the
    * feature pass reports `decoded = false`, never a silent wrong answer.
    */
  private def decodeSamples(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else {
          val data = in.readAllBytes()
          val le = !fmt.isBigEndian
          val out = new Array[Short](data.length / 2)
          var i = 0
          while (i + 1 < data.length) {
            val lo = data(i) & 0xff
            val hi = data(i + 1) & 0xff
            out(i / 2) = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort
            i += 2
          }
          Some((fmt.getSampleRate.toInt, out))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Re-assemble a 16-bit PCM mono LE WAV around raw samples — the writer
    * half of the decode path, so a decimate→encode→decode cycle exercises
    * both directions of the container layout.
    */
  private def encodeWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('R'.toByte).put('I'.toByte).put('F'.toByte).put('F'.toByte)
      .putInt(36 + dataSize)
      .put('W'.toByte).put('A'.toByte).put('V'.toByte).put('E'.toByte)
      .put('f'.toByte).put('m'.toByte).put('t'.toByte).put(' '.toByte)
      .putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put('d'.toByte).put('a'.toByte).put('t'.toByte).put('a'.toByte)
      .putInt(dataSize)
    samples.foreach(out.putShort)
    out.array()
  }

  /** REAL audio decimation (the audio sibling of [[resizeImages]]): decode
    * 16-bit PCM mono → keep every `factor`-th sample (index arithmetic, no
    * filter kernel — every output sample is an exact copy of a nameable
    * source sample) → re-encode at rate/factor → the next decode reads the
    * re-assembled container. Non-decodable payloads pass through unchanged
    * (the downstream feature pass reports them `decoded=false`).
    */
  def decimateAudio(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1, "decimateAudio: factor must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val dec = if (r.media_type == "audio") decodeSamples(r.bytes) else None
        dec match {
          case Some((rate, samples)) =>
            val n = (samples.length + factor - 1) / factor
            val kept = Array.tabulate(n)(i => samples(i * factor))
            r.copy(bytes = encodeWav(math.max(rate / factor, 1), kept))
          case None => r
        }
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

  /** Per-channel exact moments of a decoded image — the normalization
    * constants (per-channel mean/std) every vision training pipeline
    * computes over its corpus before feeding a model. Sums and
    * sums-of-squares stay exact longs (pixel values ≤ 255, so squares sum
    * safely for any real image); the corpus-level constants are one more
    * SUM over this table — never a second decode pass.
    */
  final case class ChannelStats(
      media_id: Long,
      n_px: Long,
      r_sum: Long, g_sum: Long, b_sum: Long,
      r_sq: Long, g_sq: Long, b_sq: Long,
      decoded: Boolean)

  /** REAL decode → per-channel Σ and Σ² (map-side codec work; undecodable
    * or non-image payloads emit a sentinel row with −1 fields).
    */
  def imageChannelStats(media: Dataset[MediaRow]): Dataset[ChannelStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = if (r.media_type == "image")
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes)))
          catch { case _: Exception => None }
        else None
        img match {
          case Some(im) =>
            val w = im.getWidth; val h = im.getHeight
            var rs = 0L; var gs = 0L; var bs = 0L
            var rq = 0L; var gq = 0L; var bq = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = im.getRGB(x, y)
                val rr = ((rgb >> 16) & 0xff).toLong
                val gg = ((rgb >> 8) & 0xff).toLong
                val bb = (rgb & 0xff).toLong
                rs += rr; gs += gg; bs += bb
                rq += rr * rr; gq += gg * gg; bq += bb * bb
                x += 1
              }
              y += 1
            }
            ChannelStats(r.media_id, w.toLong * h, rs, gs, bs, rq, gq, bq, decoded = true)
          case None =>
            ChannelStats(r.media_id, -1L, -1L, -1L, -1L, -1L, -1L, -1L, decoded = false)
        }
      }
    }
  }

  /** One fixed-length energy window of a decoded audio stream: the
    * voice-activity / silence-detection primitive. `energy` = Σ s² and
    * `peak` = max |s| over the window's 16-bit samples — exact integers a
    * cross-engine oracle can recompute (a silence gate is then a consumer-
    * side threshold on this table).
    */
  final case class AudioWindow(
      media_id: Long,
      win_idx: Int,
      n_samples: Long,
      energy: Long,
      peak: Long)

  /** Windowed audio energy/peak over REAL decoded PCM — the audio sibling
    * of [[sampleFrames]]: decode (javax.sound.sampled), split the sample
    * stream into fixed `windowSamples`-sized windows (last window ragged),
    * emit one row per window. Map-side only (`mapPartitions` is justified:
    * codec work, no Catalyst form); undecodable or non-audio payloads emit
    * nothing — they are [[extractAudioFeatures]]' sentinel rows' job.
    */
  def audioEnergyWindows(media: Dataset[MediaRow], windowSamples: Int): Dataset[AudioWindow] = {
    require(windowSamples >= 1, s"audioEnergyWindows: windowSamples >= 1: $windowSamples")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val au = if (r.media_type == "audio") decodeSamples(r.bytes) else None
        au.toSeq.flatMap { case (_, samples) =>
          samples.grouped(windowSamples).zipWithIndex.map { case (w, i) =>
            var energy = 0L; var peak = 0L
            w.foreach { s =>
              energy += s.toLong * s.toLong
              peak = math.max(peak, math.abs(s.toLong))
            }
            AudioWindow(r.media_id, i, w.length.toLong, energy, peak)
          }
        }
      }
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
  /** Width/height shared by every synthetic still image (BMP and PNG) —
    * and by the shared ImageDecodeSql oracle arithmetic. */
  def imgDims(docId: Long): (Int, Int) = ((4 + docId % 5).toInt, (3 + docId % 3).toInt)

  /** Channel c of logical (top-down row-major) pixel i — the ONE formula
    * the BMP bytes, the PNG pixels, the channel-stats oracle and the
    * decode oracles all share. */
  def imgPx(docId: Long, i: Int, c: Int): Int =
    (((docId * 31 + i * 7 + c * 13) % 256) + 256).toInt % 256

  def syntheticBmp(docId: Long): Array[Byte] = {
    val (w, h) = imgDims(docId)
    def v(i: Int, c: Int): Int = imgPx(docId, i, c)
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

  /** A REAL PNG with the SAME logical pixels as [[syntheticBmp]]: encoded
    * through javax.imageio's PNG writer (filter + DEFLATE — the genuine
    * lossless-codec path beside BMP's raw layout and JPEG's lossy one), so
    * decode must reproduce the formula pixels EXACTLY and the BMP oracle
    * arithmetic transfers verbatim. Encoded bytes are writer-dependent;
    * only the decoded pixels are under any contract.
    */
  def syntheticPng(docId: Long): Array[Byte] = {
    val (w, h) = imgDims(docId)
    def v(i: Int, c: Int): Int = imgPx(docId, i, c)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        img.setRGB(x, y, (v(i, 0) << 16) | (v(i, 1) << 8) | v(i, 2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def syntheticPngs(docs: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol)).as[Long].map { id =>
      MediaRow(id, "image", "image/png", syntheticPng(id), -1, -1, 0L)
    }
  }

  /** Parsed video container metadata. `decoded` marks rows whose fields
    * came from a REAL container-header parse ([[parseVideoMeta]]); on false
    * the fields are -1 ("none" container) — undecodable payloads are data,
    * not bugs.
    */
  final case class VideoMeta(
      media_id: Long,
      container: String, // "mp4" | "mkv" | "none"
      width: Int,
      height: Int,
      duration_ms: Long,
      decoded: Boolean)

  /** Pure-JVM MP4 / ISO-BMFF container-header parse (public format,
    * ISO/IEC 14496-12 box grammar): walks the box tree — 32-bit and 64-bit
    * (`size==1` → largesize) and to-end (`size==0`) box lengths — to
    * `moov/mvhd` for (timescale, duration) and the FIRST `moov/trak/tkhd`
    * for track dimensions (16.16 fixed point), handling both version-0 and
    * version-1 full-box layouts. Returns (width, height, duration_ms).
    * Container metadata only: no codec exists in this JDK, so sample/frame
    * decode stays stubbed ([[fakeDecode]]) — swapping that stub for a
    * JNI/library call is the only production change.
    */
  def parseMp4Meta(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
      def u32(off: Long): Long = bb.getInt(off.toInt) & 0xffffffffL
      // payload range of the first box named `name` fully inside [from, to)
      def findBox(from: Long, to: Long, name: String): Option[(Long, Long)] = {
        var off = from
        while (off + 8 <= to) {
          val sz0 = u32(off)
          val typ = new String(bytes, off.toInt + 4, 4, "ISO-8859-1")
          val (hdr, sz) =
            if (sz0 == 1 && off + 16 <= to) (16L, bb.getLong(off.toInt + 8))
            else if (sz0 == 0) (8L, to - off)
            else (8L, sz0)
          if (sz < hdr || off + sz > to) return None
          if (typ == name) return Some((off + hdr, off + sz))
          off += sz
        }
        None
      }
      for {
        (moovS, moovE) <- findBox(0L, bytes.length.toLong, "moov")
        (mvhdS, _) <- findBox(moovS, moovE, "mvhd")
        (trakS, trakE) <- findBox(moovS, moovE, "trak")
        (tkhdS, _) <- findBox(trakS, trakE, "tkhd")
      } yield {
        val (timescale, durTicks) =
          if (bytes(mvhdS.toInt) == 0) (u32(mvhdS + 12), u32(mvhdS + 16))
          else (u32(mvhdS + 20), bb.getLong(mvhdS.toInt + 24))
        val dimOff = if (bytes(tkhdS.toInt) == 0) tkhdS + 76 else tkhdS + 88
        val w = (u32(dimOff) >> 16).toInt
        val h = (u32(dimOff + 4) >> 16).toInt
        val durMs = if (timescale > 0) durTicks * 1000L / timescale else -1L
        (w, h, durMs)
      }
    } catch { case _: Exception => None }

  /** Pure-JVM Matroska/WebM container-header parse (public format — EBML
    * varint grammar): walks Segment → Info for (TimestampScale, Duration)
    * and Segment → Tracks → TrackEntry → Video for PixelWidth/PixelHeight.
    * EBML IDs keep their length-marker bit, sizes clear it — the detail a
    * real parser must get right. Returns (width, height, duration_ms) with
    * duration = Duration·TimestampScale nanoseconds rounded to ms.
    */
  def parseMkvMeta(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      def vintLen(b: Int): Int = {
        var m = 0x80; var n = 1
        while (n <= 8 && (b & m) == 0) { m >>= 1; n += 1 }
        n
      }
      def readId(off: Int): (Long, Int) = {
        val n = vintLen(bytes(off) & 0xff)
        var v = 0L; var i = 0
        while (i < n) { v = (v << 8) | (bytes(off + i) & 0xff); i += 1 }
        (v, n)
      }
      def readSize(off: Int): (Long, Int) = {
        val b0 = bytes(off) & 0xff
        val n = vintLen(b0)
        var v = (b0 & (0xff >>> n)).toLong
        var i = 1
        while (i < n) { v = (v << 8) | (bytes(off + i) & 0xff); i += 1 }
        (v, n)
      }
      def uint(off: Int, len: Int): Long = {
        var v = 0L; var i = 0
        while (i < len) { v = (v << 8) | (bytes(off + i) & 0xff); i += 1 }
        v
      }
      def fl(off: Int, len: Int): Double =
        if (len == 4) java.lang.Float.intBitsToFloat(uint(off, 4).toInt).toDouble
        else java.lang.Double.longBitsToDouble(uint(off, 8))
      // payload range of the first child with `id` fully inside [from, to)
      def find(from: Int, to: Int, id: Long): Option[(Int, Int)] = {
        var off = from
        while (off < to) {
          val (eid, in) = readId(off)
          val (sz, sn) = readSize(off + in)
          val ps = off + in + sn
          if (ps + sz > to) return None
          if (eid == id) return Some((ps, ps + sz.toInt))
          off = ps + sz.toInt
        }
        None
      }
      for {
        (segS, segE) <- find(0, bytes.length, 0x18538067L) // Segment
        (infoS, infoE) <- find(segS, segE, 0x1549A966L)    // Info
        (trksS, trksE) <- find(segS, segE, 0x1654AE6BL)    // Tracks
        (teS, teE) <- find(trksS, trksE, 0xAEL)            // TrackEntry
        (vidS, vidE) <- find(teS, teE, 0xE0L)              // Video
        (wS, wE) <- find(vidS, vidE, 0xB0L)                // PixelWidth
        (hS, hE) <- find(vidS, vidE, 0xBAL)                // PixelHeight
      } yield {
        val tsScale = find(infoS, infoE, 0x2AD7B1L)
          .map { case (a, b) => uint(a, b - a) }.getOrElse(1000000L)
        val durMs = find(infoS, infoE, 0x4489L)
          .map { case (a, b) => math.round(fl(a, b - a) * tsScale / 1e6) }
          .getOrElse(-1L)
        (uint(wS, wE - wS).toInt, uint(hS, hE - hS).toInt, durMs)
      }
    } catch { case _: Exception => None }

  /** Container sniff + parse: `ftyp` at offset 4 → MP4 box walk, EBML magic
    * at offset 0 → Matroska walk. None for anything else (caller falls back
    * to -1 fields, the corrupt-payload discipline).
    */
  def parseVideoMeta(bytes: Array[Byte]): Option[(String, Int, Int, Long)] =
    if (bytes.length >= 12 &&
        bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p')
      parseMp4Meta(bytes).map { case (w, h, d) => ("mp4", w, h, d) }
    else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x1a &&
        (bytes(1) & 0xff) == 0x45 && (bytes(2) & 0xff) == 0xdf &&
        (bytes(3) & 0xff) == 0xa3)
      parseMkvMeta(bytes).map { case (w, h, d) => ("mkv", w, h, d) }
    else None

  /** Container-metadata extraction for video rows — batched per partition
    * like [[extractFeatures]]; non-video or undecodable payloads yield -1
    * fields with `decoded` false rather than failing the batch.
    */
  def extractVideoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val vm = if (r.media_type == "video") parseVideoMeta(r.bytes) else None
        VideoMeta(r.media_id,
          vm.map(_._1).getOrElse("none"),
          vm.map(_._2).getOrElse(-1), vm.map(_._3).getOrElse(-1),
          vm.map(_._4).getOrElse(-1L), vm.isDefined)
      }
    }
  }

  /** Deterministic synthetic-video dimensions: a pure function of `docId`
    * shared by the generators AND the oracle SQL, so a parser that misreads
    * any layout detail hash-mismatches.
    */
  def videoDims(docId: Long): (Int, Int, Long) =
    ((160 + docId % 17).toInt, (90 + docId % 11).toInt, 1000L + docId % 4096)

  /** A REAL minimal MP4 whose header fields are a pure function of `docId`:
    * ftyp + moov(mvhd(timescale 1000, duration ms) + trak(tkhd with 16.16
    * fixed-point width/height)) — the box sizes, version-0 field offsets
    * and fixed-point shifts a real parser must get right. No media samples
    * (container metadata only).
    */
  def syntheticMp4(docId: Long): Array[Byte] = {
    val (w, h, durMs) = videoDims(docId)
    val out = java.nio.ByteBuffer.allocate(20 + 8 + 108 + 100)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def fourcc(s: String): Unit = s.foreach(c => out.put(c.toByte))
    // ftyp: size(4) type(4) major_brand(4) minor_version(4) compat_brand(4)
    out.putInt(20); fourcc("ftyp"); fourcc("isom"); out.putInt(0); fourcc("isom")
    out.putInt(8 + 108 + 100); fourcc("moov")
    out.putInt(108); fourcc("mvhd")
    out.putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // ctime, mtime
      .putInt(1000).putInt(durMs.toInt) // timescale ms, duration ticks
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, reserved
      .putInt(0).putInt(0) // reserved
    // identity matrix
    out.putInt(0x00010000).putInt(0).putInt(0)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => out.putInt(0)) // pre_defined
    out.putInt(2) // next_track_ID
    out.putInt(100); fourcc("trak")
    out.putInt(92); fourcc("tkhd")
    out.putInt(7) // version 0 + flags (enabled|in-movie|in-preview)
      .putInt(0).putInt(0) // ctime, mtime
      .putInt(1).putInt(0) // track_ID, reserved
      .putInt(durMs.toInt) // duration
      .putInt(0).putInt(0) // reserved
      .putShort(0).putShort(0).putShort(0).putShort(0) // layer, altgroup, volume, reserved
    out.putInt(0x00010000).putInt(0).putInt(0)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
    out.putInt(w << 16).putInt(h << 16) // 16.16 fixed-point dimensions
    out.array()
  }

  /** A REAL minimal Matroska file, fields a pure function of `docId`: EBML
    * header + Segment(Info(TimestampScale 1 ms, Duration as float64 ticks)
    * + Tracks(TrackEntry(Video(PixelWidth, PixelHeight)))) — hand-encoded
    * EBML varints (IDs keep the marker bit, sizes clear it).
    */
  def syntheticMkv(docId: Long): Array[Byte] = {
    val (w, h, durMs) = videoDims(docId)
    def elem(id: Array[Int], payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 127, "1-byte EBML size form only")
      id.map(_.toByte) ++ Array((0x80 | payload.length).toByte) ++ payload
    }
    def u16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
    def u32be(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def f64(v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (7 to 0 by -1).map(i => (bits >> (8 * i)).toByte).toArray
    }
    val info = elem(Array(0x15, 0x49, 0xa9, 0x66),
      elem(Array(0x2a, 0xd7, 0xb1), u32be(1000000L)) ++ // TimestampScale: 1 ms
        elem(Array(0x44, 0x89), f64(durMs.toDouble)))   // Duration in ticks
    val video = elem(Array(0xe0),
      elem(Array(0xb0), u16(w)) ++ elem(Array(0xba), u16(h)))
    val tracks = elem(Array(0x16, 0x54, 0xae, 0x6b), elem(Array(0xae), video))
    val ebmlHeader = elem(Array(0x1a, 0x45, 0xdf, 0xa3), Array.empty[Byte])
    val segment = elem(Array(0x18, 0x53, 0x80, 0x67), info ++ tracks)
    ebmlHeader ++ segment
  }

  /** One synthetic video [[MediaRow]] per document id — even ids get MP4,
    * odd ids Matroska, so ONE query exercises both parsers. Metadata fields
    * are left unknown (-1/0): the parse must derive them from the payload.
    */
  def syntheticVideos(docs: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol)).as[Long].map { id =>
      if (id % 2 == 0)
        MediaRow(id, "video", "video/mp4", syntheticMp4(id), -1, -1, 0L)
      else
        MediaRow(id, "video", "video/x-matroska", syntheticMkv(id), -1, -1, 0L)
    }
  }

  /** LSH-banded image near-duplicate pairs over the perceptual aHash —
    * the image counterpart of MinHash/LSH text dedup: two images whose
    * aHashes differ in at most `maxHamming` bits are near-duplicate
    * candidates (re-encodes, small crops, brightness shifts), and banding
    * finds them WITHOUT the quadratic all-pairs scan: a pair within
    * Hamming distance d < nBands must agree exactly on at least one of
    * the nBands bit-bands (pigeonhole), so candidates = equi-join on
    * (band, band_value) — completeness is guaranteed for
    * maxHamming < nBands, never sampled away.
    *
    * Scale shape (100 TB of images): hash is map-side ([[imageAHash]]);
    * banding explodes ×nBands; candidates come from a bucket equi-join.
    * Buckets above `maxBucket` are DROPPED WHOLE (the [[graft.llm.Dedup]]
    * maxBucket discipline — a degenerate band value, e.g. the all-zero
    * band of uniform images, would otherwise fan out quadratically);
    * the drop is principled: giant buckets mean that band carries no
    * selectivity. Verification re-checks the EXACT Hamming distance on
    * the full hash, so banding never inflates the result.
    */
  def aHashNearDupPairs(media: Dataset[MediaRow], bandBits: Int = 10,
                        nBands: Int = 4, maxHamming: Int = 2,
                        maxBucket: Int = 64): DataFrame = {
    require(maxHamming < nBands,
      s"completeness needs maxHamming < nBands: $maxHamming >= $nBands")
    // Materialize the decode+hash subtree behind ONE round-robin exchange
    // before fanning out: the banding gate aggregate and BOTH self-join
    // sides otherwise re-execute the whole decode kernel per consumer
    // (profiled r17: three ~1 s decode jobs per run). The exchange carries
    // only (media_id, ahash) — 16 bytes/row — and AQE's exchange reuse
    // serves all three consumers from the one materialized stage
    // (optimization guide §2.4 / §3.3 "materialize an intermediate").
    val hashed = imageAHash(media).filter(col("decoded"))
      .select(col("media_id"), col("ahash"))
      .repartition(media.sparkSession.sparkContext.defaultParallelism)
    val bands = hashed.select(col("media_id"), col("ahash"), explode(array(
        (0 until nBands).map(b => struct(lit(b).as("band"),
          shiftright(col("ahash"), b * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1)).as("v"))): _*)).as("bv"))
      .select(col("media_id"), col("ahash"), col("bv.band"), col("bv.v"))
    // bucket-size gate: aggregate once, keep selective buckets only
    val ok = bands.groupBy("band", "v").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBucket).select("band", "v")
    val gated = bands.join(ok, Seq("band", "v"))
    val pairs = gated.select(col("band"), col("v"),
        col("media_id").as("id_a"), col("ahash").as("ha"))
      .join(gated.select(col("band"), col("v"),
        col("media_id").as("id_b"), col("ahash").as("hb")), Seq("band", "v"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ha", "hb").distinct()
    pairs.select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** One REAL decoded video frame: pixel dimensions + exact integer pixel
    * sum (Σ r+g+b), the per-frame twin of [[MediaFeatures]]' image fields.
    */
  final case class VideoFrame(
      media_id: Long,
      frame_idx: Int,
      img_w: Int,
      img_h: Int,
      px_sum: Long,
      decoded: Boolean)

  /** Pure-JVM RIFF/AVI container walk (public format — msdn AVI RIFF
    * grammar): `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    * LIST('movi' 00dc…))`. Returns the video stream's fourcc handler,
    * frame dimensions from the BITMAPINFOHEADER, and every `00dc`/`00db`
    * chunk payload in stream order. Little-endian sizes, word-aligned
    * chunk boundaries — the details a real parser must get right.
    */
  def parseAvi(bytes: Array[Byte]): Option[(String, Int, Int, Vector[Array[Byte]])] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(off: Int): String = new String(bytes, off, 4, "ISO-8859-1")
      if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      // find the first chunk with `id` in [from, to); LIST chunks match on
      // their list-type instead, returning the payload AFTER the type tag
      def find(from: Int, to: Int, id: String): Option[(Int, Int)] = {
        var off = from
        while (off + 8 <= to) {
          val cid = fourcc(off)
          val sz = bb.getInt(off + 4)
          if (sz < 0 || off + 8 + sz > to) return None
          if (cid == id) return Some((off + 8, off + 8 + sz))
          if (cid == "LIST" && sz >= 4 && fourcc(off + 8) == id)
            return Some((off + 12, off + 8 + sz))
          off += 8 + sz + (sz & 1) // chunks are word-aligned
        }
        None
      }
      for {
        (hdrlS, hdrlE) <- find(12, bytes.length, "hdrl")
        (strlS, strlE) <- find(hdrlS, hdrlE, "strl")
        (strhS, _) <- find(strlS, strlE, "strh")
        (strfS, _) <- find(strlS, strlE, "strf") if fourcc(strhS) == "vids"
        (moviS, moviE) <- find(12, bytes.length, "movi")
      } yield {
        val handler = fourcc(strhS + 4)
        val w = bb.getInt(strfS + 4)
        val h = bb.getInt(strfS + 8)
        val frames = Vector.newBuilder[Array[Byte]]
        var off = moviS
        while (off + 8 <= moviE) {
          val cid = fourcc(off)
          val sz = bb.getInt(off + 4)
          if (sz < 0 || off + 8 + sz > moviE) { off = moviE }
          else {
            if (cid.endsWith("dc") || cid.endsWith("db"))
              frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + sz)
            off += 8 + sz + (sz & 1)
          }
        }
        (handler, w, math.abs(h), frames.result())
      }
    } catch { case _: Exception => None }

  /** Decode ONE AVI frame to (w, h, px_sum). `MJPG` frames are REAL JPEG
    * decodes through the same `javax.imageio` path as still images
    * ([[decodeImage]]) — motion-JPEG is the codec-free video format the
    * JDK can genuinely decode; `DIB ` frames are raw bottom-up BGR rows
    * with 4-byte row padding (the BMP pixel-array layout without the
    * header), summed directly in exact integer arithmetic.
    */
  def decodeAviFrame(handler: String, w: Int, h: Int,
                     frame: Array[Byte]): Option[(Int, Int, Long)] =
    handler match {
      case "MJPG" => decodeImage(frame).map { case (fw, fh, s, _) => (fw, fh, s) }
      case "DIB " =>
        val rowSize = (w * 3 + 3) / 4 * 4
        if (frame.length < rowSize * h) None
        else {
          var sum = 0L
          var y = 0
          while (y < h) {
            val row = (h - 1 - y) * rowSize // bottom-up storage
            var x = 0
            while (x < w) {
              sum += (frame(row + 3 * x) & 0xff) + (frame(row + 3 * x + 1) & 0xff) +
                (frame(row + 3 * x + 2) & 0xff)
              x += 1
            }
            y += 1
          }
          Some((w, h, sum))
        }
      case _ => None
    }

  /** REAL per-frame video decode over AVI payloads — the step the MP4/MKV
    * tier documents as codec-stubbed, completed codec-free: the container
    * walk yields MJPEG (JPEG-in-AVI) or uncompressed-DIB frames, both
    * genuinely decodable with the stock JDK. One output row per frame;
    * rows whose container or a frame fails to parse emit ONE sentinel row
    * (frame_idx -1, decoded false) rather than vanishing — corrupt blobs
    * are data, not bugs.
    *
    * Scale shape: `mapPartitions` flatMap, pure map-side (codec work — no
    * Catalyst form); output is frame-count-sized, so downstream per-frame
    * ops (aHash near-dup keys, frame sampling) inherit the still-image
    * shapes unchanged.
    */
  def decodeVideoFrames(media: Dataset[MediaRow]): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val frames = for {
          (handler, w, h, fs) <- parseAvi(r.bytes).toSeq
          (bytes, idx) <- fs.zipWithIndex
          (fw, fh, s) <- decodeAviFrame(handler, w, h, bytes)
        } yield VideoFrame(r.media_id, idx, fw, fh, s, decoded = true)
        if (frames.nonEmpty) frames
        else Seq(VideoFrame(r.media_id, -1, -1, -1, -1L, decoded = false))
      }
    }
  }

  /** Frame dimensions / count for the synthetic AVIs: a pure function of
    * `docId` shared by both generators AND the oracle SQL.
    */
  def aviDims(docId: Long): (Int, Int, Int) =
    ((4 + docId % 5).toInt, (3 + docId % 3).toInt, (2 + docId % 3).toInt)

  /** Logical pixel channel value for synthetic-AVI frame `f`, pixel `i`,
    * channel `c` — the [[syntheticBmp]] formula with a per-frame term.
    */
  def aviPx(docId: Long, f: Int, i: Int, c: Int): Int =
    (((docId * 31 + f * 101 + i * 7 + c * 13) % 256) + 256).toInt % 256

  private def packAvi(handler: String, compression: Int, w: Int, h: Int,
                      frames: Seq[Array[Byte]]): Array[Byte] = {
    val strh = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("strh".getBytes("ISO-8859-1")).putInt(56)
      .put("vids".getBytes("ISO-8859-1")).put(handler.getBytes("ISO-8859-1"))
      .putInt(0).putInt(0).putInt(0) // flags, prio+lang, initial frames
      .putInt(1).putInt(25) // scale, rate (25 fps)
      .putInt(0).putInt(frames.length) // start, length
      .putInt(0).putInt(-1).putInt(0) // suggested buffer, quality, sample size
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    val strf = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.put("strf".getBytes("ISO-8859-1")).putInt(40)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(compression).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    val avih = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.put("avih".getBytes("ISO-8859-1")).putInt(56)
      .putInt(40000).putInt(0).putInt(0).putInt(0) // usPerFrame, maxBps, pad, flags
      .putInt(frames.length).putInt(0).putInt(1).putInt(0) // frames, init, streams, buf
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    def list(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("ISO-8859-1")).putInt(4 + payload.length)
        .put(typ.getBytes("ISO-8859-1"))
      bb.array() ++ payload
    }
    val hdrl = list("hdrl", avih.array() ++ list("strl", strh.array() ++ strf.array()))
    val movi = list("movi", frames.flatMap { f =>
      val hdr = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      hdr.put("00dc".getBytes("ISO-8859-1")).putInt(f.length)
      hdr.array().toSeq ++ f.toSeq ++ (if ((f.length & 1) == 1) Seq(0.toByte) else Nil)
    }.toArray)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    val riff = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes("ISO-8859-1")).putInt(body.length)
    riff.array() ++ body
  }

  /** A REAL uncompressed-DIB AVI, every byte a pure function of `docId`:
    * 2+docId%3 frames of 4+docId%5 × 3+docId%3 pixels whose channels
    * follow [[aviPx]], stored as the AVI spec requires (bottom-up BGR rows,
    * 4-byte row padding, word-aligned `00dc` chunks) — so the walker
    * performs a genuine parse while an oracle recomputes every frame's
    * px_sum arithmetically from docId alone.
    */
  def syntheticAviDib(docId: Long): Array[Byte] = {
    val (w, h, n) = aviDims(docId)
    val rowSize = (w * 3 + 3) / 4 * 4
    val frames = (0 until n).map { f =>
      val out = new Array[Byte](rowSize * h)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          val i = y * w + x
          out(row + 3 * x) = aviPx(docId, f, i, 2).toByte // B
          out(row + 3 * x + 1) = aviPx(docId, f, i, 1).toByte // G
          out(row + 3 * x + 2) = aviPx(docId, f, i, 0).toByte // R
          x += 1
        }
        y += 1
      }
      out
    }
    packAvi("DIB ", 0, w, h, frames)
  }

  /** A REAL motion-JPEG AVI: the same logical frames as
    * [[syntheticAviDib]], each JPEG-encoded through `javax.imageio` — the
    * genuine lossy codec path (frames decode to APPROXIMATELY the [[aviPx]]
    * values; exact goldens come from committed fixtures, not arithmetic).
    */
  def syntheticAviMjpeg(docId: Long): Array[Byte] = {
    val (w, h, n) = aviDims(docId)
    val frames = (0 until n).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < w * h) {
        img.setRGB(i % w, i / w, (aviPx(docId, f, i, 0) << 16) |
          (aviPx(docId, f, i, 1) << 8) | aviPx(docId, f, i, 2))
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // 'MJPG' biCompression fourcc, little-endian in the struct field
    val mjpg = ('M'.toInt) | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)
    packAvi("MJPG", mjpg, w, h, frames)
  }

  /** One synthetic DIB-AVI [[MediaRow]] per document id — the
    * oracle-checkable real-frame-decode path (see [[syntheticAviDib]]).
    */
  def syntheticAvis(docs: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol)).as[Long].map { id =>
      MediaRow(id, "video", "video/x-msvideo", syntheticAviDib(id), -1, -1, 0L)
    }
  }

  // ---- Y4M (YUV4MPEG2) — the second codec-free video container ---------

  /** Parse a YUV4MPEG2 stream: one ASCII header line
    * (`YUV4MPEG2 W<w> H<h> [F..] [C<cs>]\n`), then per frame a
    * `FRAME[ params]\n` marker followed by raw planar pixel bytes. Raw
    * frames need no codec, so this is genuinely decodable in the sandbox
    * JDK — alongside DIB-AVI it shrinks the fakeDecode surface to
    * compressed codecs only. Supported chroma: `C444` (3 planes of w·h)
    * and `Cmono` (one plane); the spec's default 420 subsamplings return
    * None (unsupported-precondition, not silent garbage).
    * Returns (w, h, frames).
    */
  def parseY4m(bytes: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != 0x0A) i += 1
      i
    }
    val he = lineEnd(0)
    if (he >= bytes.length) None
    else {
      val toks = new String(bytes, 0, he, "ISO-8859-1").split(" ")
      if (toks.isEmpty || toks(0) != "YUV4MPEG2") None
      else {
        var w = -1; var h = -1; var cs = "420jpeg"
        for (t <- toks.iterator.drop(1)) {
          if (t.startsWith("W")) w = t.drop(1).toIntOption.getOrElse(-1)
          else if (t.startsWith("H")) h = t.drop(1).toIntOption.getOrElse(-1)
          else if (t.startsWith("C")) cs = t.drop(1)
        }
        val planeMult = cs match {
          case "444" => 3
          case "mono" => 1
          case _ => 0
        }
        // frame size in LONG arithmetic: a hostile header's W·H can
        // overflow Int to a negative/wrapped value, turning copyOfRange
        // into an uncaught throw — the sentinel-row contract demands None
        // for any undecodable payload, including absurd declared sizes
        val frameSizeL = if (w <= 0 || h <= 0) -1L else planeMult.toLong * w * h
        if (planeMult == 0 || frameSizeL <= 0 || frameSizeL > bytes.length) None
        else {
          val frameSize = frameSizeL.toInt
          val frames = Seq.newBuilder[Array[Byte]]
          var pos = he + 1
          var ok = true
          while (ok && pos < bytes.length) {
            val fe = lineEnd(pos)
            val marker = new String(bytes, pos, math.min(fe, bytes.length) - pos, "ISO-8859-1")
            if (!marker.startsWith("FRAME") || fe >= bytes.length ||
                fe + 1 + frameSize > bytes.length) ok = false
            else {
              frames += java.util.Arrays.copyOfRange(bytes, fe + 1, fe + 1 + frameSize)
              pos = fe + 1 + frameSize
            }
          }
          if (!ok) None else Some((w, h, frames.result()))
        }
      }
    }
  }

  /** REAL per-frame decode over Y4M payloads — the [[decodeVideoFrames]]
    * shape on the second codec-free container: one [[VideoFrame]] row per
    * frame with the exact integer sum of every plane byte (raw planar
    * storage — no codec, no float); undecodable payloads emit the one
    * sentinel row (frame_idx -1, decoded false).
    */
  def decodeY4mFrames(media: Dataset[MediaRow]): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val frames = for {
          (w, h, fs) <- parseY4m(r.bytes).toSeq
          (bytes, idx) <- fs.zipWithIndex
        } yield {
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
          VideoFrame(r.media_id, idx, w, h, sum, decoded = true)
        }
        if (frames.nonEmpty) frames
        else Seq(VideoFrame(r.media_id, -1, -1, -1, -1L, decoded = false))
      }
    }
  }

  /** A REAL C444 Y4M stream, every byte a pure function of `docId`: the
    * SAME logical frames as [[syntheticAviDib]] ([[aviDims]] dims,
    * [[aviPx]] channels — plane c holds channel c), so the per-frame sums
    * of the two containers are identical by construction and one oracle
    * arithmetic covers both.
    */
  def syntheticY4m(docId: Long): Array[Byte] = {
    val (w, h, n) = aviDims(docId)
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n".getBytes("ISO-8859-1")
    val marker = "FRAME\n".getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    out.write(header)
    for (f <- 0 until n) {
      out.write(marker)
      for (c <- 0 until 3; i <- 0 until w * h)
        out.write(aviPx(docId, f, i, c))
    }
    out.toByteArray
  }

  def syntheticY4ms(docs: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol)).as[Long].map { id =>
      MediaRow(id, "video", "video/x-yuv4mpeg2", syntheticY4m(id), -1, -1, 0L)
    }
  }

  /** A REAL animated GIF (LZW-compressed, palette-indexed — the third
    * multi-frame container the sandbox JDK can both WRITE and READ, via
    * javax.imageio's GIF plugin) carrying the SAME logical frames as
    * [[syntheticAviDib]]/[[syntheticY4m]] ([[aviDims]] dims, [[aviPx]]
    * channels): each frame's ≤ w·h ≤ 40 distinct colors become an exact
    * IndexColorModel palette, so the palette-indexed encode is LOSSLESS
    * and the decoded per-frame sums replay the one shared oracle formula.
    */
  def syntheticGif(docId: Long): Array[Byte] = {
    val (w, h, n) = aviDims(docId)
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      // interlace OFF: the JDK GIF pipeline's default progressive mode
      // writes interlaced frames whose row deinterlacing comes back
      // WRONG at these tiny heights (rows shifted/filled — measured);
      // sequential row order round-trips exactly
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      for (f <- 0 until n) {
        val rgb = Array.tabulate(w * h)(i =>
          (aviPx(docId, f, i, 0) << 16) | (aviPx(docId, f, i, 1) << 8) |
            aviPx(docId, f, i, 2))
        // palette PADDED to a power of two: the JDK GIF writer derives
        // bits-per-pixel from the map size and MISWRITES rows for
        // non-power-of-2 palettes (decoded rows shift — measured, not
        // hypothetical); padding with duplicates is lossless
        val distinctRgb = rgb.distinct
        val padTo = Integer.highestOneBit(
          math.max(2, distinctRgb.length * 2 - 1))
        val palette = distinctRgb ++
          Array.fill(padTo - distinctRgb.length)(distinctRgb.last)
        val icm = new java.awt.image.IndexColorModel(8, palette.length,
          palette.map(c => ((c >> 16) & 0xff).toByte),
          palette.map(c => ((c >> 8) & 0xff).toByte),
          palette.map(c => (c & 0xff).toByte))
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val idx = palette.zipWithIndex.toMap
        for (y <- 0 until h; x <- 0 until w)
          img.getRaster.setSample(x, y, 0, idx(rgb(y * w + x)))
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
      }
      writer.endWriteSequence()
      ios.flush()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  def syntheticGifs(docs: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol)).as[Long].map { id =>
      MediaRow(id, "video", "image/gif", syntheticGif(id), -1, -1, 0L)
    }
  }

  /** REAL per-frame decode of animated GIFs — the [[decodeVideoFrames]]
    * shape through javax.imageio's multi-image reader (getNumImages /
    * read(i) walk the GIF's image blocks): one [[VideoFrame]] per frame
    * with the exact R+G+B pixel sum; undecodable payloads emit the one
    * sentinel row (frame_idx -1, decoded false), never a throw.
    */
  def decodeGifFrames(media: Dataset[MediaRow]): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val frames: Seq[VideoFrame] =
          try {
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(r.bytes))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) Seq.empty
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                (0 until reader.getNumImages(true)).map { i =>
                  val img = reader.read(i)
                  var sum = 0L
                  for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
                    val c = img.getRGB(x, y)
                    sum += ((c >> 16) & 0xff) + ((c >> 8) & 0xff) + (c & 0xff)
                  }
                  VideoFrame(r.media_id, i, img.getWidth, img.getHeight, sum,
                    decoded = true)
                }
              } finally reader.dispose()
            }
          } catch { case _: Throwable => Seq.empty }
        if (frames.nonEmpty) frames
        else Seq(VideoFrame(r.media_id, -1, -1, -1, -1L, decoded = false))
      }
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
