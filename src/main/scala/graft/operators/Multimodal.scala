package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (binary-payload) column operators for the training-data
  * pipeline: media rides as an opaque BINARY column with typed metadata;
  * decode / feature-extract / frame-sample run as batched partition
  * functions over the bytes.
  *
  * Decode is REAL for the formats the JDK itself ships codecs for —
  * images via `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP) and linear-PCM audio
  * via `javax.sound.sampled` (WAV/AIFF/AU) — and falls back to a
  * deterministic byte-histogram stand-in for payloads no JVM codec accepts
  * (video, exotic codecs: those libs genuinely aren't in this environment).
  * The fallback keeps the batch seam total: a corrupt or unsupported blob
  * degrades to a content fingerprint instead of failing the partition.
  */
object Multimodal {

  /** Media row: payload + typed metadata (nullable per kind). */
  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video | text
      bytes: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int])

  case class MediaFeature(media_id: Long, feature: Array[Double])

  /** Decoded raster: row-major luminance in [0,1]. */
  case class DecodedImage(width: Int, height: Int, gray: Array[Float])

  /** Decoded audio: mono-mixed samples in [-1,1]. */
  case class DecodedAudio(sampleRate: Int, channels: Int, samples: Array[Float])

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF/WBMP).
    * None when no installed reader accepts the bytes — never throws, so the
    * batch seam can fall back per-row. */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val gray = new Array[Float](w * h)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            val r = (p >> 16) & 0xff
            val g = (p >> 8) & 0xff
            val b = p & 0xff
            // ITU-R BT.601 luma, normalized
            gray(y * w + x) = ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat
            x += 1
          }
          y += 1
        }
        Some(DecodedImage(w, h, gray))
      }
    } catch { case _: Exception => None }

  /** Real linear-PCM audio decode via the JDK's sampled-sound service
    * (WAV/AIFF/AU, 8/16-bit). Channels are mean-mixed to mono. */
  def decodeAudio(bytes: Array[Byte]): Option[DecodedAudio] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        import javax.sound.sampled.AudioFormat.Encoding._
        val bits = fmt.getSampleSizeInBits
        if ((fmt.getEncoding != PCM_SIGNED && fmt.getEncoding != PCM_UNSIGNED) ||
          (bits != 8 && bits != 16)) return None
        val raw = in.readAllBytes()
        val ch = fmt.getChannels
        val bytesPerSample = bits / 8
        val frames = raw.length / (bytesPerSample * ch)
        val mono = new Array[Float](frames)
        var f = 0
        while (f < frames) {
          var acc = 0.0f
          var c = 0
          while (c < ch) {
            val off = (f * ch + c) * bytesPerSample
            val v =
              if (bits == 8) {
                if (fmt.getEncoding == PCM_UNSIGNED) ((raw(off) & 0xff) - 128) / 128.0f
                else raw(off) / 128.0f
              } else {
                val u = if (fmt.isBigEndian) ((raw(off) & 0xff) << 8) | (raw(off + 1) & 0xff)
                        else ((raw(off + 1) & 0xff) << 8) | (raw(off) & 0xff)
                // unsigned 16-bit midpoint is 0x8000 (silence), signed is 0
                val s = if (fmt.getEncoding == PCM_UNSIGNED) u - 32768 else u.toShort.toInt
                s / 32768.0f
              }
            acc += v
            c += 1
          }
          mono(f) = acc / ch
          f += 1
        }
        Some(DecodedAudio(fmt.getSampleRate.toInt, ch, mono))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Pooled-luminance image feature: `grid` x `grid` mean pool, row-major —
    * the classic pre-embedding raster summary; 16 dims at the default, the
    * same width as the fallback histogram so downstream schemas are stable. */
  def imageFeatures(img: DecodedImage, grid: Int = 4): Array[Double] = {
    val out = new Array[Double](grid * grid)
    val counts = new Array[Int](grid * grid)
    var y = 0
    while (y < img.height) {
      val gy = math.min(grid - 1, y * grid / img.height)
      var x = 0
      while (x < img.width) {
        val gx = math.min(grid - 1, x * grid / img.width)
        val cell = gy * grid + gx
        out(cell) += img.gray(y * img.width + x)
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var c = 0
    while (c < out.length) { if (counts(c) > 0) out(c) /= counts(c); c += 1 }
    out
  }

  /** Windowed RMS-energy audio feature: `bins` equal windows over the mono
    * signal; 16 dims at the default (same width as the fallback histogram). */
  def audioFeatures(audio: DecodedAudio, bins: Int = 16): Array[Double] = {
    val out = new Array[Double](bins)
    val n = audio.samples.length
    if (n == 0) return out
    var b = 0
    while (b < bins) {
      val from = (b.toLong * n / bins).toInt
      val until = math.max(from + 1, ((b + 1).toLong * n / bins).toInt)
      var s = 0.0
      var i = from
      while (i < math.min(until, n)) { s += audio.samples(i).toDouble * audio.samples(i); i += 1 }
      out(b) = math.sqrt(s / math.max(1, math.min(until, n) - from))
      b += 1
    }
    out
  }

  /** Kind-dispatched decode: real codec first, histogram fallback. */
  def decodeFeatures(kind: String, bytes: Array[Byte]): Array[Double] =
    (kind match {
      case "image" => decodeImage(bytes).map(imageFeatures(_))
      case "audio" => decodeAudio(bytes).map(audioFeatures(_))
      case _ => None
    }).getOrElse(decodeStub(bytes))

  /** Deterministic fallback fingerprint (and the stand-in for codecs the
    * JVM lacks, e.g. video): normalized 16-bin byte histogram. */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1.0
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < 16) { hist(j) /= bytes.length; j += 1 }
    }
    hist
  }

  /** Batched feature extraction: processes fixed-size batches per partition
    * (the JVM analogue of `mapInPandas` batch shape — a real decoder would
    * amortize model/codec init across each batch the same way).
    *
    * `codec = false` forces the deterministic histogram for every row —
    * for oracle-verified pipelines whose twin (e.g. DuckDB) can only
    * recompute the histogram: whether a blob parses in a JDK codec must
    * then not influence the output, or the comparison becomes data-
    * dependent. Real decode keeps its own codec round-trip specs. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64,
      codec: Boolean = true): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init seam (codec/model handle would be created here)
        batch.iterator.map(r => MediaFeature(r.media_id,
          if (codec) decodeFeatures(r.kind, r.bytes) else decodeStub(r.bytes)))
      }
    }
  }

  /** Frame sampling stub for video payloads: every `stride`-th 1 KiB block
    * is a "frame"; emits (media_id, frame_idx, frame_hash). The fingerprint
    * is a deterministic polynomial rolling hash over the block's bytes
    * (h = (h*31 + byte) mod 1e9+7) — chosen over a cryptographic digest so
    * the driver's DuckDB oracle can recompute it from the payload and
    * cross-verify the block/stride plumbing end-to-end. */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame = {
    val frames = udf { bytes: Array[Byte] =>
      // null payloads (nullable binary columns) frame like empty ones
      val bs = if (bytes == null) Array.emptyByteArray else bytes
      val block = 1024
      (0 until (bs.length + block - 1) / block by stride).map { b =>
        val from = b * block
        val until = math.min(bs.length, from + block)
        var h = 0L
        var i = from
        while (i < until) { h = (h * 31 + (bs(i) & 0xff)) % 1000000007L; i += 1 }
        h
      }
    }
    // OUTER explode + null frame_idx: zero-byte/null media stay represented
    // (one row, null frame) instead of vanishing — the chunk() convention
    media.select(col("media_id"), posexplode_outer(frames(col("bytes"))))
      .withColumnRenamed("pos", "frame_idx").withColumnRenamed("col", "frame_hash")
  }

  /** Exact-dup fingerprint + size stats over the payload column — pure
    * built-ins (sha2 + octet length), pushdown-friendly. */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("bytes")).as("n_bytes"),
      sha2(col("bytes"), 256).as("sha"))
}
