package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (binary-payload) column operators for the training-data
  * pipeline: media rides as an opaque BINARY column with typed metadata;
  * decode / feature-extract / frame-sample run as batched partition
  * functions over the bytes.
  *
  * The actual image/audio codecs are NOT available in this environment, so
  * the decode step is STUBBED with a deterministic fake (byte histogram /
  * block fingerprints) behind the same batch-function seam a real decoder
  * would use — the Spark-side plumbing (schema, batch shape, partitioning)
  * is real and tested. Swap `decodeStub` for a real codec to productionize.
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

  /** Deterministic stand-in for a real decoder: normalized 16-bin byte
    * histogram. REPLACE with a real codec (e.g. JPEG decode + pooled CNN
    * features) at the marked point — the signature is the contract. */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    // ??? <- real image/audio decode goes here; deterministic fake below
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
    * amortize model/codec init across each batch the same way). */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init seam (codec/model handle would be created here)
        batch.iterator.map(r => MediaFeature(r.media_id, decodeStub(r.bytes)))
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
      val block = 1024
      (0 until (bytes.length + block - 1) / block by stride).map { b =>
        val from = b * block
        val until = math.min(bytes.length, from + block)
        var h = 0L
        var i = from
        while (i < until) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
        h
      }
    }
    media.select(col("media_id"), posexplode(frames(col("bytes"))))
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
