package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal query surface: documents' text bytes stand in for media
  * payloads (no codecs in this environment — see Multimodal.decodeStub);
  * the BINARY-column plumbing, batch feature extraction and frame sampling
  * are the real operators. All three entries are DuckDB-oracled: the stub
  * decode/fingerprint steps are deterministic byte math, so the oracle
  * recomputes them from the payload (via its hex encoding — DuckDB 1.0 has
  * no byte indexing on BLOB) and cross-verifies the batching plumbing. */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      col("n_chars"))

  private def mediaStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaStats(media(s, dir))

  private val mediaStatsSql: String =
    """SELECT doc_id AS media_id,
      | ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
      | CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      | sha256(text) AS sha
      |FROM documents""".stripMargin

  /** Batched feature extraction, exploded to (media_id, bin, v) rows so the
    * compare is over plain numerics (no double->string formatting, which
    * Spark and DuckDB render differently). */
  private def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val ds = media(s, dir).select(
      col("media_id"), col("kind"), col("bytes"),
      lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
      lit(null).cast("int").as("sample_rate")).as[Multimodal.MediaRow]
    // codec = false: the DuckDB twin below can only recompute the histogram,
    // so whether any synthetic payload happens to parse in a JDK codec must
    // not influence this entry (real decode is covered by MultimodalSpec's
    // codec round-trips)
    Multimodal.extractFeatures(ds, codec = false).toDF()
      .select(col("media_id"), posexplode(col("feature")))
      .select(col("media_id"), col("pos").cast("int").as("bin"),
        round(col("col"), 6).as("v"))
  }

  /** The decode stub is a normalized 16-bin high-nibble byte histogram; the
    * high nibble of byte p is exactly hex digit 2p+1 of the payload's hex
    * encoding. Division is a single double op on both sides (bit-exact). */
  private val mediaFeaturesSql: String =
    """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
      |                  octet_length(encode(text)) AS n FROM documents)
      |SELECT media_id, CAST(t.bin AS INT) AS bin,
      |  CASE WHEN n = 0 THEN 0.0 ELSE round(
      |    CAST(len(list_filter(range(0, n),
      |      p -> substring(hx, 2*p+1, 1) = substring('0123456789ABCDEF', CAST(t.bin AS INT)+1, 1))) AS DOUBLE) / n, 6)
      |  END AS v
      |FROM m, range(16) t(bin)""".stripMargin

  private def mediaFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(media(s, dir).filter(col("kind") === "video"))

  /** Recomputes the strided 1-KiB block rolling hashes from the hex
    * encoding: byte p = 16*digit(2p+1) + digit(2p+2). */
  private val mediaFramesSql: String =
    """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
      |                  octet_length(encode(text)) AS n FROM documents
      |           WHERE doc_id % 3 = 2),
      |b AS (SELECT media_id, hx, n,
      |             CAST(ceil(n / 1024.0) AS BIGINT) AS nblocks FROM m WHERE n > 0),
      |fr AS (SELECT media_id, hx, n,
      |             unnest(list_filter(range(0, nblocks), x -> x % 4 = 0)) AS blk FROM b)
      |SELECT media_id,
      |  CAST(blk // 4 AS INT) AS frame_idx,
      |  list_reduce(
      |    list_transform(range(blk*1024, least(n, blk*1024 + 1024)),
      |      p -> CAST((strpos('0123456789ABCDEF', substring(hx, 2*p+1, 1)) - 1) * 16
      |         + (strpos('0123456789ABCDEF', substring(hx, 2*p+2, 1)) - 1) AS BIGINT)),
      |    (a, x) -> (a * 31 + x) % 1000000007) AS frame_hash
      |FROM fr
      |UNION ALL
      |SELECT media_id, CAST(NULL AS INT) AS frame_idx,
      |       CAST(NULL AS BIGINT) AS frame_hash
      |FROM m WHERE n = 0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_stats" -> (mediaStats _),
    "media_features" -> (mediaFeatures _),
    "media_frames" -> (mediaFrames _))

  val oracles: Map[String, String] = Map(
    "media_stats" -> mediaStatsSql,
    "media_features" -> mediaFeaturesSql,
    "media_frames" -> mediaFramesSql)
}
