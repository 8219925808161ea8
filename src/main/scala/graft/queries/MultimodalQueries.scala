package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal query surface: documents' text bytes stand in for media
  * payloads (no codecs in this environment — see Multimodal.decodeStub);
  * the BINARY-column plumbing, batch feature extraction and frame sampling
  * are the real operators. */
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

  private def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val ds = media(s, dir).select(
      col("media_id"), col("kind"), col("bytes"),
      lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
      lit(null).cast("int").as("sample_rate")).as[Multimodal.MediaRow]
    Multimodal.extractFeatures(ds).toDF()
      .select(col("media_id"), concat_ws(",",
        transform(col("feature"), x => round(x, 6))).as("feature"))
  }

  private def mediaFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(media(s, dir).filter(col("kind") === "video"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_stats" -> (mediaStats _),
    "media_features" -> (mediaFeatures _),
    "media_frames" -> (mediaFrames _))

  val oracles: Map[String, String] = Map(
    "media_stats" -> mediaStatsSql)
}
