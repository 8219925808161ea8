package graft.streaming

import graft.index.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming ingest for the vector engine (SURVEY.md §2.10).
  *
  * The reference has no streaming runtime — its incremental story is
  * concurrent single inserts + tombstones + segment compaction
  * (`GraphIndexBuilder.addGraphNode`, `markNodeDeleted`,
  * `OnDiskGraphIndexCompactor`). The Spark-native translation: every
  * micro-batch becomes one or more IMMUTABLE index segments appended to the
  * index directory (jvector `tutorial/LargerThanMemory.java`'s incremental
  * build, B9), and a periodic `Ann.compact` folds small segments together
  * (B10). ANN state lives in storage, not the state store.
  */
object StreamingIngest {

  /** Start a micro-batch segment builder over a parquet directory source.
    * Each batch appends segments under `indexPath`. */
  def startSegmentIngest(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      indexPath: String,
      params: Ann.Params,
      idCol: String,
      vecCol: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          Ann.buildIndex(batch, s"$indexPath/batch_$batchId", params, idCol, vecCol)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Watermarked tumbling-window event aggregation — the standard streaming
    * operator surface (batch twin: RelationalQueries.eventsHourly). */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("total"))

  /** Watermark-deduped event stream (dropDuplicates within the watermark) —
    * streaming exact-dedup over an id column. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id")
}
