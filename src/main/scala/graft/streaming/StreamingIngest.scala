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
      maxFilesPerTrigger: Int = 1,
      /** Stable by default (sibling of the index root — inside it the
        * checkpoint's nested dirs break Spark's partition discovery):
        * foreachBatch's exactly-once contract rides the checkpoint — with
        * a temp checkpoint every restart re-lists the whole source and
        * re-ingests every document as duplicate segments. Override to
        * relocate; never share across indexes. */
      checkpointDir: Option[String] = None): StreamingQuery = {
    val cp = checkpointDir.getOrElse(indexPath.stripSuffix("/") + "_checkpoint")
    // The stable checkpoint is COUPLED to the index contents: it records
    // which source files were already ingested INTO THIS INDEX. If the
    // index root was wiped/rebuilt but the checkpoint survived, resuming
    // would silently skip every previously-processed file and serve an
    // empty index. Detect that state (checkpoint present, zero batch dirs
    // under the index root — nothing it recorded actually survives) and
    // clear the checkpoint so the run re-ingests from scratch; re-listing
    // is exactly right because no prior output exists to duplicate.
    locally {
      val hconf = spark.sessionState.newHadoopConf()
      val cpPath = new org.apache.hadoop.fs.Path(cp)
      val fs = cpPath.getFileSystem(hconf)
      val root = indexPath.stripSuffix("/")
      val hasBatches = Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$root/batch=*"))).exists(_.nonEmpty)
      if (fs.exists(cpPath) && !hasBatches) {
        // move aside, never delete: the heuristic can misfire (e.g. a
        // restart racing another process's in-flight first batch write),
        // and a user-supplied checkpointDir holds offset history that must
        // stay recoverable by hand
        var n = 0
        var stash = new org.apache.hadoop.fs.Path(cp + ".stale")
        while (fs.exists(stash)) { n += 1; stash = new org.apache.hadoop.fs.Path(s"$cp.stale.$n") }
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"checkpoint $cp exists but index $indexPath has no batches " +
            s"(wiped or never-built index) — moving it aside to $stash so the run re-ingests")
        fs.rename(cpPath, stash)
      }
    }
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // hive-style batch dir: nested under it, buildIndex writes seg=...
          // partitions, so the whole multi-batch tree stays one uniform
          // partitioned layout readable as indexPath or indexPath/*
          Ann.buildIndex(batch, s"$indexPath/batch=$batchId", params, idCol, vecCol)
          Ann.invalidateSegmentCounts(indexPath) // fan-out must see new segments
          // a pinned root would otherwise keep serving its pin-time file
          // listing and never see streamed batches
          Ann.unpin(indexPath)
        }
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

  case class SessionEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(sessionId: Int, startUs: Long, lastUs: Long, n: Int, total: Double)
  /** `session_id` is a per-user counter that is only unique within one
    * state lifetime: after an event-time timeout evicts a quiet user's
    * state, their next session restarts at 0. The collision-proof output
    * key is `(user_id, session_start)` — the session's first event time,
    * carried in state precisely so eviction cannot reset it. */
  case class SessionOut(user_id: Long, session_id: Int,
      session_start: java.sql.Timestamp, n: Int, total: Double)

  /** Watermark-correct sessionization via the built-in `session_window`
    * (dynamic-gap event-time sessions): late events within the watermark
    * are merged into — or even BRIDGE — existing sessions, which the
    * arrival-order [[sessionize]] below cannot do across micro-batches.
    * This is the out-of-order-safe production path; sessions are emitted
    * when the watermark passes their close (append mode). Batch twin:
    * the same groupBy(session_window) on a static frame. */
  def sessionizeWindowed(
      events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n"), col("total"))

  /** Stateful sessionization via flatMapGroupsWithState (KeyValueGrouped
    * custom state, SURVEY §2.10): emits a session row whenever a gap >
    * `gapMinutes` closes the previous session, and — on streams — closes
    * the TRAILING session through an event-time timeout once the
    * watermark passes its gap (a user who goes quiet still gets their
    * last session emitted, and their state entry is REMOVED — without the
    * timeout, per-user state grows forever on continuous ingest). Because
    * eviction resets the per-user counter, `session_id` alone is NOT a
    * stable key on streams — join on `(user_id, session_start)` (see
    * [[SessionOut]]). Batch
    * twin: RelationalQueries.eventsSessions (DuckDB-oracled). Assumes
    * in-order arrival ACROSS micro-batches (within a batch it sorts); for
    * out-of-order sources use [[sessionizeWindowed]].
    *
    * STATE-COMPATIBILITY NOTE: [[SessionState]] gained `startUs` (and
    * [[SessionOut]] `session_start`) when the collision-proof key landed —
    * the flatMapGroupsWithState state encoding changed, so a stream
    * resuming from a checkpoint written BEFORE that change fails to
    * deserialize its state (and downstream consumers see the new output
    * schema). Restart such streams from a FRESH checkpoint location. */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent], gapMinutes: Int = 30,
      watermark: String = "2 hours")
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermark) else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          if (streaming && state.hasTimedOut) {
            // watermark passed lastEvent + gap with no new events: the
            // trailing session is closed — emit it and drop the state
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.sessionId,
              new java.sql.Timestamp(st.startUs / 1000L), st.n, st.total))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var st = state.getOption.getOrElse(
              SessionState(0, Long.MinValue, Long.MinValue, 0, 0.0))
            for (e <- it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
              val us = e.ts.getTime * 1000L
              if (st.n > 0 && us - st.lastUs > gapUs) {
                out += SessionOut(user, st.sessionId,
                  new java.sql.Timestamp(st.startUs / 1000L), st.n, st.total)
                st = SessionState(st.sessionId + 1, us, us, 1, e.value)
              } else {
                st = SessionState(st.sessionId,
                  if (st.n == 0) us else st.startUs, us, st.n + 1, st.total + e.value)
              }
            }
            state.update(st)
            if (!streaming && st.n > 0) {
              // batch semantics: this invocation saw the user's ENTIRE
              // history and the final state is discarded afterwards — the
              // open trailing session must be emitted here or it is lost
              // (on streams the event-time timeout emits it instead)
              out += SessionOut(user, st.sessionId,
                new java.sql.Timestamp(st.startUs / 1000L), st.n, st.total)
              state.remove()
            }
            if (streaming && st.n > 0) {
              val closeMs = st.lastUs / 1000L + gapMinutes * 60L * 1000L
              // timeouts must sit above the current watermark
              state.setTimeoutTimestamp(math.max(closeMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
        })
  }
}
