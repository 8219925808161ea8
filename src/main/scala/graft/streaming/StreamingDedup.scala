package graft.streaming

import graft.functions.{HashExpressions, TextFunctions, VectorExpressions}
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus deduplication (SURVEY.md §2.10 x the LLM-pipeline dedup
  * family): the batch operators in [[graft.operators.Dedup]] re-expressed
  * over unbounded document streams.
  *
  * Scale design notes (100 TB / continuous ingest):
  *   - exact dedup keeps ONE fingerprint per doc in the state store, and the
  *     watermark bounds how long it is kept — state is O(docs per watermark
  *     window), not O(corpus). Dedup against the full historical corpus is a
  *     batch anti-join against the published fingerprint table, not
  *     streaming state.
  *   - near-dup candidates use the same banded-LSH shuffle as the batch
  *     path: signatures/bands are stateless map-side projections, the only
  *     state is the stream-stream join buffer, and the event-time range
  *     condition lets Spark evict it at the watermark. No all-pairs anywhere.
  */
object StreamingDedup {

  /** Exact-duplicate filter over a document stream: first doc with a given
    * normalized-content fingerprint (within the watermark) survives, later
    * copies are dropped. `dropDuplicatesWithinWatermark` (not the plain
    * variant) so the fingerprint state is evicted once the watermark passes
    * it — the plain variant's state grows with the corpus forever.
    * Output: the surviving rows plus their `fp` fingerprint column. */
  def dedupExact(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming MinHash-LSH near-dup candidate pairs: every arriving doc is
    * checked against docs that arrived up to `joinLag` BEFORE it (banded
    * signature equi-join, verified by exact Jaccard over unigram shingle
    * sets — same contract as [[Dedup.minhashLsh]]).
    *
    * Both inputs are watermarked and the join carries an event-time range
    * (`ts2` within [ts1, ts1 + joinLag]), so the join buffer is bounded and
    * evicted by the watermark. The older doc is id1 (ties by id), matching
    * the batch operator's id1 < id2 normalization on equal timestamps.
    * A pair matching in several bands is emitted once per band by the join;
    * `dropDuplicatesWithinWatermark` collapses them (BEFORE the exact
    * jaccard, so each distinct pair is scored once) while the pair's
    * event-time state is live.
    *
    * STATE-SIZE NOTE: the exploded band rows carry the full token array
    * into BOTH sides of the join buffer — ~(numHashes/rowsPerBand)× token
    * state per doc versus the batch operator, which joins token sets once
    * after deduping candidates. That amplification is inherent to making
    * the banded join a single stateful operator; bound it by sizing the
    * watermark/joinLag to the real dedup horizon, or shorten `toks` (the
    * verification set) upstream for very long documents.
    * Output: (id1, id2, jaccard, ts2). */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      numHashes: Int = 16,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5,
      watermark: String = "2 hours",
      joinLag: String = "2 hours"): DataFrame = {

    val base = docs.select(
        col(idCol).cast("long").as("id"),
        col(textCol).as("text"),
        col(tsCol).as("ts"))
      .withColumn("toks", HashExpressions.ngramShingles(col("text"), 1))
      .withColumn("sig", Dedup.minhashSignature(col("text"), numHashes))
      .select(col("id"), col("ts"), col("toks"),
        explode(Dedup.lshBands(col("sig"), numHashes, rowsPerBand)).as("band_hash"))

    val older = base.select(col("band_hash"), col("id").as("id1"),
      col("ts").as("ts1"), col("toks").as("toks1")).withWatermark("ts1", watermark)
    val newer = base.select(col("band_hash").as("band_hash2"), col("id").as("id2"),
      col("ts").as("ts2"), col("toks").as("toks2")).withWatermark("ts2", watermark)

    older.join(newer,
        col("band_hash") === col("band_hash2") &&
          // Top-level ts1 <= ts2 conjunct: redundant with the ordering
          // disjunction below, but Spark's state-watermark extraction only
          // reads top-level conjuncts — without it, only ts2 <= ts1+joinLag
          // is extracted and the `newer` side's join buffer is never
          // evicted (unbounded state on continuous ingest; mutation-tested
          // in StreamingDedupSpec "join state is bounded").
          col("ts1") <= col("ts2") &&
          // strictly-older-first ordering; id tiebreak on equal timestamps
          (col("ts1") < col("ts2") ||
            (col("ts1") === col("ts2") && col("id1") < col("id2"))) &&
          col("ts2") <= col("ts1") + expr(s"INTERVAL $joinLag"))
      // pair-dedup BEFORE scoring: a true near-dup pair matches up to
      // numHashes/rowsPerBand bands, and jaccard is O(|toks1|+|toks2|) per
      // evaluation — deduping first scores each distinct pair once instead
      // of once per band hit. Values are unchanged (jaccard is a pure
      // function of the token sets, identical on every band-hit copy);
      // the dedup state itself stores only (id1, id2) + event time.
      .select(col("id1"), col("id2"), col("toks1"), col("toks2"), col("ts2"))
      .dropDuplicatesWithinWatermark("id1", "id2")
      .withColumn("jaccard", VectorExpressions.jaccard(col("toks1"), col("toks2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"), col("ts2"))
  }
}
