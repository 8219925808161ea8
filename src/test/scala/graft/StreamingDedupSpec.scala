package graft

import java.sql.Timestamp

import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() = java.nio.file.Files.createTempDirectory("graft_sdedup").toString

  private def ts(m: String) = Timestamp.valueOf(s"2026-01-01 $m:00")

  private val fox = "the quick brown fox jumps over the lazy dog"

  /** Two parquet files -> two micro-batches (maxFilesPerTrigger=1). */
  private def writeDocs(dir: String): Unit = {
    Seq(
      (1L, fox, ts("10:00")),
      (2L, "completely different content about spark engines", ts("10:05")))
      .toDF("doc_id", "text", "ts").write.parquet(s"$dir/docs/f1")
    Seq(
      (3L, fox, ts("10:30")), // exact dup of 1, later batch
      (4L, "the quick brown fox jumps over the sleepy dog", ts("10:40")), // near-dup of 1
      (5L, "unrelated text entirely here with many words", ts("10:45")))
      .toDF("doc_id", "text", "ts").write.parquet(s"$dir/docs/f2")
  }

  private def stream(dir: String) =
    spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/docs/*")

  test("streaming exact dedup drops same-content docs across micro-batches") {
    val dir = tmpDir()
    writeDocs(dir)
    val q = StreamingDedup.dedupExact(stream(dir), "text", "ts")
      .writeStream.outputMode("append").format("memory").queryName("sd_exact").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.sql("SELECT doc_id FROM sd_exact").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 4L, 5L), "doc 3 (same text as 1, later batch) must be dropped")
  }

  test("streaming near-dup pairs: LSH band join finds cross-batch near-dups once") {
    val dir = tmpDir()
    writeDocs(dir)
    val q = StreamingDedup.nearDupPairs(stream(dir), "doc_id", "text", "ts",
        numHashes = 16, rowsPerBand = 2, threshold = 0.5)
      .writeStream.outputMode("append").format("memory").queryName("sd_pairs").start()
    q.processAllAvailable(); q.stop()
    val pairs = spark.sql("SELECT id1, id2, jaccard FROM sd_pairs")
      .as[(Long, Long, Double)].collect()
    val byPair = pairs.groupBy(p => (p._1, p._2))
    assert(byPair.forall(_._2.length == 1), s"pairs must be unique, got: ${pairs.toSeq}")
    val keys = byPair.keySet
    assert(keys.contains((1L, 3L)), "exact dup pair (1,3) via LSH")
    assert(keys.contains((1L, 4L)), "near-dup pair (1,4)")
    assert(keys.contains((3L, 4L)), "near-dup pair (3,4)")
    assert(!keys.exists(k => k._1 == 2L || k._2 == 2L || k._1 == 5L || k._2 == 5L),
      "unrelated docs must not pair")
    val j14 = pairs.find(p => p._1 == 1L && p._2 == 4L).get._3
    assert(j14 > 0.5 && j14 < 1.0, s"one-word change: high but not exact, got $j14")
    val j13 = pairs.find(p => p._1 == 1L && p._2 == 3L).get._3
    assert(j13 === 1.0)
  }

  test("near-dup join state is bounded: eviction keeps numRowsTotal from growing with the stream") {
    val dir = tmpDir()
    // 8 docs, one per micro-batch, 1h apart; watermark+lag 30min means every
    // batch's state should be evicted once the next batch's watermark passes.
    (1 to 8).foreach { i =>
      Seq((i.toLong, s"doc number $i $fox", ts(f"0$i:00".takeRight(5))))
        .toDF("doc_id", "text", "ts").write.parquet(s"$dir/docs/f$i")
    }
    val q = StreamingDedup.nearDupPairs(stream(dir), "doc_id", "text", "ts",
        watermark = "30 minutes", joinLag = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sd_state").start()
    q.processAllAvailable()
    val joinRows = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators.filter(_.operatorName.contains("Join")).map(_.numRowsTotal).sum)
    q.stop()
    assert(joinRows.nonEmpty, "expected stream-stream join state metrics")
    // 8 docs x 8 bands x 2 sides = 128 rows fed to the join. Without the
    // top-level ts1 <= ts2 conjunct the `newer` side never evicts and the
    // final total sits at >= 64; with eviction only the watermark window
    // (~1-2 docs per side) remains.
    assert(joinRows.last < 48,
      s"join state must be evicted at the watermark, got per-batch totals: $joinRows")
    assert(joinRows.max < 64,
      s"join state must never accumulate the whole stream, got: $joinRows")
  }

  test("near-dup join respects the lag window: docs beyond joinLag don't pair") {
    val dir = tmpDir()
    Seq((1L, fox, ts("01:00"))).toDF("doc_id", "text", "ts")
      .write.parquet(s"$dir/docs/f1")
    Seq((2L, fox, ts("09:00"))) // 8h later, joinLag 2h
      .toDF("doc_id", "text", "ts").write.parquet(s"$dir/docs/f2")
    val q = StreamingDedup.nearDupPairs(stream(dir), "doc_id", "text", "ts",
        watermark = "12 hours", joinLag = "2 hours")
      .writeStream.outputMode("append").format("memory").queryName("sd_lag").start()
    q.processAllAvailable(); q.stop()
    assert(spark.sql("SELECT * FROM sd_lag").count() === 0)
  }
}
