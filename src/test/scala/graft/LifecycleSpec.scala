package graft

import graft.index.Ann
import graft.operators.{KnnExact, Metrics, PQ}
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._

/** End-to-end engine lifecycle (the reference's usage story re-expressed):
  * stream-ingest segments -> search -> ingest more -> tombstone-delete ->
  * compact (with PQ retrain) -> search again. Each stage's results are
  * checked against the exact oracle. */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("ingest -> search -> more data -> delete -> compact -> search") {
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val emb = Tables.embeddings(spark, sfDir).cache()
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec")).cache()

    def recallVs(results: org.apache.spark.sql.DataFrame,
        base: org.apache.spark.sql.DataFrame): Double = {
      val exact = KnnExact.knn(base, queries, 10, "COSINE", "vec_id", "embedding")
      Metrics.recallAtK(results, exact, 10).head().getDouble(0)
    }

    // 1. stream-ingest the first half as micro-batch segments
    emb.filter($"vec_id" < 250).write.parquet(s"$dir/src/f1")
    val q1 = StreamingIngest.startSegmentIngest(
      spark, s"$dir/src/*", emb.schema, s"$dir/idx", params, "vec_id", "embedding")
    q1.awaitTermination(120000)
    val firstHalf = emb.filter($"vec_id" < 250)
    assert(recallVs(
      Ann.searchIndex(spark, s"$dir/idx/*", queries, 10, 64, params), firstHalf) >= 0.95)

    // 2. ingest the remainder (new files picked up by a fresh AvailableNow run)
    emb.filter($"vec_id" >= 250).write.parquet(s"$dir/src/f2")
    val q2 = StreamingIngest.startSegmentIngest(
      spark, s"$dir/src/*", emb.schema, s"$dir/idx", params, "vec_id", "embedding")
    q2.awaitTermination(120000)
    assert(recallVs(
      Ann.searchIndex(spark, s"$dir/idx/*", queries, 10, 64, params), emb) >= 0.95)

    // 3. tombstone some ids: merge-on-read hides them immediately
    val deletes = (10L to 30L).toDF("id")
    val masked = Ann.searchIndex(spark, s"$dir/idx/*", queries, 10, 64, params, Some(deletes))
    assert(masked.select("nid").as[Long].collect().toSet
      .intersect((10L to 30L).toSet).isEmpty)

    // 4. compact: tombstones drop for real; PQ retrains on the survivors
    Ann.compact(spark, s"$dir/idx/*", s"$dir/idx2", params, Some(deletes))
    val live = emb.filter(!$"vec_id".between(10, 30))
    assert(spark.read.parquet(s"$dir/idx2").count() === live.count())
    val model = PQ.train(live, "embedding", m = 8, k = 32)
    val refined = PQ.refine(live, "embedding", model, lloydsRounds = 1)
    assert(refined.codebooks.length === 8)

    // 5. post-compaction search matches the exact oracle on the live set
    assert(recallVs(
      Ann.searchIndex(spark, s"$dir/idx2", queries, 10, 64, params), live) >= 0.95)
  }
}
