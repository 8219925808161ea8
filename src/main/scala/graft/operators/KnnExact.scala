package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact (brute-force) top-k similarity search — the engine's correctness
  * oracle for every approximate search path, mirroring the reference's
  * exact-score search (jvector `graph/GraphSearcher.java:145-152`; oracle
  * loop pattern in `jvector-tests/.../TestLowCardinalityFiltering.java:118-126`).
  *
  * Plan shape (scale rationale):
  *   - the query side is broadcast (queries are few; base is huge),
  *     so the scan of the base table never shuffles;
  *   - scoring happens in the scan stage via codegen'd array expressions;
  *   - per-query top-k uses the bounded [[TopKAgg]] aggregator with map-side
  *     partial aggregation, so only O(k * partitions) rows reach the final
  *     shuffle — the same partial/final shape as the reference's per-segment
  *     search + rerankFloor merge (`GraphSearcher.java:386-404`).
  */
object KnnExact {

  /** The crossJoin-with-broadcast-queries plan parallelizes over BASE
    * partitions only. A small base (one parquet split) would pin the whole
    * O(base * queries) scoring loop to one core — spread it across the
    * cluster first. No-op at scale: a large base already has >= cores
    * splits, and the guard avoids shuffling it. Use only when base*queries
    * is large (e.g. self-joins) — for small query batches the extra
    * shuffle costs more than the single-core scoring it saves. */
  private[graft] def spreadSmall(b: DataFrame): DataFrame = {
    val target = b.sparkSession.sparkContext.defaultParallelism
    if (b.rdd.getNumPartitions < target) b.repartition(target) else b
  }

  /** Returns (qid, rank, nid, score); rank 1-based, ordered score desc / id asc. */
  def knn(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      metric: String,
      baseId: String = "id",
      baseVec: String = "vec",
      queryId: String = "qid",
      queryVec: String = "qvec",
      baseFilter: Option[Column] = None): DataFrame = {

    val filtered = baseFilter.map(base.filter).getOrElse(base)
    val b = filtered.select(col(baseId).cast("long").as("__nid"), col(baseVec).as("__vec"))
    val q = queries.select(col(queryId).cast("long").as("__qid"), col(queryVec).as("__qvec"))

    val scored = b
      .crossJoin(broadcast(q))
      .withColumn("__score", VectorFunctions.similarity(metric)(col("__vec"), col("__qvec")))

    val topk = TopK.udf(k)
    scored
      .groupBy(col("__qid"))
      .agg(topk(col("__nid"), col("__score")).as("__topk"))
      .select(col("__qid"), posexplode(col("__topk")))
      .select(
        col("__qid").as("qid"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as("nid"),
        col("col._2").as("score"))
  }

  /** Search resumption / pagination (jvector `GraphSearcher.resume`,
    * `GraphSearcher.java:509-547`): return ranks (skip, skip+pageSize].
    * Batch formulation: re-run with k = skip+pageSize and drop the first
    * page — "resume is cheap in batch" (SURVEY.md T6); ranks stay absolute
    * so pages concatenate. */
  def knnPage(
      base: DataFrame,
      queries: DataFrame,
      skip: Int,
      pageSize: Int,
      metric: String,
      baseId: String = "id",
      baseVec: String = "vec"): DataFrame =
    knn(base, queries, skip + pageSize, metric, baseId, baseVec)
      .filter(col("rank") > skip)

  /** Threshold search: all base rows with similarity >= threshold, per query.
    * Exact analogue of jvector's threshold search contract
    * (`GraphSearcher.java:298-303`). Returns (qid, nid, score) UNORDERED
    * (set semantics — a threshold result has no rank; callers wanting the
    * reference's score-desc presentation sort the bounded result). */
  def thresholdSearch(
      base: DataFrame,
      queries: DataFrame,
      threshold: Double,
      metric: String,
      baseId: String = "id",
      baseVec: String = "vec",
      queryId: String = "qid",
      queryVec: String = "qvec"): DataFrame = {

    val b = base.select(col(baseId).cast("long").as("__nid"), col(baseVec).as("__vec"))
    val q = queries.select(col(queryId).cast("long").as("__qid"), col(queryVec).as("__qvec"))
    b.crossJoin(broadcast(q))
      .withColumn("__score", VectorFunctions.similarity(metric)(col("__vec"), col("__qvec")))
      .filter(col("__score") >= lit(threshold))
      .select(col("__qid").as("qid"), col("__nid").as("nid"), col("__score").as("score"))
  }
}
