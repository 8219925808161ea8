package graft.queries

import graft.Tables
import graft.index.{Ann, Ivf}
import graft.operators.{KnnExact, Metrics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-search query surface (SURVEY.md §2.5): per-segment Vamana
  * beam search, IVF probed search, and recall evaluation against the exact
  * oracle. ANN results are partitioning/seed-dependent, so these entries
  * use the driver's rows-only check — their QUALITY is gated by AnnSpec's
  * recall contracts (>= 0.95 vs exact, per BASELINE.md) and reported by
  * Bench. */
object AnnQueries {

  private val nQueries = 5
  private val k = 10

  private def queryVectors(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def annParams = Ann.Params(metric = "COSINE", maxDegree = 32, beamWidth = 100)

  private def annKnn(s: SparkSession, dir: String): DataFrame =
    Ann.search(Tables.embeddings(s, dir), queryVectors(s, dir), k, ef = 64,
      annParams, baseId = "vec_id", baseVec = "embedding")
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 6).as("score"))

  private def annKnnFiltered(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).withColumn("accept", col("label") === 3)
    Ann.search(base, queryVectors(s, dir), k, ef = 64, annParams,
      baseId = "vec_id", baseVec = "embedding", acceptCol = Some("accept"))
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 6).as("score"))
  }

  /** Trained-model memo keyed by (dir, nlist) — the reference's benchmark
    * caches compressors across configs the same way (`Grid.java:612`,
    * SURVEY O10): models are deterministic artifacts of (data, params). */
  private val ivfModels = new scala.collection.concurrent.TrieMap[(String, Int), Ivf.IvfModel]()
  private def ivfModel(s: SparkSession, dir: String, nlist: Int): Ivf.IvfModel =
    ivfModels.getOrElseUpdate((dir, nlist),
      Ivf.train(Tables.embeddings(s, dir), "embedding", nlist = nlist, metric = "COSINE"))

  private def ivfKnn(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val model = ivfModel(s, dir, 32)
    val assigned = Ivf.assign(emb, "embedding", model)
    Ivf.search(assigned, queryVectors(s, dir), model, nprobe = 8, topK = k,
      baseId = "vec_id", baseVec = "embedding")
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 6).as("score"))
  }

  /** recall@10 of the ANN path vs the exact oracle — the A5 metric operator
    * end-to-end. */
  private def annRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = queryVectors(s, dir)
    val ann = Ann.search(emb, q, k, ef = 64, annParams, "vec_id", "embedding")
    val exact = KnnExact.knn(emb, q, k, "COSINE", "vec_id", "embedding")
    Metrics.recallAtK(ann, exact, k).select(round(col("recall"), 4).as("recall"))
  }

  /** IVF-blocked distributed k-NN self-join (both sides large, no driver
    * collect) — approximate twin of knn_self_join. */
  private def ivfKnnJoin(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val model = ivfModel(s, dir, 16)
    Ivf.knnJoin(emb, emb, model, nprobe = 8, topK = 5,
      leftId = "vec_id", leftVec = "embedding",
      rightId = "vec_id", rightVec = "embedding", excludeSelf = true,
      saltBuckets = 8)
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 6).as("score"))
  }

  /** In-graph pagination (T6): page 1 from searchResumable, page 2 from
    * resume on the same cursor — rows-only (graph-dependent); the exact
    * twin is knn_paged. Single-segment (driver embeddings fit one). */
  // Same static-data assumption as ivfModels above: scale dirs are
  // driver-provided immutable inputs, never rewritten within a JVM.
  private val pagedGraphs =
    new scala.collection.concurrent.TrieMap[String, (Array[(Long, Array[Float])], graft.index.Vamana)]()

  private def annPaged(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (rows, g) = pagedGraphs.getOrElseUpdate(dir, {
      val r = Tables.embeddings(s, dir)
        .select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      (r, new graft.index.Vamana(r.map(_._2), "COSINE").build())
    })
    val qv = rows.take(nQueries)
    val out = qv.flatMap { case (qid, q) =>
      val (p1, st) = g.searchResumable(q, k, ef = 64)
      val p2 = g.resume(st, k)
      (p1.zipWithIndex.map { case ((l, sc), r) => (qid, 1, r + 1, rows(l)._1, sc) } ++
        p2.zipWithIndex.map { case ((l, sc), r) => (qid, 2, r + 1, rows(l)._1, sc) }).toSeq
    }
    out.toSeq.toDF("qid", "page", "rank", "nid", "score")
      .select(col("qid"), col("page"), col("rank"), col("nid"), round(col("score"), 6).as("score"))
  }

  /** Dense-ordinal remap (S5 RemappedRAVV semantics) — oracle-able. */
  private def denseIds(s: SparkSession, dir: String): DataFrame =
    Ann.withDenseOrdinals(Tables.embeddings(s, dir), "vec_id")
      .select(col("vec_id"), col("ordinal"))

  val denseIdsSql: String =
    "SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS ordinal FROM embeddings"

  /** ANN threshold search (T5) over segments — rows-only (graph-dependent);
    * exact twin is threshold_search. */
  private def annThreshold(s: SparkSession, dir: String): DataFrame =
    Ann.thresholdSearch(Tables.embeddings(s, dir), queryVectors(s, dir),
      threshold = 0.6, ef = 64, annParams, "vec_id", "embedding")
      .select(col("qid"), col("nid"), round(col("score"), 6).as("score"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dense_ids" -> (denseIds _),
    "ann_threshold" -> (annThreshold _),
    "ivf_knn_join" -> (ivfKnnJoin _),
    "ann_knn" -> (annKnn _),
    "ann_paged" -> (annPaged _),
    "ann_knn_filtered" -> (annKnnFiltered _),
    "ivf_knn" -> (ivfKnn _),
    "ann_recall" -> (annRecall _))

  val oracles: Map[String, String] = Map("dense_ids" -> denseIdsSql)
}
