package graft.queries

import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.KnnExact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-search query surface: exact k-NN (the oracle contract for every
  * ANN path, jvector `GraphSearcher.java:145-152`), filtered search
  * (accept-list semantics, `GraphSearcher.java:215-218`), threshold search
  * (`GraphSearcher.java:298-303`), and vector aggregates (centroids,
  * `BuildScoreProvider.java:119-130`).
  *
  * The DuckDB oracle SQL mirrors the Spark expressions op-for-op: arrays are
  * cast to double, products formed per element, and sums are sequential left
  * folds — both engines therefore produce bit-identical doubles and results
  * hash-match without tolerance.
  */
object VectorSearchQueries {

  // ---- mirrored SQL fragments (keep in lockstep with VectorFunctions) ----
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (acc, x) -> acc + x)"
  private def normSql(a: String): String =
    s"list_reduce(list_transform(CAST($a AS DOUBLE[]), x -> x * x), (acc, x) -> acc + x)"
  private def l2Sql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"
  private def simSql(metric: String, a: String, b: String): String = metric match {
    case "COSINE" => s"(1.0 + ${dotSql(a, b)} / (sqrt(${normSql(a)}) * sqrt(${normSql(b)}))) / 2.0"
    case "DOT_PRODUCT" => s"(1.0 + ${dotSql(a, b)}) / 2.0"
    case "EUCLIDEAN" => s"1.0 / (1.0 + ${l2Sql(a, b)})"
  }

  private val nQueries = 5
  private val k = 10

  private def queryVectors(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def knnQuery(metric: String, labelFilter: Option[Int] = None)(
      s: SparkSession, dir: String): DataFrame = {
    val base0 = Tables.embeddings(s, dir)
    val base = labelFilter.map(lb => base0.filter(col("label") === lb)).getOrElse(base0)
    KnnExact.knn(base, queryVectors(s, dir), k, metric, "vec_id", "embedding")
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 6).as("score"))
  }

  private def knnSql(metric: String, labelFilter: Option[Int] = None): String = {
    val baseRel = labelFilter
      .map(lb => s"(SELECT * FROM embeddings WHERE label = $lb)")
      .getOrElse("embeddings")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $nQueries),
       |sc AS (SELECT q.qid, b.vec_id AS nid, ${simSql(metric, "b.embedding", "q.qv")} AS score
       |       FROM $baseRel b CROSS JOIN q)
       |SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS INT) AS "rank",
       |       nid, round(score, 6) AS score
       |FROM sc QUALIFY "rank" <= $k""".stripMargin
  }

  private val thresholdValue = 0.6

  private def thresholdSearch(s: SparkSession, dir: String): DataFrame =
    KnnExact.thresholdSearch(Tables.embeddings(s, dir), queryVectors(s, dir),
      thresholdValue, "COSINE", "vec_id", "embedding")
      .select(col("qid"), col("nid"), round(col("score"), 6).as("score"))

  private def thresholdSearchSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $nQueries)
       |SELECT q.qid, b.vec_id AS nid, round(${simSql("COSINE", "b.embedding", "q.qv")}, 6) AS score
       |FROM embeddings b CROSS JOIN q
       |WHERE ${simSql("COSINE", "b.embedding", "q.qv")} >= $thresholdValue""".stripMargin

  /** Per-label centroid, flattened to (label, pos 1-based, c) — vector AVG. */
  private def centroidByLabel(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("col").cast("double")), 6).as("c"))
      .select(col("label"), (col("pos") + 1).cast("int").as("pos"), col("c"))

  private val centroidByLabelSql: String =
    """SELECT label, CAST(pos AS INT) AS pos, round(avg(v), 6) AS c
      |FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
      |             unnest(range(1, len(embedding) + 1)) AS pos
      |      FROM embeddings)
      |GROUP BY label, pos""".stripMargin

  /** Per-label L2-norm statistics (exercises normSq + sqrt). */
  private def normStats(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), sqrt(VectorFunctions.normSq(col("embedding"))).as("nrm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(min(col("nrm")), 6).as("min_norm"),
        round(max(col("nrm")), 6).as("max_norm"),
        round(avg(col("nrm")), 6).as("avg_norm"))

  private val normStatsSql: String =
    s"""SELECT label, COUNT(*) AS n, round(min(nrm), 6) AS min_norm,
       | round(max(nrm), 6) AS max_norm, round(avg(nrm), 6) AS avg_norm
       |FROM (SELECT label, sqrt(${normSql("embedding")}) AS nrm FROM embeddings)
       |GROUP BY label""".stripMargin

  /** Page 2 (ranks 11..20) — search-resume semantics (T6). */
  private def knnPaged(s: SparkSession, dir: String): DataFrame =
    KnnExact.knnPage(Tables.embeddings(s, dir), queryVectors(s, dir),
      skip = k, pageSize = k, metric = "COSINE", baseId = "vec_id", baseVec = "embedding")
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 6).as("score"))

  private val knnPagedSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $nQueries),
       |sc AS (SELECT q.qid, b.vec_id AS nid, ${simSql("COSINE", "b.embedding", "q.qv")} AS score
       |       FROM embeddings b CROSS JOIN q)
       |SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS INT) AS "rank",
       |       nid, round(score, 6) AS score
       |FROM sc QUALIFY "rank" > $k AND "rank" <= ${2 * k}""".stripMargin

  /** Exact k-NN self-JOIN: every vector gets its top-5 neighbors (excluding
    * itself) — the oracle contract for the IVF-blocked distributed join. */
  private def knnSelfJoin(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val b = graft.operators.KnnExact.spreadSmall(
      emb.select(col("vec_id").cast("long").as("__nid"), col("embedding").as("__vec")))
    val q = emb.select(col("vec_id").cast("long").as("__qid"), col("embedding").as("__qvec"))
    val scored = b.crossJoin(broadcast(q)).filter(col("__nid") =!= col("__qid"))
      .withColumn("__score", graft.functions.VectorFunctions.cosineSim(col("__vec"), col("__qvec")))
    val agg = graft.operators.TopK.udf(5)
    scored.groupBy(col("__qid").as("qid"))
      .agg(agg(col("__nid"), col("__score")).as("t"))
      .select(col("qid"), posexplode(col("t")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as("nid"), round(col("col._2"), 6).as("score"))
  }

  private val knnSelfJoinSql: String =
    s"""WITH sc AS (SELECT q.vec_id AS qid, b.vec_id AS nid,
       |   ${simSql("COSINE", "b.embedding", "q.embedding")} AS score
       |   FROM embeddings b CROSS JOIN embeddings q WHERE b.vec_id <> q.vec_id)
       |SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS INT) AS "rank",
       |       nid, round(score, 6) AS score
       |FROM sc QUALIFY "rank" <= 5""".stripMargin

  // ---- contrastive pair mining (pos >= 0.65, hard negs < 0.6) ----

  private val minePosT = 0.65
  private val mineNegT = 0.6
  private val mineKPos = 5
  private val mineKNeg = 5

  private def minePairs(s: SparkSession, dir: String): DataFrame =
    graft.operators.ContrastiveMining.minePairs(
      Tables.embeddings(s, dir), queryVectors(s, dir),
      mineKPos, mineKNeg, minePosT, mineNegT)

  private val minePairsSql: String = {
    val sim = simSql("COSINE", "b.embedding", "q.qv")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $nQueries),
       |sc AS (SELECT q.qid, b.vec_id AS nid, $sim AS s
       |       FROM embeddings b CROSS JOIN q WHERE b.vec_id <> q.qid),
       |pos AS (SELECT qid, 'pos' AS kind,
       |          CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid ASC) AS INT) AS "rank",
       |          nid, round(s, 6) AS score
       |        FROM sc WHERE s >= $minePosT QUALIFY "rank" <= $mineKPos),
       |neg AS (SELECT qid, 'neg' AS kind,
       |          CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid ASC) AS INT) AS "rank",
       |          nid, round(s, 6) AS score
       |        FROM sc WHERE s < $mineNegT QUALIFY "rank" <= $mineKNeg)
       |SELECT * FROM pos UNION ALL SELECT * FROM neg""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_self_join" -> (knnSelfJoin _),
    "knn_paged" -> (knnPaged _),
    "knn_cosine" -> knnQuery("COSINE") _,
    "knn_dot" -> knnQuery("DOT_PRODUCT") _,
    "knn_euclidean" -> knnQuery("EUCLIDEAN") _,
    "knn_filtered" -> knnQuery("COSINE", labelFilter = Some(3)) _,
    "threshold_search" -> (thresholdSearch _),
    "centroid_by_label" -> (centroidByLabel _),
    "norm_stats" -> (normStats _),
    "mine_pairs" -> (minePairs _))

  val oracles: Map[String, String] = Map(
    "knn_self_join" -> knnSelfJoinSql,
    "knn_paged" -> knnPagedSql,
    "knn_cosine" -> knnSql("COSINE"),
    "knn_dot" -> knnSql("DOT_PRODUCT"),
    "knn_euclidean" -> knnSql("EUCLIDEAN"),
    "knn_filtered" -> knnSql("COSINE", labelFilter = Some(3)),
    "threshold_search" -> thresholdSearchSql,
    "centroid_by_label" -> centroidByLabelSql,
    "norm_stats" -> normStatsSql,
    "mine_pairs" -> minePairsSql)
}
