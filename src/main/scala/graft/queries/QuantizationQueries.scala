package graft.queries

import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.{BQ, NVQ, PQ, SQ8, TopK}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quantization query surface (jvector §2.7): BQ has exact, SQL-expressible
  * semantics (sign bits + hamming) so its encode AND its quantized top-k
  * search are DuckDB-oracled. PQ involves k-means training, so its entries
  * get the rows-only check; PQ quality is gated by PQSpec (reconstruction
  * error, ADC recall vs exact oracle).
  */
object QuantizationQueries {

  private val dim = 64
  private val nQueries = 5
  private val k = 10

  /** BQ sign-bit encode, emitted as a '0'/'1' string computed from the
    * packed long words — oracle recomputes the bits straight from the
    * embedding, cross-verifying the packing. */
  private def bqBits(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(
      col("vec_id"),
      BQ.bitsString(BQ.encodePacked(col("embedding"), dim), dim).as("bits"))

  private val bqBitsSql: String =
    s"""SELECT vec_id, array_to_string(list_transform(CAST(embedding AS DOUBLE[]),
       |  x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '') AS bits
       |FROM embeddings""".stripMargin

  /** Top-k by BQ hamming similarity (1 - hd/dim) — the quantized search
    * path end-to-end, oracle-verified. Heavy ties are resolved id-asc. */
  private def bqHammingTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), BQ.encodePacked(col("embedding"), dim).as("code"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("code").as("qcode"))
    val scored = emb.crossJoin(broadcast(q))
      .withColumn("score", BQ.sim(col("code"), col("qcode"), dim))
    val agg = TopK.udf(k)
    scored.groupBy("qid")
      .agg(agg(col("vec_id"), col("score")).as("t"))
      .select(col("qid"), posexplode(col("t")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as("nid"), col("col._2").as("score"))
  }

  private val bqHammingTopkSql: String =
    s"""WITH b AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |       x -> CASE WHEN x > 0 THEN 1 ELSE 0 END) AS bits FROM embeddings),
       |q AS (SELECT vec_id AS qid, bits AS qb FROM b WHERE vec_id < $nQueries),
       |sc AS (SELECT q.qid, b.vec_id AS nid,
       |   1.0 - CAST(len(list_filter(range(1, $dim + 1), i -> b.bits[i] <> q.qb[i])) AS DOUBLE) / $dim.0 AS score
       |   FROM b CROSS JOIN q)
       |SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS INT) AS "rank",
       |       nid, score
       |FROM sc QUALIFY "rank" <= $k""".stripMargin

  // ---- PQ (k-means-trained; rows-only driver check, quality gated in specs) ----

  private val pqM = 8
  private val pqK = 64 // embeddings tables are small (500-2000 rows); 256 needs more points

  /** Trained-model memo per scale dir (deterministic artifacts; mirrors the
    * reference benchmark's compressor cache, `Grid.java:612` / SURVEY O10). */
  private val pqModels = new scala.collection.concurrent.TrieMap[String, graft.operators.PQModel]()
  private def pqModel(s: SparkSession, dir: String): graft.operators.PQModel =
    pqModels.getOrElseUpdate(dir, PQ.train(Tables.embeddings(s, dir), "embedding", pqM, pqK))
  private val nvqModels = new scala.collection.concurrent.TrieMap[String, NVQ.Model]()
  private def nvqModel(s: SparkSession, dir: String): NVQ.Model =
    nvqModels.getOrElseUpdate(dir, NVQ.train(Tables.embeddings(s, dir), "embedding"))

  private def pqEncode(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val model = pqModel(s, dir)
    PQ.encode(emb, "embedding", model)
      .select(col("vec_id"), concat_ws(",", col("pq_code")).as("code"))
  }

  private def pqReconError(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val model = pqModel(s, dir)
    val dec = PQ.decode(PQ.encode(emb, "embedding", model), "pq_code", model)
    dec.select(col("label"),
      VectorFunctions.l2Sq(col("embedding"), col("pq_decoded")).as("err"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg(col("err")), 4).as("avg_sq_err"))
  }

  /** NVQ reconstruction error per label (learned logistic grid) next to the
    * uniform-grid error on the same rows — the NVQ premise (non-uniform
    * beats uniform) made visible; the inequality itself is spec-gated. */
  private def nvqReconError(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val model = nvqModel(s, dir)
    val dec = NVQ.decode(NVQ.encode(emb, "embedding", model), model)
    dec.select(col("label"),
      VectorFunctions.l2Sq(col("embedding"), col("nvq_decoded")).as("err"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg(col("err")), 4).as("avg_sq_err"))
  }

  private def nvqKnn(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val model = nvqModel(s, dir)
    val encoded = NVQ.encode(emb, "embedding", model)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    NVQ.knn(encoded, queries, model, topK = k, rerankK = 4 * k, metric = "COSINE",
      baseId = "vec_id", baseVec = "embedding")
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 6).as("score"))
  }

  private def pqAdcTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val model = pqModel(s, dir)
    val encoded = PQ.encode(emb, "embedding", model)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    PQ.knn(encoded, queries, model, topK = k, rerankK = 4 * k, metric = "COSINE",
      baseId = "vec_id", baseVec = "embedding")
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 6).as("score"))
  }

  // ---- SQ8 (closed-form scalar quantization; fully oracle-able) ----

  private def sq8Encode(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(
      col("vec_id"),
      round(SQ8.lo(col("embedding")), 6).as("lo"),
      round(SQ8.hi(col("embedding")), 6).as("hi"),
      concat_ws(",", SQ8.encode(col("embedding"))).as("code"))

  private val sq8EncodeSql: String =
    """SELECT vec_id, round(list_min(v), 6) AS lo, round(list_max(v), 6) AS hi,
      | array_to_string(list_transform(v, x -> CASE WHEN list_max(v) = list_min(v) THEN 0
      |   ELSE CAST(floor((x - list_min(v)) / (list_max(v) - list_min(v)) * 255.0 + 0.5) AS INT) END), ',') AS code
      |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""".stripMargin

  /** Top-k over SQ8-decoded vectors — quantized search path #3, exact SQL
    * twin (decode is closed-form). */
  private def sq8Knn(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // the HOF encode/decode lambdas are eval-only (no codegen) — spread the
    // single-split scan so they run across cores (no-op at scale)
    val enc = graft.operators.KnnExact.spreadSmall(emb.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"),
        SQ8.lo(col("embedding")).as("lo"), SQ8.hi(col("embedding")).as("hi"),
        SQ8.encode(col("embedding")).as("code"))
      .withColumn("dec", SQ8.decode(col("code"), col("lo"), col("hi")))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = enc.crossJoin(broadcast(q))
      .withColumn("score",
        graft.functions.VectorFunctions.cosineSim(col("dec"), col("qvec")))
    val agg = TopK.udf(k)
    scored.groupBy("qid")
      .agg(agg(col("vec_id"), col("score")).as("t"))
      .select(col("qid"), posexplode(col("t")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as("nid"), round(col("col._2"), 6).as("score"))
  }

  private val sq8KnnSql: String = {
    def d(a: String, b: String) =
      s"list_reduce(list_transform(range(1, len($a)+1), i -> $a[i] * CAST($b[i] AS DOUBLE)), (acc, x) -> acc + x)"
    def n1(a: String) =
      s"list_reduce(list_transform($a, x -> x * x), (acc, x) -> acc + x)"
    def n2(a: String) =
      s"list_reduce(list_transform(CAST($a AS DOUBLE[]), x -> x * x), (acc, x) -> acc + x)"
    val sim = s"(1.0 + ${d("e.dec", "q.qv")} / (sqrt(${n1("e.dec")}) * sqrt(${n2("q.qv")}))) / 2.0"
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |e AS (SELECT vec_id, list_transform(v, x ->
       |   CASE WHEN list_max(v) = list_min(v) THEN list_min(v)
       |        ELSE list_min(v) + CAST(floor((x - list_min(v)) / (list_max(v) - list_min(v)) * 255.0 + 0.5) AS INT)
       |             * (list_max(v) - list_min(v)) / 255.0 END) AS dec FROM v),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $nQueries),
       |sc AS (SELECT q.qid, e.vec_id AS nid, $sim AS score FROM e CROSS JOIN q)
       |SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS INT) AS "rank",
       |       nid, round(score, 6) AS score
       |FROM sc QUALIFY "rank" <= $k""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bq_bits" -> (bqBits _),
    "bq_hamming_topk" -> (bqHammingTopk _),
    "pq_encode" -> (pqEncode _),
    "pq_recon_error" -> (pqReconError _),
    "pq_adc_topk" -> (pqAdcTopk _),
    "nvq_recon_error" -> (nvqReconError _),
    "nvq_knn" -> (nvqKnn _),
    "sq8_encode" -> (sq8Encode _),
    "sq8_knn" -> (sq8Knn _))

  val oracles: Map[String, String] = Map(
    "bq_bits" -> bqBitsSql,
    "bq_hamming_topk" -> bqHammingTopkSql,
    "sq8_encode" -> sq8EncodeSql,
    "sq8_knn" -> sq8KnnSql)
}
