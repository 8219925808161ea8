package graft.queries

import graft.Tables
import graft.operators.{Bm25, Hybrid, KnnExact}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hybrid-retrieval query surface: BM25 + vector fused ranking (RRF) and
  * MMR diversity re-ranking — the retrieval-serving compositions over the
  * engine's lexical and vector operators.
  *
  * `hybrid_topk` is fully SQL-expressible (both candidate generators
  * already hash-match their own oracles), so it gets a direct DuckDB twin:
  * the BM25 CTE mirrors [[Bm25.search]] and the vector CTE mirrors the
  * exact-cosine scan, fused with the same fixed-order RRF arithmetic.
  * `mmr_rerank` is an iterative greedy selection (not SQL-expressible);
  * it is gated on its defining invariants instead.
  */
object RetrievalQueries {

  private val nQueries = 5
  private val k = 10
  private val candN = 50
  private val rrfK = 60
  private val mmrLambda = 0.5

  // keep in lockstep with TextDedupQueries' BM25 gate constants
  private val terms = Seq("vector", "hash", "join")
  private val k1 = 1.2
  private val b = 0.75

  // ---- hybrid_topk: BM25(top-50) + exact-cosine(top-50) -> RRF top-10 ----

  /** Lexical query: `terms` over documents.text; vector query: the
    * embedding of vec_id 7 over the (row-aligned) embeddings table. One
    * fused ranking — the canonical RAG serving read. */
  private def hybridTopk(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val lex = Bm25.search(docs, "doc_id", "text", terms, k1, b, topN = candN)
      .select(lit(0L).as("qid"), col("id"), col("rank"))
    val qv = emb.filter(col("vec_id") === 7)
      .select(lit(0L).as("qid"), col("embedding").as("qvec"))
    val vec = KnnExact.knn(emb, qv, candN, "COSINE", "vec_id", "embedding")
      .select(col("qid"), col("nid").as("id"), col("rank"))
    Hybrid.rrf(Seq(lex, vec), topN = k, rrfK = rrfK)
      .select(col("rank"), col("id"), col("rrf_score"))
  }

  // mirrored SQL fragments (keep in lockstep with VectorFunctions /
  // VectorSearchQueries' simSql)
  private def dotSql(a: String, q: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($q[i] AS DOUBLE)), (acc, x) -> acc + x)"
  private def normSql(a: String): String =
    s"list_reduce(list_transform(CAST($a AS DOUBLE[]), x -> x * x), (acc, x) -> acc + x)"
  private def cosSql(a: String, q: String): String =
    s"(1.0 + ${dotSql(a, q)} / (sqrt(${normSql(a)}) * sqrt(${normSql(q)}))) / 2.0"

  private val hybridTopkSql: String = {
    val termsIn = terms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""WITH b2 AS (SELECT doc_id AS id, toks, CAST(len(toks) AS DOUBLE) AS dl
       |   FROM (SELECT doc_id, ${TextDedupQueries.toksSql} AS toks FROM documents)),
       |corpus AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM b2),
       |tf AS (SELECT id, tok, CAST(count(*) AS DOUBLE) AS tf, min(dl) AS dl
       |   FROM (SELECT id, dl, unnest(toks) AS tok FROM b2)
       |   WHERE tok IN $termsIn GROUP BY id, tok),
       |dfq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
       |sc AS (SELECT tf.id,
       |   ln(1.0 + (c.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) * tf.tf * ${k1 + 1.0}
       |     / (tf.tf + $k1 * (${1.0 - b} + $b * tf.dl / c.avgdl)) AS s
       |   FROM tf JOIN dfq USING (tok) CROSS JOIN corpus c),
       |lexagg AS (SELECT id, sum(s) AS score FROM sc GROUP BY id),
       |lex AS (SELECT id, row_number() OVER (ORDER BY score DESC, id ASC) AS r
       |   FROM lexagg QUALIFY r <= $candN),
       |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 7),
       |vsc AS (SELECT e.vec_id AS id, ${cosSql("e.embedding", "qv.q")} AS score
       |   FROM embeddings e CROSS JOIN qv),
       |vec AS (SELECT id, row_number() OVER (ORDER BY score DESC, id ASC) AS r
       |   FROM vsc QUALIFY r <= $candN),
       |fused AS (SELECT COALESCE(lex.id, vec.id) AS id,
       |   COALESCE(1.0 / ($rrfK + lex.r), 0.0) + COALESCE(1.0 / ($rrfK + vec.r), 0.0) AS rrf
       |   FROM lex FULL OUTER JOIN vec ON lex.id = vec.id)
       |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, id ASC) AS INT) AS "rank",
       |       id, round(rrf, 6) AS rrf_score
       |FROM fused QUALIFY "rank" <= $k""".stripMargin
  }

  // ---- hybrid_linear: same candidates -> weighted normalized-score fusion ----

  private val wLex = 0.4
  private val wVec = 0.6

  /** The convex-combination hybrid over the same candidate lists as
    * `hybrid_topk`, exercising score-level (not rank-level) fusion:
    * per-list per-query min-max normalization, then
    * `0.4 * lex + 0.6 * vec`. */
  private def hybridLinear(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val lex = Bm25.search(docs, "doc_id", "text", terms, k1, b, topN = candN)
      .select(lit(0L).as("qid"), col("id"), col("score"))
    val qv = emb.filter(col("vec_id") === 7)
      .select(lit(0L).as("qid"), col("embedding").as("qvec"))
    val vec = KnnExact.knn(emb, qv, candN, "COSINE", "vec_id", "embedding")
      .select(col("qid"), col("nid").as("id"), col("score"))
    Hybrid.linearFusion(Seq(lex, vec), Seq(wLex, wVec), topN = k)
      .select(col("rank"), col("id"), col("fused_score"))
  }

  private val hybridLinearSql: String = {
    val termsIn = terms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""WITH b2 AS (SELECT doc_id AS id, toks, CAST(len(toks) AS DOUBLE) AS dl
       |   FROM (SELECT doc_id, ${TextDedupQueries.toksSql} AS toks FROM documents)),
       |corpus AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM b2),
       |tf AS (SELECT id, tok, CAST(count(*) AS DOUBLE) AS tf, min(dl) AS dl
       |   FROM (SELECT id, dl, unnest(toks) AS tok FROM b2)
       |   WHERE tok IN $termsIn GROUP BY id, tok),
       |dfq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
       |sc AS (SELECT tf.id,
       |   ln(1.0 + (c.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) * tf.tf * ${k1 + 1.0}
       |     / (tf.tf + $k1 * (${1.0 - b} + $b * tf.dl / c.avgdl)) AS s
       |   FROM tf JOIN dfq USING (tok) CROSS JOIN corpus c),
       |lexagg AS (SELECT id, sum(s) AS score FROM sc GROUP BY id),
       |lexT AS (SELECT id, round(score, 6) AS s,
       |   row_number() OVER (ORDER BY score DESC, id ASC) AS r
       |   FROM lexagg QUALIFY r <= $candN),
       |lexN AS (SELECT id, CASE WHEN mx = mn THEN 1.0 ELSE (s - mn) / (mx - mn) END AS n
       |   FROM (SELECT id, s, min(s) OVER () AS mn, max(s) OVER () AS mx FROM lexT)),
       |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 7),
       |vsc AS (SELECT e.vec_id AS id, ${cosSql("e.embedding", "qv.q")} AS score
       |   FROM embeddings e CROSS JOIN qv),
       |vecT AS (SELECT id, score AS s,
       |   row_number() OVER (ORDER BY score DESC, id ASC) AS r
       |   FROM vsc QUALIFY r <= $candN),
       |vecN AS (SELECT id, CASE WHEN mx = mn THEN 1.0 ELSE (s - mn) / (mx - mn) END AS n
       |   FROM (SELECT id, s, min(s) OVER () AS mn, max(s) OVER () AS mx FROM vecT)),
       |fused AS (SELECT COALESCE(lexN.id, vecN.id) AS id,
       |   COALESCE(lexN.n, 0.0) * $wLex + COALESCE(vecN.n, 0.0) * $wVec AS f
       |   FROM lexN FULL OUTER JOIN vecN ON lexN.id = vecN.id)
       |SELECT CAST(row_number() OVER (ORDER BY f DESC, id ASC) AS INT) AS "rank",
       |       id, round(f, 6) AS fused_score
       |FROM fused QUALIFY "rank" <= $k""".stripMargin
  }

  // ---- maxsim_topk: ColBERT-style late-interaction top-10 ----

  private val msVecsPerDoc = 4
  private val msQueries = 3 // multi-vector qids 0,1,2 = vec_ids 0..11
  private val msK = 10

  /** Multi-vector docs derived from the embeddings table: vec_id div 4 is
    * the doc, the 4 members are its token vectors; the first 3 such docs
    * are the queries. MaxSim = sum over the query's 4 vectors of the max
    * cosine against any doc vector. */
  private def maxsimTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val docVecs = emb.select(
      expr(s"vec_id div $msVecsPerDoc").as("doc_id"), col("embedding").as("vec"))
    val queryVecs = emb.filter(col("vec_id") < msQueries * msVecsPerDoc).select(
      expr(s"vec_id div $msVecsPerDoc").as("qid"),
      pmod(col("vec_id"), lit(msVecsPerDoc.toLong)).cast("int").as("q_idx"),
      col("embedding").as("qvec"))
    graft.operators.LateInteraction.maxSimTopK(docVecs, queryVecs, msK)
  }

  private val maxsimTopkSql: String =
    s"""WITH dv AS (SELECT vec_id // $msVecsPerDoc AS doc_id, embedding AS v FROM embeddings),
       |qv AS (SELECT vec_id // $msVecsPerDoc AS qid, vec_id % $msVecsPerDoc AS q_idx,
       |         embedding AS q
       |       FROM embeddings WHERE vec_id < ${msQueries * msVecsPerDoc}),
       |mx AS (SELECT qid, q_idx, doc_id, max(${cosSql("dv.v", "qv.q")}) AS mx
       |       FROM dv CROSS JOIN qv GROUP BY qid, q_idx, doc_id),
       |sc AS (SELECT qid, doc_id,
       |         list_reduce(list(mx ORDER BY q_idx), (a, x) -> a + x) AS score
       |       FROM mx GROUP BY qid, doc_id)
       |SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS INT) AS "rank",
       |       doc_id, round(score, 6) AS score
       |FROM sc QUALIFY "rank" <= $msK""".stripMargin

  // ---- maxsim_indexed: ANN candidates (pooled vectors) -> MaxSim rerank ----

  private val msCandN = 50
  private val maxsimIdxMemo = new scala.collection.concurrent.TrieMap[String, String]()

  /** The late-interaction SERVING path: mean-pool each multi-vector doc to
    * one vector, ANN-index the pooled vectors, retrieve candidates per
    * query, MaxSim-rerank only the survivors. Seed-dependent (graph
    * build), so gated: result shape, candidate containment, and recall
    * vs the exact full-corpus MaxSim (the maxsim_topk oracle surface). */
  private def maxsimIndexed(s: SparkSession, dir: String): DataFrame = {
    import graft.index.Ann
    import graft.operators.LateInteraction
    val emb = Tables.embeddings(s, dir)
    val docVecs = emb.select(
      expr(s"vec_id div $msVecsPerDoc").as("doc_id"), col("embedding").as("vec"))
    val queryVecs = emb.filter(col("vec_id") < msQueries * msVecsPerDoc).select(
      expr(s"vec_id div $msVecsPerDoc").as("qid"),
      pmod(col("vec_id"), lit(msVecsPerDoc.toLong)).cast("int").as("q_idx"),
      col("embedding").as("qvec"))
    def pool(df: DataFrame, idc: String, vc: String): DataFrame =
      df.select(col(idc), posexplode(col(vc)))
        .groupBy(col(idc), col("pos")).agg(avg(col("col").cast("double")).as("v"))
        .groupBy(col(idc))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("v")))),
          x => x.getField("v").cast("float")).as(vc))
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64)
    // one pooled-vector index per scale dir (the persistedIndex pattern):
    // rebuilding per invocation would redo the most expensive step and
    // leak a temp tree per call
    val idxPath = maxsimIdxMemo.getOrElseUpdate(dir, {
      val tmp = java.nio.file.Files.createTempDirectory("graft_maxsim_idx").toString
      Ann.buildIndex(pool(docVecs, "doc_id", "vec"), s"$tmp/idx", params, "doc_id", "vec")
      s"$tmp/idx"
    })
    // candidate generation, MaxSim rerank, and the exact full-corpus twin
    // all stay distributed (corpus-scale); the three containment/recall
    // checks over their bounded outputs (<= 150 rows) run driver-side
    // instead of as three join+count jobs (~0.6 s/call of scheduling)
    val candRows = Ann.searchIndex(s, idxPath,
        pool(queryVecs.withColumnRenamed("qvec", "vec"), "qid", "vec")
          .withColumnRenamed("vec", "qvec"),
        msCandN, ef = 64, params)
      .select(col("qid").cast("long"), col("nid").cast("long").as("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cands = {
      import s.implicits._
      candRows.toSeq.toDF("qid", "doc_id")
    }
    val rerRows = LateInteraction.maxSimTopK(docVecs, queryVecs, msK,
        candidates = Some(cands))
      .select(col("qid").cast("long"), col("doc_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exactRows = maxsimTopk(s, dir)
      .select(col("qid").cast("long"), col("doc_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val rows = rerRows.length.toLong
    val candSet = candRows.toSet
    val outside = rerRows.count(!candSet.contains(_)).toLong
    val exactSet = exactRows.toSet
    val hits = rerRows.count(exactSet.contains).toLong
    val recall = hits.toDouble / (msQueries * msK)
    Gates.df(s, Seq(
      ("maxsim_idx_rows_complete", (msQueries * msK).toDouble,
        rows == msQueries.toLong * msK),
      ("maxsim_idx_subset_of_candidates", 0.0, outside == 0L),
      ("maxsim_idx_recall_vs_exact", 0.9, recall >= 0.9)))
  }

  private val maxsimIndexedSql: String = Gates.sql(Seq(
    ("maxsim_idx_rows_complete", (msQueries * msK).toDouble),
    ("maxsim_idx_subset_of_candidates", 0.0),
    ("maxsim_idx_recall_vs_exact", 0.9)))

  // ---- mmr_rerank: greedy diversity re-rank over exact top-50 ----

  /** Gates: result shape, candidate containment, pure-relevance first
    * pick, and the operator's defining property — the picked set is no
    * LESS diverse (avg pairwise similarity) than the plain relevance
    * top-k it replaces. */
  private def mmrRerank(s: SparkSession, dir: String): DataFrame = {
    // per-phase wall clocks to stderr: the r12 bench recorded this entry at
    // 6.4s (2.1s in r11) with unchanged code — phase attribution separates
    // box load / cache eviction from a real plan regression without
    // re-deriving it from Spark UI archaeology
    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[gatephase] mmr_rerank $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qvec"))
    val cand = phase("cand") {
      val c = KnnExact.knn(emb, queries, candN, "COSINE", "vec_id", "embedding")
        .join(emb.select(col("vec_id").as("nid"), col("embedding").as("vec")), "nid")
        .select(col("qid"), col("nid"), col("score"), col("vec"), col("rank"))
        .cache()
      c.count()
      c
    }
    // bounded post-MMR checks run driver-side over the COLLECTED candidate
    // and pick lists (nQueries x candN rows with their vectors — the data
    // the greedy kernel itself holds per task): the former five join/agg
    // jobs over these <=250-row frames were ~1.1 s/call of pure scheduling
    // ([gatephase] contain 0.45s + divMmr 0.36s + divTop 0.27s). The MMR
    // operator itself (and the corpus-scale candidate search above) stays
    // distributed; only its bounded output is checked locally.
    val candRows = phase("candCollect") {
      cand.select(col("qid").cast("long"), col("nid").cast("long"),
          col("rank").cast("int"), col("vec").cast("array<float>"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getSeq[Float](3).toArray))
    }
    val resRows = phase("mmr") {
      Hybrid.mmr(cand, mmrLambda, k)
        .select(col("qid").cast("long"), col("rank").cast("int"), col("nid").cast("long"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    }

    val n = resRows.length.toLong
    val candSet = candRows.map(t => (t._1, t._2)).toSet
    val outside = resRows.count(t => !candSet.contains((t._1, t._3))).toLong
    val top1 = candRows.filter(_._3 == 1).map(t => (t._1, t._2)).toSet
    val firstMatches = resRows.filter(_._2 == 1).count(t => top1.contains((t._1, t._3))).toLong

    // same mean-pairwise-cosine diversity check, driver-side: vectors come
    // from the collected candidate rows (identical values — cand attached
    // them from the same embeddings relation), cosine is the same
    // sequential double fold as VectorFunctions.cosineSim / VecOps.cosine
    val vecOf = candRows.map(t => ((t._1, t._2), t._4)).toMap
    def cosSim(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); i += 1 }
      i = 0; while (i < a.length) { na += a(i).toDouble * a(i); i += 1 }
      i = 0; while (i < b.length) { nb += b(i).toDouble * b(i); i += 1 }
      (1.0 + dot / (math.sqrt(na) * math.sqrt(nb))) / 2.0
    }
    def avgPairSim(sel: Array[(Long, Long)]): Double = {
      val byQ = sel.groupBy(_._1)
      var sum = 0.0; var cnt = 0L
      byQ.toSeq.sortBy(_._1).foreach { case (qid, rows) =>
        val nids = rows.map(_._2).sorted
        for (i <- nids.indices; j <- (i + 1) until nids.length) {
          sum += cosSim(vecOf((qid, nids(i))), vecOf((qid, nids(j))))
          cnt += 1
        }
      }
      sum / cnt
    }
    // only computable when every MMR pick is a candidate (vecOf is keyed on
    // the candidate list); a containment regression must surface as the
    // subset gate failing, not as a NoSuchElementException that crashes the
    // whole correctness run before the gate relation is built
    val simMmr = phase("divMmr")(
      if (outside == 0L) avgPairSim(resRows.map(t => (t._1, t._3)))
      else Double.NaN)
    val simTop = phase("divTop")(avgPairSim(
      candRows.filter(_._3 <= k).map(t => (t._1, t._2))))
    cand.unpersist()

    Gates.df(s, Seq(
      ("mmr_rows_complete", (nQueries * k).toDouble, n == nQueries.toLong * k),
      ("mmr_subset_of_candidates", 0.0, outside == 0L),
      ("mmr_first_is_top_relevance", nQueries.toDouble, firstMatches == nQueries.toLong),
      ("mmr_diversity_not_worse", 0.0, outside == 0L && simMmr <= simTop + 1e-9)))
  }

  private val mmrRerankSql: String = Gates.sql(Seq(
    ("mmr_rows_complete", (nQueries * k).toDouble),
    ("mmr_subset_of_candidates", 0.0),
    ("mmr_first_is_top_relevance", nQueries.toDouble),
    ("mmr_diversity_not_worse", 0.0)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hybrid_topk" -> (hybridTopk _),
    "hybrid_linear" -> (hybridLinear _),
    "maxsim_topk" -> (maxsimTopk _),
    "maxsim_indexed" -> (maxsimIndexed _),
    "mmr_rerank" -> (mmrRerank _))

  val oracles: Map[String, String] = Map(
    "hybrid_topk" -> hybridTopkSql,
    "hybrid_linear" -> hybridLinearSql,
    "maxsim_topk" -> maxsimTopkSql,
    "maxsim_indexed" -> maxsimIndexedSql,
    "mmr_rerank" -> mmrRerankSql)
}
