package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ColBERT-style late-interaction retrieval (Khattab & Zaharia 2020):
  * queries and documents are SETS of vectors (one per token / chunk) and
  * `score(q, d) = sum over q's vectors of max over d's vectors of sim` —
  * the MaxSim operator. This is the multi-vector complement to the
  * single-vector k-NN surface: pooling to one embedding loses per-token
  * alignment; MaxSim keeps it while staying a pure aggregation.
  *
  * Shape: per-(query-vector, doc) max is a map-side-combinable aggregate,
  * the per-doc total is a FIXED-ORDER left fold over the query-vector
  * index (collect the per-q_idx maxes, sort, `aggregate`-fold — never a
  * float `sum()` whose partial-aggregation order is nondeterministic), and
  * the final top-k rides the bounded heap aggregator. Two key-shuffles on
  * (qid, doc) grains; the query side is broadcast.
  *
  * Scale note: `docVecs` here is whatever candidate set the caller scored
  * — at 100 TB you generate candidates first (ANN over pooled vectors, or
  * an IVF-pruned scan over the token-vector table) and late-interact only
  * the survivors; this operator is that rerank stage, and it composes with
  * every candidate generator in the engine because it only needs
  * (doc_id, vec) rows.
  */
object LateInteraction {

  /** Top-k docs per query by MaxSim.
    *
    * @param docVecs   (doc_id: long, vec: array) — one row per doc vector;
    *                  may be candidate-restricted
    * @param queryVecs (qid: long, q_idx: int, qvec: array) — one row per
    *                  query vector; small (broadcast)
    * @return (qid, rank, doc_id, score), rank 1-based by
    *         (score desc, doc_id asc)
    */
  /** @param candidates optional (qid, doc_id) pairs restricting which
    *                    docs each query scores — the serving path: generate
    *                    candidates first (ANN over pooled vectors), then
    *                    late-interact only the survivors. With candidates
    *                    the scoring is an equi-join on doc_id + qid (cost
    *                    O(candidate pairs x vectors)), not a cross join. */
  def maxSimTopK(
      docVecs: DataFrame,
      queryVecs: DataFrame,
      k: Int,
      metric: String = "COSINE",
      candidates: Option[DataFrame] = None): DataFrame = {
    val sim = VectorFunctions.similarity(metric) _
    val q = queryVecs.select(col("qid"), col("q_idx"), col("qvec"))
    val paired = candidates match {
      case Some(c) =>
        docVecs.select(col("doc_id"), col("vec"))
          .join(c.select(col("qid"), col("doc_id")), "doc_id")
          .join(broadcast(q), "qid")
      case None =>
        docVecs.select(col("doc_id"), col("vec")).crossJoin(broadcast(q))
    }
    val scored = paired
      .select(col("qid"), col("q_idx"), col("doc_id"),
        sim(col("vec"), col("qvec")).as("s"))
    val perQvec = scored
      .groupBy(col("qid"), col("q_idx"), col("doc_id"))
      .agg(max(col("s")).as("mx"))
    // fixed-order fold: 0.0 + mx[q_idx 0] + mx[q_idx 1] + ... — bit-stable
    // across partitionings (and mirrorable as a DuckDB list_reduce)
    val perDoc = perQvec
      .groupBy(col("qid"), col("doc_id"))
      .agg(sort_array(collect_list(struct(col("q_idx"), col("mx")))).as("ms"))
      .select(col("qid"), col("doc_id"),
        aggregate(col("ms"), lit(0.0), (acc, x) => acc + x.getField("mx")).as("score"))
    val top = TopK.udf(k)
    perDoc.groupBy(col("qid"))
      .agg(top(col("doc_id"), col("score")).as("t"))
      .select(col("qid"), posexplode(col("t")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as("doc_id"), round(col("col._2"), 6).as("score"))
  }
}
