package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus — the lexical-relevance
  * scorer a training-data pipeline uses for query-targeted subset selection
  * and retrieval-based decontamination (find training docs that "answer"
  * eval queries). Uses the Lucene/Robertson formulation:
  *
  *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   s(d, t) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
  *
  * Scale design: tokens explode map-side and are filtered to the query's
  * terms BEFORE any shuffle, so the aggregated state is O(matching docs x
  * query terms), never O(corpus tokens). Corpus stats (N, avgdl) and the
  * per-term document frequencies are tiny aggregates broadcast back into
  * the scoring plan — no driver round-trip, one logical job. Final top-N is
  * a TakeOrdered, not a global sort.
  */
object Bm25 {

  /** Top-N docs for a bag-of-terms query.
    * Output: (rank, id, score) — score desc, id asc tiebreak. */
  def search(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topN: Int = 20): DataFrame = {

    val base = KnnExact.spreadSmall(
        docs.select(col(idCol).cast("long").as("id"),
          TextFunctions.tokens(col(textCol)).as("toks")))
      .withColumn("dl", size(col("toks")).cast("double"))

    val corpus = base.agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))

    // term frequencies for query terms only (filter precedes the shuffle)
    val tf = base.select(col("id"), col("dl"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("id", "tok")
      .agg(count(lit(1)).cast("double").as("tf"), first("dl").as("dl"))

    val docFreq = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))

    val scored = tf
      .join(broadcast(docFreq), "tok")
      .crossJoin(broadcast(corpus))
      .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("s", col("idf") * col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))

    // orderBy+limit plans as TakeOrderedAndProject (per-partition top-N,
    // merged on the driver); a row_number window here would instead drag
    // every matching doc through a single partition. Ranks are assigned
    // after the limit, over topN rows only.
    val top = scored.groupBy("id").agg(sum("s").as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(topN)
    val w = Window.orderBy(col("score").desc, col("id").asc)
    top.withColumn("rank", row_number().over(w).cast("int"))
      .select(col("rank"), col("id"), round(col("score"), 6).as("score"))
  }
}
