package graft.operators

import graft.functions.{HashExpressions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators: chunking documents into
  * fixed-token windows, repetition-based quality filtering, and eval-set
  * decontamination. All three are pure column pipelines (codegen'd
  * built-ins + the native shingle expression) — no UDFs on the hot path,
  * no driver materialization, shuffles only where the semantics demand a
  * join/groupBy.
  */
object CorpusPrep {

  /** Split each document's token stream into windows of `chunkSize` tokens
    * advancing by `chunkSize - overlap` — the sequence-prep step before
    * packing examples into a training context window. Pure narrow plan:
    * tokenize, explode the window starts, slice. An empty doc yields one
    * empty chunk so every input id stays represented downstream.
    *
    * Output: (doc_id, chunk_idx, n_tokens, chunk_text). */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 64,
      overlap: Int = 16): DataFrame = {
    require(overlap < chunkSize, s"overlap $overlap must be < chunkSize $chunkSize")
    val stride = chunkSize - overlap
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(stride)))
          .as("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast("int").as("chunk_idx"),
        least(lit(chunkSize), greatest(size(col("toks")) - col("start"), lit(0)))
          .cast("int").as("n_tokens"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunkSize))).as("chunk_text"))
  }

  /** Repetition statistics per document (the Gopher-style repetition
    * filters, Rae et al. 2021 §A1.1): fraction of duplicated n-grams and
    * the most-frequent-token share. Both are per-row higher-order-function
    * pipelines — shuffle-free at any scale.
    *
    * `dup_ngram_ratio` = 1 - distinct_ngrams / total_ngrams;
    * `top_tok_ratio`  = max token multiplicity / token count;
    * `flagged`        = dup_ngram_ratio > dupMax OR top_tok_ratio > topMax.
    *
    * Output: (doc_id, dup_ngram_ratio, top_tok_ratio, flagged). */
  def repetitionStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      dupMax: Double = 0.18,
      topMax: Double = 0.20): DataFrame = {
    val base = KnnExact.spreadSmall(
      docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text")))
    base
      .withColumn("toks", TextFunctions.tokens(col("__text")))
      .withColumn("total_ngrams", greatest(size(col("toks")) - (n - 1), lit(1)))
      .withColumn("distinct_ngrams", size(HashExpressions.ngramShingles(col("__text"), n)))
      .withColumn("dup_ngram_ratio",
        round(lit(1.0) - col("distinct_ngrams").cast("double") / col("total_ngrams"), 6))
      .withColumn("top_tok_ratio", round(
        when(size(col("toks")) === 0, 0.0).otherwise(
          array_max(transform(array_distinct(col("toks")),
            t => size(filter(col("toks"), x => x === t)))).cast("double") / size(col("toks"))),
        6))
      .select(col("doc_id"), col("dup_ngram_ratio"), col("top_tok_ratio"),
        (col("dup_ngram_ratio") > dupMax || col("top_tok_ratio") > topMax).as("flagged"))
  }

  /** Eval-set decontamination: training docs sharing >= 1 distinct n-gram
    * shingle with any benchmark doc, with the shared-shingle count. The
    * join is an inverted-index equi-join on the 60-bit shingle hash —
    * each side explodes its distinct shingles, so cost is O(corpus
    * shingles), never a doc x doc cross product; the (small) eval side is
    * broadcast. This is how you sweep a 100 TB corpus against a benchmark
    * suite.
    *
    * Output: (doc_id, eval_id, n_shared). */
  def decontaminate(
      train: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val tr = KnnExact.spreadSmall(
        train.select(col(idCol).cast("long").as("doc_id"),
          HashExpressions.ngramShingles(col(textCol), n).as("sh")))
      .select(col("doc_id"), explode(col("sh")).as("h"))
    val ev = evalSet
      .select(col(idCol).cast("long").as("eval_id"),
        HashExpressions.ngramShingles(col(textCol), n).as("sh"))
      .select(col("eval_id"), explode(col("sh")).as("h"))
    tr.join(broadcast(ev), "h")
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
  }
}
