package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Search-quality metrics (jvector `example/util/AccuracyMetrics.java`):
  * recall@k (J3 set-intersection join) and mean average precision (A6).
  * Both are pure relational plans — exact and oracle-able given the two
  * result sets. */
object Metrics {

  /** kGT-recall@kRetrieved: results and truth are (qid, nid, rank).
    * recall = |top-kGT truth ∩ retrieved| / (kGT * nQueries)
    * (AccuracyMetrics.java:38-92). Returns a 1-row DataFrame (recall). */
  def recallAtK(results: DataFrame, truth: DataFrame, kGT: Int): DataFrame = {
    val t = truth.filter(col("rank") <= kGT).select(col("qid"), col("nid"))
    val r = results.select(col("qid"), col("nid"))
    val hits = t.join(r, Seq("qid", "nid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    val nq = t.select("qid").distinct()
    nq.join(hits, Seq("qid"), "left")
      .select(coalesce(col("hits"), lit(0L)).as("hits"))
      .agg((sum(col("hits")).cast("double") / (count(lit(1)) * kGT)).as("recall"))
  }

  /** Mean average precision over ranked results vs truth sets
    * (AccuracyMetrics.java:96-135): AP = mean over relevant ranks of
    * precision@rank; MAP = mean over queries. */
  def meanAveragePrecision(results: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val t = truth.filter(col("rank") <= k).select(col("qid"), col("nid"))
    val r = results.filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"))
    val marked = r.join(t.withColumn("rel", lit(1)), Seq("qid", "nid"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
    val w = Window.partitionBy("qid").orderBy("rank")
    // reference semantics (AccuracyMetrics.averagePrecisionAtK): AP = sum of
    // precision@rank over relevant ranks, divided by K (not by hit count);
    // zero-hit queries contribute AP = 0 to the mean.
    val ap = marked
      .withColumn("cum_rel", sum(col("rel")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("prec", when(col("rel") === 1, col("cum_rel").cast("double") / col("rank"))
        .otherwise(lit(0.0)))
      .groupBy("qid").agg((sum(col("prec")) / lit(k)).as("ap"))
    val allQ = t.select("qid").distinct()
    allQ.join(ap, Seq("qid"), "left")
      .select(coalesce(col("ap"), lit(0.0)).as("ap"))
      .agg(avg(col("ap")).as("map"))
  }
}
