package graft.operators

import graft.index.Vamana
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: rank-level fusion of lexical (BM25) and vector
  * (embedding-similarity) candidate lists, plus diversity re-ranking —
  * the serving-side composition a retrieval pipeline runs on top of the
  * engine's BM25 ([[Bm25]]) and k-NN ([[KnnExact]]/[[graft.index.Ann]])
  * operators.
  *
  * Scale design: both operators consume per-query candidate LISTS (top-N
  * rows per query, produced by the corpus-scale operators), never the
  * corpus itself — cost is O(queries x list length) with a single
  * qid-shuffle, so they are corpus-size-independent and compose with any
  * of the engine's retrieval paths (exact, Vamana index, IVF, BM25).
  */
object Hybrid {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * `rrf(d) = sum_lists 1 / (rrfK + rank_list(d))`, absent treated as 0.
    * Rank-level fusion needs no score calibration between lexical and
    * vector scales, which is why RRF is the standard hybrid combiner.
    *
    * Inputs: ranked lists with columns (qid, id, rank), rank 1-based —
    * the shape [[Bm25.search]] and the k-NN operators produce. Output:
    * (qid, rank, id, rrf_score), top `topN` per qid, ties broken by id.
    *
    * Determinism note: each list's contribution is aggregated into its own
    * column and the columns are added in list order — a bare SUM over the
    * union would add doubles in partition order and break bit-identity
    * with the mirrored oracle SQL.
    */
  def rrf(lists: Seq[DataFrame], topN: Int, rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(col("qid").cast("long").as("qid"), col("id").cast("long").as("id"),
        col("rank").cast("int").as("rank"), lit(i).as("__src"))
    }.reduce(_ unionByName _)
    val contribs = lists.indices.map { i =>
      coalesce(max(when(col("__src") === i, lit(1.0) / (lit(rrfK) + col("rank")))),
        lit(0.0)).as(s"__c$i")
    }
    val fused = tagged.groupBy("qid", "id")
      .agg(contribs.head, contribs.tail: _*)
      .withColumn("__rrf", lists.indices.map(i => col(s"__c$i")).reduce(_ + _))
    val w = Window.partitionBy("qid").orderBy(col("__rrf").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topN)
      .select(col("qid"), col("rank"), col("id"),
        round(col("__rrf"), 6).as("rrf_score"))
  }

  /** Weighted score-level fusion — the convex-combination hybrid
    * (`fused = sum_i w_i * norm_i(d)`, the other standard combiner next
    * to [[rrf]]): each list's scores are min-max normalized PER QUERY to
    * [0,1] (a degenerate list whose scores are all equal normalizes to
    * 1.0), absent docs contribute 0. Unlike RRF this uses score
    * MAGNITUDES — a doc barely inside one list but dominant in another
    * ranks accordingly — at the cost of trusting each list's score shape;
    * the per-query normalization removes the cross-scale calibration
    * problem (BM25 sums vs cosine similarities).
    *
    * Inputs: scored lists with columns (qid, id, score) — bounded
    * per-query candidate lists, same contract as [[rrf]]. Output:
    * (qid, rank, id, fused_score), top `topN` per qid, ties by id.
    * Contributions aggregate into per-list columns added in list order
    * (see [[rrf]]'s determinism note). */
  def linearFusion(lists: Seq[DataFrame], weights: Seq[Double], topN: Int): DataFrame = {
    require(lists.nonEmpty && lists.size == weights.size,
      s"need one weight per list: ${lists.size} lists, ${weights.size} weights")
    val byQ = Window.partitionBy("qid")
    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(col("qid").cast("long").as("qid"), col("id").cast("long").as("id"),
          col("score").cast("double").as("__s"))
        .withColumn("__mn", min(col("__s")).over(byQ))
        .withColumn("__mx", max(col("__s")).over(byQ))
        .withColumn("__norm",
          when(col("__mx") === col("__mn"), lit(1.0))
            .otherwise((col("__s") - col("__mn")) / (col("__mx") - col("__mn"))))
        .select(col("qid"), col("id"), col("__norm"), lit(i).as("__src"))
    }.reduce(_ unionByName _)
    val contribs = lists.indices.map { i =>
      (coalesce(max(when(col("__src") === i, col("__norm"))), lit(0.0))
        * weights(i)).as(s"__c$i")
    }
    val fused = tagged.groupBy("qid", "id")
      .agg(contribs.head, contribs.tail: _*)
      .withColumn("__f", lists.indices.map(i => col(s"__c$i")).reduce(_ + _))
    val rw = Window.partitionBy("qid").orderBy(col("__f").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(rw).cast("int"))
      .filter(col("rank") <= topN)
      .select(col("qid"), col("rank"), col("id"),
        round(col("__f"), 6).as("fused_score"))
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein, SIGIR
    * 1998): greedily pick `k` results maximizing
    * `lambda * rel(d) - (1 - lambda) * max_{s in picked} sim(d, s)` —
    * relevance traded against redundancy, so near-duplicate hits don't
    * crowd the page.
    *
    * Input: per-query candidates (qid, nid, score, vec) — a bounded top-N
    * list per query with the candidate's own embedding attached. Each
    * query's greedy loop runs inside its task via `flatMapGroups`
    * (O(N * k) similarity evaluations on the engine's scalar kernels);
    * the only shuffle is the qid grouping. Output: (qid, rank, nid,
    * mmr_score), deterministic (relevance/id tiebreaks). */
  def mmr(
      candidates: DataFrame,
      lambda: Double,
      k: Int,
      metric: String = "COSINE"): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    candidates
      .select(col("qid").cast("long"), col("nid").cast("long"),
        col("score").cast("double"), col("vec").cast("array<float>"))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        mmrSelect(it.map(t => (t._2, t._3, t._4)).toArray, lambda, k, metric)
          .iterator.map { case (rank, nid, s) => (qid, rank, nid, s) }
      }
      .map(t => (t._1, t._2, t._3, math.rint(t._4 * 1e6) / 1e6))
      .toDF("qid", "rank", "nid", "mmr_score")
  }

  /** One query's greedy MMR selection (the pure kernel [[mmr]] runs inside
    * each qid group task): candidates (nid, relevance, vec) -> picks
    * (rank, nid, mmr_score). Deterministic: candidates scan in
    * (relevance desc, id asc) order, first max wins; `maxSim` starts at 0
    * (engine similarities live in [0,1]), so the first pick is the
    * pure-relevance argmax. O(n*k) similarity evaluations via incremental
    * max-sim updates. */
  private[graft] def mmrSelect(
      candidates: Array[(Long, Double, Array[Float])],
      lambda: Double,
      k: Int,
      metric: String): Array[(Int, Long, Double)] = {
    val cand = candidates.sortBy(t => (-t._2, t._1))
    val n = cand.length
    val take = math.min(k, n)
    val used = new Array[Boolean](n)
    // -inf sentinel, NOT 0: similarities leave [0,1] under DOT_PRODUCT on
    // unnormalized vectors, and a 0 floor would erase negative penalties
    // (anti-correlated candidates deserve a BONUS under the MMR formula).
    // The first pick takes no penalty term (S is empty), so the sentinel
    // never reaches the arithmetic.
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val out = new Array[(Int, Long, Double)](take)
    var m = 0
    var done = false
    while (m < take && !done) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!used(i)) {
          val penalty = if (m == 0) 0.0 else maxSim(i)
          val s = lambda * cand(i)._2 - (1.0 - lambda) * penalty
          if (s > bestScore) { best = i; bestScore = s }
        }
        i += 1
      }
      // NaN-poisoned candidates (NaN relevance, or NaN similarity from a
      // zero-norm vector under COSINE) never win the strict comparison; if
      // only those remain, stop with fewer picks instead of crashing the
      // task — same contract as every scoring path (NaN rows are
      // unrankable), but a public operator shouldn't die on them
      if (best < 0) done = true
      else {
        used(best) = true
        out(m) = (m + 1, cand(best)._1, bestScore)
        var j = 0
        while (j < n) {
          if (!used(j)) {
            val s = Vamana.similarity(metric, cand(j)._3, cand(best)._3)
            if (s > maxSim(j)) maxSim(j) = s
          }
          j += 1
        }
        m += 1
      }
    }
    if (m == take) out else out.take(m)
  }
}
