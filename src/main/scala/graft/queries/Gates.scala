package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Quality-gate entries for the driver's DuckDB correctness compare.
  *
  * ANN/IVF/PQ/NVQ results are seed- and partitioning-dependent, so they
  * cannot hash-match a SQL oracle row-for-row (SURVEY.md §7.3). Their
  * correctness contract is statistical — recall / error-bound thresholds,
  * exactly as the reference asserts them (e.g. recall > 0.95 in
  * `jvector-tests/.../TestLowCardinalityFiltering.java:54-57`, threshold
  * recall > 0.9 in `Test2DThreshold.java:38-42`). A gate entry makes that
  * contract driver-verifiable: the Spark side COMPUTES the quality metric
  * against the exact in-engine oracle and emits one row per gate
  * `(gate, target, pass)`; the DuckDB oracle is the corresponding constant
  * relation with `pass = TRUE`. The hash matches iff every contract holds —
  * a real failure (recall regression, broken pagination, bad encode) flips
  * `pass` and the driver reports a hash mismatch for exactly this entry.
  */
object Gates {

  /** Build the Spark-side gate relation: (gate, target, pass), gate-name
    * ordered so both sides enumerate rows identically. */
  def df(s: SparkSession, rows: Seq[(String, Double, Boolean)]): DataFrame = {
    import s.implicits._
    rows.toDF("gate", "target", "pass").orderBy(col("gate"))
  }

  /** The constant DuckDB twin: same gates/targets, pass = TRUE. */
  def sql(rows: Seq[(String, Double)]): String = {
    val values = rows
      .sortBy(_._1)
      .map { case (g, t) => s"('$g', CAST($t AS DOUBLE), TRUE)" }
      .mkString(", ")
    s"SELECT * FROM (VALUES $values) t(gate, target, pass) ORDER BY gate"
  }
}

/** Collect-once memo for deterministic ROUTE outputs (small result
  * relations: top-k pages, gate searches — never base data). The first
  * call per (name, dir) executes the distributed route and pins its rows;
  * later calls in the same JVM rebuild a local relation, so the driver's
  * repeated sweep runs pay each expensive route once — the gate
  * comparisons then join tiny local relations. Only routes whose output is
  * deterministic per (dir) may use this (everything driver-hashed already
  * must be). */
private[queries] object RouteMemo {
  private val m = new scala.collection.concurrent.TrieMap[
    (String, String),
    (Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType)]()

  def df(s: SparkSession, name: String, dir: String)(f: => DataFrame): DataFrame = {
    val (rows, schema) = m.getOrElseUpdate((name, dir), {
      val d = f
      val out = (d.collect(), d.schema)
      // routes that .cache() inside the thunk (plan-capture double actions)
      // are scoped to this one memo fill — release the block-manager entry
      // now that the rows are pinned driver-side (no-op when uncached).
      // Callers must NOT re-cache the returned relation: it is rebuilt from
      // local rows per call, so caching it just leaks one block-manager
      // entry per sweep iteration.
      d.unpersist()
      out
    })
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Driver-safety cap for [[dfBounded]]: a route under this many rows is
    * trivially driver-sized (a (long, long, long) row is tens of bytes);
    * anything bigger must stay on the cluster. */
  val maxMemoRows: Int = 1 << 16

  /** Bounded variant for routes whose cardinality is DATA-DEPENDENT
    * (threshold searches return every pair above t — corpus-cardinality,
    * unlike top-k routes, r14 verdict #1/#3): memoize only when the result
    * has at most `cap` rows (limit(cap+1) returns the exact relation when
    * under the cap), else return None and leave nothing pinned — the
    * caller keeps the comparison fully distributed. Driver memory is
    * O(cap) at ANY corpus size; at the shipped gate SFs these routes are
    * a few hundred rows, so the sweep keeps the memo fast path. */
  def dfBounded(s: SparkSession, name: String, dir: String,
      cap: Int = maxMemoRows)(f: => DataFrame): Option[DataFrame] = {
    val fetched = m.get((name, dir)).getOrElse {
      val d = f
      val out = (d.limit(cap + 1).collect(), d.schema)
      d.unpersist()
      out
    }
    if (fetched._1.length > cap) None
    else {
      m.putIfAbsent((name, dir), fetched)
      Some(s.createDataFrame(java.util.Arrays.asList(fetched._1: _*), fetched._2))
    }
  }
}

/** Driver-side evaluation of BOUNDED gate post-processing over collected
  * result relations (nQueries x k rows — never base data). The math is
  * unchanged — same sequential double folds, same set semantics as the
  * Metrics/DataFrame plans it replaces — but a ~50-row set intersection no
  * longer pays a Spark job (planning + shuffle + scheduling) per
  * comparison: the sweep's slow gates each ran 5-8 such jobs per call on
  * <= 250-row inputs, measured ~0.2 s apiece at local[32] (the [gatephase]
  * decomposition: `contain` 0.45 s for two counts over local relations).
  * Corpus-scale stages (searches, builds, scans, exact twins) stay
  * distributed; only their bounded outputs are compared driver-side —
  * which is also the scale-correct shape: gate post-processing is
  * O(nQueries * k) at ANY corpus size, so scheduling cluster jobs for it
  * buys nothing at 100 TB either. */
private[queries] object LocalEval {

  /** (qid, nid) pairs of a bounded result relation, collected. */
  def pairs(df: DataFrame): Array[(Long, Long)] =
    df.select(col("qid").cast("long"), col("nid").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** Exactly [[graft.operators.Metrics.recallAtK]] driver-side:
    * |top-kGT truth ∩ results| / (kGT * distinct truth qids) — integer
    * counts, one double division, bit-identical to the join/agg plan. */
  def recallAtK(results: DataFrame, truth: DataFrame, kGT: Int): Double =
    recallOfPairs(pairs(results), pairs(truth.filter(col("rank") <= kGT)), kGT)

  def recallOfPairs(results: Array[(Long, Long)], truthTop: Array[(Long, Long)],
      kGT: Int): Double = {
    val rset = results.toSet
    val hits = truthTop.count(rset.contains)
    val nq = truthTop.map(_._1).distinct.length
    hits.toDouble / (nq.toLong * kGT)
  }

  /** Exactly [[graft.operators.Metrics.meanAveragePrecision]] driver-side:
    * AP = sum over relevant ranks of precision@rank, divided by k (zero-hit
    * queries contribute 0); MAP = mean over distinct truth qids. */
  def mapAtK(results: DataFrame, truth: DataFrame, k: Int): Double = {
    val t = pairs(truth.filter(col("rank") <= k))
    val tset = t.toSet
    val r = results.filter(col("rank") <= k)
      .select(col("qid").cast("long"), col("nid").cast("long"), col("rank").cast("int"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
    val byQ = r.groupBy(_._1)
    val qids = t.map(_._1).distinct.sorted
    val aps = qids.map { qid =>
      val rows = byQ.getOrElse(qid, Array.empty).sortBy(_._3)
      var cum = 0
      var sum = 0.0
      rows.foreach { case (_, nid, rank) =>
        if (tset.contains((qid, nid))) { cum += 1; sum += cum.toDouble / rank }
      }
      sum / k
    }
    aps.sum / qids.length
  }

  /** Symmetric difference size of two bounded relations on the given
    * columns — the driver-side twin of `a.except(b).count() +
    * b.except(a).count()` (set semantics, no nulls in gate relations). */
  def symmetricDiff(a: DataFrame, b: DataFrame, cols: Seq[String]): Long = {
    def rows(df: DataFrame): Set[Seq[Any]] =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val (sa, sb) = (rows(a), rows(b))
    ((sa diff sb).size + (sb diff sa).size).toLong
  }
}

/** Memo for the exact brute-force twins the gate entries compare against:
  * several gates (ann_knn, ann_recall, pq_adc_topk, nvq_knn, ivf_knn) share
  * the same exact top-k over the same scale dir — the result is tiny
  * (nQueries x k rows) and deterministic, so it is computed once per
  * (dir, k, filter) and re-served as a local relation. */
private[queries] object ExactTwins {
  import graft.Tables
  import graft.operators.KnnExact

  private val memo =
    new scala.collection.concurrent.TrieMap[(String, Int, Option[Int]), Array[(Long, Int, Long)]]()

  /** (qid, rank, nid) of the exact COSINE top-k on embeddings. */
  def knn(s: SparkSession, dir: String, k: Int, nQueries: Int,
      labelFilter: Option[Int] = None): DataFrame = {
    import s.implicits._
    val rows = memo.getOrElseUpdate((dir, k, labelFilter), {
      val base0 = Tables.embeddings(s, dir)
      val base = labelFilter.map(lb => base0.filter(col("label") === lb)).getOrElse(base0)
      val q = base0.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      KnnExact.knn(base, q, k, "COSINE", "vec_id", "embedding")
        .select("qid", "rank", "nid")
        .as[(Long, Int, Long)].collect()
    })
    rows.toSeq.toDF("qid", "rank", "nid")
  }
}
