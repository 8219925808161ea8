package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Bounded per-group top-k aggregator.
  *
  * The reference keeps per-query results in a bounded min-heap packed into
  * longs (jvector `graph/NodeQueue.java:42-150`, `util/BoundedLongHeap.java`).
  * In Spark the equivalent is a typed `Aggregator`: partial aggregation runs
  * map-side (each task keeps at most ~2k candidates per group), so a k-NN
  * over `n_base * n_query` scored rows shuffles only `O(k * partitions)` rows
  * per group instead of sorting the whole cross product the way a window
  * `row_number()` plan would. This is what makes the exact-kNN path viable
  * at cluster scale.
  *
  * Ordering contract (must match the reference for deterministic results):
  * score DESC, id ASC (jvector `graph/SearchResult.java:100-106`).
  */
/** Mutable flat buffer for [[TopKAgg]]: parallel primitive arrays + fill
  * count. `reduce` runs once per SCORED ROW of every exact-kNN / merge
  * query, so the buffer is mutated in place — the previous immutable
  * `Array[(Long, Double)] :+ x` copied the whole buffer (and boxed a
  * tuple) per input row. */
case class TopKBuf(var ids: Array[Long], var scores: Array[Double], var n: Int)

case class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), TopKBuf, Array[(Long, Double)]] {

  private val cap = math.max(k * 4, 64)

  /** Sort by (score desc, id asc), dedupe ids keeping the best score —
    * makes multi-segment merges idempotent when the same id appears in
    * more than one segment (e.g. re-ingested batches) — and keep k. */
  private def compacted(ids: Array[Long], scores: Array[Double], n: Int)
      : (Array[Long], Array[Double], Int) = {
    val idx = Array.range(0, n).sortBy(i => (-scores(i), ids(i)))
    val seen = new java.util.HashSet[Long]()
    val lim = math.min(k, n)
    val oi = new Array[Long](lim)
    val os = new Array[Double](lim)
    var m = 0
    var i = 0
    while (i < n && m < k) {
      val j = idx(i)
      if (seen.add(ids(j))) { oi(m) = ids(j); os(m) = scores(j); m += 1 }
      i += 1
    }
    (oi, os, m)
  }

  override def zero: TopKBuf = TopKBuf(Array.emptyLongArray, Array.emptyDoubleArray, 0)

  override def reduce(b: TopKBuf, x: (Long, Double)): TopKBuf = {
    if (b.ids.length < cap) { // grow once (fresh zero / deserialized buffer)
      val ni = new Array[Long](cap)
      val ns = new Array[Double](cap)
      System.arraycopy(b.ids, 0, ni, 0, b.n)
      System.arraycopy(b.scores, 0, ns, 0, b.n)
      b.ids = ni
      b.scores = ns
    }
    b.ids(b.n) = x._1
    b.scores(b.n) = x._2
    b.n += 1
    if (b.n == cap) { // same compaction trigger as the immutable form
      val (oi, os, m) = compacted(b.ids, b.scores, b.n)
      System.arraycopy(oi, 0, b.ids, 0, m)
      System.arraycopy(os, 0, b.scores, 0, m)
      b.n = m
    }
    b
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    val n = a.n + b.n
    val ids = new Array[Long](n)
    val scores = new Array[Double](n)
    System.arraycopy(a.ids, 0, ids, 0, a.n)
    System.arraycopy(b.ids, 0, ids, a.n, b.n)
    System.arraycopy(a.scores, 0, scores, 0, a.n)
    System.arraycopy(b.scores, 0, scores, a.n, b.n)
    val (oi, os, m) = compacted(ids, scores, n)
    TopKBuf(oi, os, m)
  }

  override def finish(b: TopKBuf): Array[(Long, Double)] = {
    val (oi, os, m) = compacted(b.ids, b.scores, b.n)
    Array.tabulate(m)(i => (oi(i), os(i)))
  }

  override def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[(Long, Double)]] = ExpressionEncoder()
}

object TopK {
  /** Untyped column form: `df.groupBy("qid").agg(TopK.udf(10)($"id", $"score"))`.
    * Returns array<struct<_1: id, _2: score>> sorted score desc, id asc. */
  def udf(k: Int): UserDefinedFunction =
    udaf(TopKAgg(k), ExpressionEncoder[(Long, Double)]())
}
