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
case class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), Array[(Long, Double)], Array[(Long, Double)]] {

  private val cap = math.max(k * 4, 64)

  private def compact(buf: Array[(Long, Double)]): Array[(Long, Double)] = {
    // dedupe ids keeping the best score — makes multi-segment merges
    // idempotent when the same id appears in more than one segment (e.g.
    // re-ingested batches); first occurrence after the sort is the best.
    val sorted = buf.sortBy { case (id, s) => (-s, id) }
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Double)](math.min(k, sorted.length))
    var i = 0
    while (i < sorted.length && out.length < k) {
      if (seen.add(sorted(i)._1)) out += sorted(i)
      i += 1
    }
    out.toArray
  }

  override def zero: Array[(Long, Double)] = Array.empty

  override def reduce(buf: Array[(Long, Double)], x: (Long, Double)): Array[(Long, Double)] = {
    val appended = buf :+ x
    if (appended.length >= cap) compact(appended) else appended
  }

  override def merge(a: Array[(Long, Double)], b: Array[(Long, Double)]): Array[(Long, Double)] =
    compact(a ++ b)

  override def finish(buf: Array[(Long, Double)]): Array[(Long, Double)] = compact(buf)

  override def bufferEncoder: Encoder[Array[(Long, Double)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[(Long, Double)]] = ExpressionEncoder()
}

object TopK {
  /** Untyped column form: `df.groupBy("qid").agg(TopK.udf(10)($"id", $"score"))`.
    * Returns array<struct<_1: id, _2: score>> sorted score desc, id asc. */
  def udf(k: Int): UserDefinedFunction =
    udaf(TopKAgg(k), ExpressionEncoder[(Long, Double)]())
}
