package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Bounded-memory corpus sketches.
  *
  * [[MisraGriesAgg]] is the classic k-counter heavy-hitters summary
  * (Misra & Gries 1982): per-partition state is at most k counters no
  * matter how large or skewed the stream, partial summaries merge
  * associatively, and the result carries the standard guarantee — every
  * item with true frequency > n/(k+1) is present, and each reported count
  * undercounts its true frequency by at most n/(k+1). That bound (not a
  * row-identical result) is the operator's contract: which survivors and
  * what deficits arise depend on partitioning order, exactly like any
  * streaming summary, so the driver gate checks the guarantee against the
  * exact counts rather than hash-matching.
  *
  * At 100 TB this is the shape that replaces `groupBy(token).count()`
  * when only the head of the distribution matters: state O(k) per task,
  * one O(k)-row shuffle, no corpus-sized aggregation anywhere.
  */
case class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Array[(String, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  /** Decay every counter by the overflow amount and drop non-positive
    * ones — the step that caps the summary at k counters. */
  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest count: at most k survive. On the
      // per-row path size is exactly k+1, so that's just the minimum.
      val cut =
        if (m.size == k + 1) m.values.min
        else m.values.toArray.sortBy(-_)(Ordering.Long).apply(k)
      m.flatMap { case (key, c) =>
        if (c - cut > 0) Some(key -> (c - cut)) else None
      }
    }

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    // nulls are skipped, not counted: a null Map key would fail the buffer
    // encoder, and "null" is not an item of any stream we summarize
    if (x == null) m else shrink(m.updated(x, m.getOrElse(x, 0L) + 1L))

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    shrink(b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    })

  override def finish(m: Map[String, Long]): Array[(String, Long)] =
    m.toArray.sortBy { case (key, c) => (-c, key) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[(String, Long)]] = ExpressionEncoder()
}

object Sketches {
  /** Column form: `df.agg(Sketches.misraGries(8)($"token"))` →
    * array<struct<_1: item, _2: lower-bound count>> sorted count desc. */
  def misraGries(k: Int): UserDefinedFunction = udaf(MisraGriesAgg(k))
}
