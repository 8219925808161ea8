package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoder

/** A/B micro for the bounded top-k aggregator's reduce path: the shipped
  * flat-buffer [[graft.operators.TopKAgg]] vs the previous immutable
  * `Array[(Long, Double)] :+ x` form (inlined here verbatim for the
  * comparison). The reduce runs once per scored row of every exact-kNN
  * query, so this measures the hottest aggregation loop in the engine.
  *
  * Run: sbt "runMain graft.tools.TopKMicro [rows] [groups] [k]"
  * (defaults 8000000 64 100)
  */
object TopKMicro {

  /** The pre-optimization aggregator, kept for the A/B. */
  case class OldTopKAgg(k: Int)
      extends Aggregator[(Long, Double), Array[(Long, Double)], Array[(Long, Double)]] {
    private val cap = math.max(k * 4, 64)
    private def compact(buf: Array[(Long, Double)]): Array[(Long, Double)] = {
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

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 8000000
    val groups = if (args.length > 1) args(1).toInt else 64
    val k = if (args.length > 2) args(2).toInt else 100
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .appName("topk-micro").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.range(rows)
      .select(pmod(col("id"), lit(groups.toLong)).as("g"), col("id").as("nid"),
        (pmod(col("id") * 2654435761L, lit(1000003L)) / 1000003.0).as("s"))
      .localCheckpoint(true)

    def run(name: String, agg: org.apache.spark.sql.expressions.UserDefinedFunction): Unit = {
      // warmup + 3 timed runs, report the best
      df.groupBy("g").agg(agg(col("nid"), col("s")).as("t")).count()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.groupBy("g").agg(agg(col("nid"), col("s")).as("t")).count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(
        f"[topk-micro] $name%-6s best ${times.min}%6.2fs (${rows / times.min / 1e6}%5.1f M rows/s)")
    }
    run("old", udaf(OldTopKAgg(k), ExpressionEncoder[(Long, Double)]()))
    run("new", graft.operators.TopK.udf(k))

    // equivalence: identical output on the same input
    val a = df.groupBy("g").agg(udaf(OldTopKAgg(k), ExpressionEncoder[(Long, Double)]())(col("nid"), col("s")).as("t"))
      .select(col("g"), posexplode(col("t"))).collect().map(_.toSeq).toSet
    val b = df.groupBy("g").agg(graft.operators.TopK.udf(k)(col("nid"), col("s")).as("t"))
      .select(col("g"), posexplode(col("t"))).collect().map(_.toSeq).toSet
    assert(a == b, "old and new top-k aggregators disagree")
    System.err.println(s"[topk-micro] equivalence OK (${a.size} rows)")
    spark.stop()
  }
}
