package graft.tools

import graft.queries.ServiceQueries
import org.apache.spark.sql.SparkSession

/** One-off smoke runner for the ServiceQueries gates (dev tool). */
object GateSmoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("vecs_source", "service_lifecycle", "stream_dedup")) {
      val t0 = System.nanoTime()
      try {
        val rows = ServiceQueries.queries(name)(spark, dir).collect()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"GATE $name%-20s ${secs}%6.2fs " + rows.map(r =>
          s"${r.getString(0)}=${r.getBoolean(2)}").mkString(" "))
      } catch { case e: Throwable =>
        println(s"GATE $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        e.printStackTrace()
      }
    }
    spark.stop()
  }
}
