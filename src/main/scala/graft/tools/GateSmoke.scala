package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off smoke runner for any SparkEntry gate by name (dev tool).
  * Usage: GateSmoke [sfDir] [gateName...] — with no names, runs a
  * representative service/source trio. */
object GateSmoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("vecs_source", "service_lifecycle", "stream_dedup")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val t0 = System.nanoTime()
      try {
        val rows = graft.SparkEntry.queries(name)(spark, dir).collect()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"GATE $name%-20s ${secs}%6.2fs " + rows.map { r =>
          if (r.schema.fieldNames.contains("pass"))
            s"${r.getString(0)}=${r.getBoolean(r.fieldIndex("pass"))}"
          else r.toString
        }.mkString(" "))
      } catch { case e: Throwable =>
        println(s"GATE $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        e.printStackTrace()
      }
    }
    spark.stop()
  }
}
