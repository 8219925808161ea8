package graft

import org.apache.spark.sql.SparkSession

/** Iteration aid (test scope, not part of the library): run named
  * SparkEntry.queries entries against a scale dir and print the results.
  * Usage: sbt "Test/runMain graft.RunQuery /root/testdata/sf0.01 ipc_churn"
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.show(200, false)
      System.err.println(f"[runquery] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
