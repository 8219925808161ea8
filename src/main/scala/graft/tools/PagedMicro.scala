package graft.tools

import graft.index.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-bench for the r6 compressed paged/threshold routes: same
  * pqM=8 tree, same queries — pages via the exact beam (rerankK = 0)
  * vs the ADC cursor + exact rerank (rerankK > 0). Reports QPS for both
  * and the threshold variants. Usage: PagedMicro [n] [dim] [nQ]
  */
object PagedMicro {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 50000
    val dim = if (args.length > 1) args(1).toInt else 64
    val nQ = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val base = (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec").repartition(8).cache()
    base.count()
    val params = Ann.Params(metric = "COSINE", maxDegree = 32, beamWidth = 100, pqM = 8)
    val idx = java.nio.file.Files.createTempDirectory("pagedmicro").toString + "/idx"
    Ann.buildIndex(base, idx, params)
    val queries = (0 until nQ).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("qid", "qvec").cache()
    Ann.pin(spark, idx)
    def qps(label: String)(body: => Unit): Unit = {
      (1 to 2).foreach(_ => body) // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"### $label qps=${nQ / (ts.sum / 3)}%.1f")
    }
    qps("paged_exact ")(Ann.searchIndexPaged(spark, idx, queries, Seq(10, 10), ef = 64, params).count())
    qps("paged_adc   ")(Ann.searchIndexPaged(spark, idx, queries, Seq(10, 10), ef = 64, params,
      rerankK = 20).count())
    qps("thresh_exact")(Ann.thresholdSearchIndex(spark, idx, queries, 0.62, 64, params).count())
    qps("thresh_adc  ")(Ann.thresholdSearchIndex(spark, idx, queries, 0.62, 64, params,
      rerankK = 64).count())
    spark.stop()
  }
}
