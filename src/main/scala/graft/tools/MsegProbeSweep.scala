package graft.tools

import graft.index.Ann
import graft.operators.Metrics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: routed recall vs probe count on the Bench mseg corpus shape
  * (seeded n x 64d over 32 cluster-aligned segments). Builds once, sweeps
  * probeSegments, reports recall-vs-exhaustive + batch seconds per point.
  * Run: sbt "runMain graft.tools.MsegProbeSweep [n] [threads]"
  */
object MsegProbeSweep {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1 << 20
    val threads = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    val clusters = 32
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64)
    val rnd = new java.util.Random(9)
    val centers = Array.fill(clusters)(Array.fill(dim)(rnd.nextGaussian().toFloat * 2f))
    def vecOf(i: Long): Array[Float] = {
      val r = new java.util.Random(i * 2654435761L)
      val c = centers((i % clusters).toInt)
      Array.tabulate(dim)(j => c(j) + r.nextGaussian().toFloat)
    }
    val centersB = spark.sparkContext.broadcast(centers)
    val df = spark.range(0, n, 1, threads).map { i =>
      val r = new java.util.Random(i * 2654435761L)
      val c = centersB.value((i % clusters).toInt)
      (i, Seq.tabulate(dim)(j => c(j) + r.nextGaussian().toFloat))
    }.toDF("id", "vec")
    val path = java.nio.file.Files.createTempDirectory("graft_msweep").toString + "/idx"
    val t0 = System.nanoTime()
    Ann.buildIndexClustered(df, path, params, nlist = clusters)
    System.err.println(f"[msweep] n=$n build ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val queries = (0 until 50).map { i =>
      val id = i.toLong * (n / 50) + 7
      (id, vecOf(id).toSeq)
    }.toDF("qid", "qvec")
    Ann.pin(spark, path)
    val exh = Ann.searchIndex(spark, path, queries, 10, ef = 64, params, probeSegments = 0)
    exh.count()
    Seq(2, 4, 6, 8, 10, 12, 16).foreach { p =>
      val res = Ann.searchIndex(spark, path, queries, 10, ef = 64, params, probeSegments = p)
      res.count()
      val ts = (1 to 3).map { _ =>
        val s = System.nanoTime()
        Ann.searchIndex(spark, path, queries, 10, ef = 64, params, probeSegments = p).count()
        (System.nanoTime() - s) / 1e9
      }
      val rec = Metrics.recallAtK(res, exh, 10).head().getDouble(0)
      System.err.println(f"[msweep] probe=$p%2d recall=$rec%.4f best=${ts.min}%.3fs")
    }
    // per-query miss detail at the AutoProbe point
    val auto = Ann.searchIndex(spark, path, queries, 10, ef = 64, params,
      probeSegments = Ann.AutoProbe)
    val perQ = auto.select(col("qid"), col("nid")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exQ = exh.select(col("qid"), col("nid")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    exQ.toSeq.sortBy(_._1).foreach { case (q, want) =>
      val got = perQ.getOrElse(q, Set.empty)
      val miss = want.diff(got)
      if (miss.nonEmpty)
        System.err.println(s"[msweep] qid=$q missed=${miss.toSeq.sorted.mkString(",")} " +
          s"(clusters ${miss.map(_ % clusters).toSeq.sorted.distinct.mkString(",")}; " +
          s"query cluster ${q % clusters})")
    }
    spark.stop()
  }
}
