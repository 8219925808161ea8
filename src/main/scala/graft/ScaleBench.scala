package graft

import graft.index.Ann
import graft.operators.{KnnExact, Metrics}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale demonstration (not part of the driver's Bench contract): shows the
  * multi-segment design doing what it is built for — parallel segment
  * builds, directory-pruned segment routing, and large-batch query fan-out
  * — at a size the driver tables don't reach (default 100k vectors).
  *
  * Prints one JSON line:
  *   build_sec (parallel, all segments), segments, search QPS for a
  *   256-query batch with probeSegments routing, recall@10 vs exact,
  *   visited ratio (fraction of the index scored per query).
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val dim = if (args.length > 1) args(1).toInt else 32
    val nClusters = 32
    val probes = if (args.length > 2) args(2).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // heap comes from the forked JVM's -Xmx (build.sbt: SPARK_DRIVER_MEM,
      // default 8g) — spark.driver.memory is a no-op once the JVM is up
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // clustered synthetic corpus (deterministic): routing is only useful
    // when geometry has structure, as real embedding corpora do
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat * 2))
    val rows = (0 until n).map { i =>
      val c = centers(i % nClusters)
      val r = new scala.util.Random(i)
      (i.toLong, Array.tabulate(dim)(j => c(j) + r.nextGaussian().toFloat * 1.0f).toSeq)
    }
    val base = rows.toDF("id", "vec").repartition(16).cache()
    base.count()

    // args(3) = pqM > 0 switches to the compressed two-phase configuration:
    // PQ codes persisted in the index + codebook sidecar, beam on ADC
    // scores, exact rerank — the memory-bound production setup
    val pqM = if (args.length > 3) args(3).toInt else 0
    val params = Ann.Params(metric = "COSINE", maxDegree = 32, beamWidth = 100, pqM = pqM)
    val rerankK = if (pqM > 0) 40 else 0
    val idx = java.nio.file.Files.createTempDirectory("graft_scale").toString + "/idx"
    // locality-aware segmentation: coarse k-means -> one segment per
    // cluster, so probeSegments routing is accurate (random segmentation
    // would make every segment a uniform sample and routing useless)
    val t0 = System.nanoTime()
    Ann.buildIndexClustered(base, idx, params, nlist = 48)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val segments = spark.read.parquet(idx).select("seg").distinct().count()

    val queries = rows.take(256).map { case (id, v) => (id, v) }.toDF("qid", "qvec").cache()
    queries.count()
    // warmup (loads + caches segments)
    Ann.searchIndex(spark, idx, queries, 10, 150, params, probeSegments = probes, rerankK = rerankK).count()
    val m = Ann.newMetrics(spark)
    val t1 = System.nanoTime()
    val runs = 3
    (1 to runs).foreach { _ =>
      Ann.searchIndex(spark, idx, queries, 10, 150, params, probeSegments = probes,
        metrics = Some(m), rerankK = rerankK).count()
    }
    val qps = 256.0 * runs / ((System.nanoTime() - t1) / 1e9)
    val visitedRatio = m.visitedRatioPerQuery(256L * runs)

    val ann = Ann.searchIndex(spark, idx, queries, 10, 150, params, probeSegments = probes, rerankK = rerankK)
    val exact = KnnExact.knn(base, queries, 10, "COSINE")
    val recall = Metrics.recallAtK(ann, exact, 10).head().getDouble(0)

    println(s"""{"metric":"scale_demo","n":$n,"dim":$dim,"segments":$segments,""" +
      s""""build_sec":$buildSec,"build_vps":${n / buildSec},"qps_256batch":$qps,""" +
      s""""recall_at_10":$recall,"visited_ratio":$visitedRatio,"probe_segments":$probes,"pq_m":$pqM,"rerank_k":$rerankK}""")
    spark.stop()
  }
}
