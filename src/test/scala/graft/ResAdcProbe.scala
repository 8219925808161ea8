package graft

import graft.index.Ann
import graft.operators.KnnExact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement probe for the pqres serving gate bars (test scope). */
object ResAdcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nClusters = 16; val d = 32; val perCluster = 500; val topK = 10
    val rnd = new java.util.Random(29)
    val centers = Array.fill(nClusters)(Array.fill(d)(rnd.nextGaussian().toFloat * 2))
    val rows = (0 until nClusters * perCluster).map { i =>
      val r = new java.util.Random(i * 31L + 5)
      val c = centers(i % nClusters)
      (i.toLong, Array.tabulate(d)(j => c(j) + r.nextGaussian().toFloat).toSeq)
    }
    val base = spark.createDataset(rows).toDF("id", "vec").repartition(8, col("id"))
    val p = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64, pqM = 8)
    val root = java.nio.file.Files.createTempDirectory("graft_pqres_probe").toString
    Ann.buildIndexClustered(base, s"$root/pq", p.copy(pqBuild = true), nlist = nClusters)
    val glob = s"$root/pq_glob"
    val conf = spark.sessionState.newHadoopConf()
    val hfs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(hfs, new org.apache.hadoop.fs.Path(s"$root/pq"),
      hfs, new org.apache.hadoop.fs.Path(glob), false, conf)
    hfs.delete(new org.apache.hadoop.fs.Path(s"$glob/_pqres_model"), true)
    val queries = rows.take(40).toDF("qid", "qvec")
    val truth = KnnExact.knn(base, queries, topK, "COSINE", "id", "vec")
    def hits(res: DataFrame): Double = res.select("qid", "nid")
      .join(truth.select("qid", "nid"), Seq("qid", "nid"), "left_semi")
      .count().toDouble / truth.count()
    for ((ef, fr, rk) <- Seq((topK, 1, topK), (2 * topK, 1, topK), (2 * topK, 2, 2 * topK), (64, 4, topK))) {
      val pT = p.copy(adcFrontierPerK = fr)
      val r1 = hits(Ann.searchIndex(spark, s"$root/pq", queries, topK, ef, pT, rerankK = rk))
      val r2 = hits(Ann.searchIndex(spark, glob, queries, topK, ef, pT, rerankK = rk))
      println(s"PROBE ef=$ef frontier=$fr rerankK=$rk residual=$r1 global=$r2")
    }
    // rerank economics: exact reranks per query needed for equal recall —
    // residual ordering should hold recall with a smaller exact-rerank
    // pool (the cost story: full-res fetches are the expensive step at
    // scale, jvector's late materialization)
    for ((tag, path) <- Seq("residual" -> s"$root/pq", "global" -> glob);
         pool <- Seq(10, 20, 30, 40, 64)) {
      val m = Ann.newMetrics(spark)
      val rec = hits(Ann.searchIndex(spark, path, queries, topK, ef = pool,
        p.copy(adcFrontierPerK = 1), rerankK = pool, metrics = Some(m)))
      val rrq = m.reranked.value.toDouble / 40
      println(f"ECON $tag pool=$pool recall=$rec%.4f reranks_per_query=$rrq%.1f")
    }
    spark.stop()
  }
}
