package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.Ann
import graft.operators.KnnExact

/** Replicates the ann_routed_filtered gate fixture (16 planted clusters x
  * 500, d=32) and sweeps probe widths per selectivity, printing filtered
  * recall vs the filtered exact twin — the data for choosing the filtered
  * routing floor. Run with different core counts to expose the build's
  * partitioning sensitivity (the fixture is rebuilt per run).
  *
  * Run: sbt "runMain graft.tools.RoutedFilteredProbe [cores]"
  */
object RoutedFilteredProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).getOrElse("8")
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    val nClusters = 16; val d = 32; val perCluster = 500; val topK = 10
    val rnd = new java.util.Random(13)
    val centers = Array.fill(nClusters)(Array.fill(d)(rnd.nextGaussian().toFloat * 2))
    val rows = (0 until nClusters * perCluster).map { i =>
      val r = new java.util.Random(i)
      val c = centers(i % nClusters)
      (i.toLong, Array.tabulate(d)(j => c(j) + r.nextGaussian().toFloat).toSeq)
    }
    val base = s.createDataset(rows).toDF("id", "vec").repartition(8)
    val p = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64, seed = 42)
    val root = java.nio.file.Files.createTempDirectory("graft_rf_probe").toString
    Ann.buildIndexClustered(base, s"$root/clu", p, nlist = nClusters)
    val queries = rows.take(40).toDF("qid", "qvec")

    def accepted(pred: Long => Boolean) = rows.map(_._1).filter(pred).toDF("id")
    def recallAt(pred: Long => Boolean, probe: Int): (Double, Long) = {
      val acc = accepted(pred)
      val m = Ann.newMetrics(s)
      val res = Ann.searchIndex(s, s"$root/clu", queries, topK, 64, p,
        accepts = Some(acc), probeSegments = probe, metrics = Some(m))
      val exact = KnnExact.knn(base.join(acc, Seq("id"), "left_semi"),
        queries, topK, "COSINE", "id", "vec")
      val hit = res.select("qid", "nid")
        .join(exact.select("qid", "nid"), Seq("qid", "nid"), "left_semi").count()
      (hit.toDouble / exact.count(), m.visited.value)
    }

    val sels: Seq[(String, Long => Boolean)] = Seq(
      ("sel50 (id%2)", _ % 2 == 0),
      ("sel5 (id%20)", _ % 20 == 0),
      ("2class", id => { val cls = id % nClusters; cls == 3 || cls == 11 }))
    // routing internals: centroids + accepted mass per segment, first 3 queries
    locally {
      val idx = s.read.parquet(s"$root/clu")
      val cents = idx.filter($"local_id" === 0).select($"seg", $"seg_centroid")
        .collect().map(r => (r.getString(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val segRows = idx.groupBy("seg").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      println(s"segments=${cents.length} rows/seg=${segRows.values.toSeq.sorted.mkString(",")}")
      val perSeg = idx.filter($"node_id" % 2 === 0).groupBy("seg").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val eligible = cents.indices.filter(i => perSeg.getOrElse(cents(i)._1, 0L) > 0L).toArray
      val base0 = math.ceil(math.sqrt(cents.length.toDouble)).toInt
      for (qi <- 0 until 3) {
        val q = rows(qi)._2.toArray
        val autoPick = Ann.pickSegments(q, "COSINE", cents, base0, base0, 40L, perSeg, eligible)
        val expl = Ann.pickSegments(q, "COSINE", cents, 4, 4, 0L, null, null)
        println(s"q$qi AUTO=${autoPick.mkString("|")}  explicit4=${expl.mkString("|")}")
      }
    }
    for ((label, pred) <- sels) {
      val (auto, autoV) = recallAt(pred, Ann.AutoProbe)
      val sweep = (3 to 10).map { n =>
        val (r, v) = recallAt(pred, n); f"$n:$r%.3f/$v"
      }.mkString(" ")
      println(f"$label%-14s cores=$cores AUTO=$auto%.3f/$autoV  explicit $sweep")
    }
    s.stop()
  }
}
