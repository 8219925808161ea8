package graft

import graft.index.{Ann, Ivf}
import graft.operators.{KnnExact, PQ}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Residual-encoded IVF-PQ layout (FAISS IVF-PQ): codes encode
  * r = v − clusterCentroid, phase-1 ADC shifts per (query, cluster). */
class IvfResSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(nc: Int, per: Int, d: Int, seed: Long): Seq[(Long, Seq[Double])] = {
    val rnd = new java.util.Random(seed)
    val centers = Array.fill(nc)(Array.fill(d)(rnd.nextGaussian() * 2))
    (0 until nc * per).map { i =>
      val r = new java.util.Random(i * 131L + seed)
      val c = centers(i % nc)
      (i.toLong, Seq.tabulate(d)(j => c(j) + r.nextGaussian() * 0.7))
    }
  }

  private def recallOf(got: DataFrame, want: DataFrame): Double = {
    val g = got.select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val w = want.select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val r = w.map { case (q, ws) =>
      g.get(q).map(_.intersect(ws).size.toDouble / ws.size).getOrElse(0.0) }
    r.sum / r.size
  }

  test("residual IVF-PQ layout: sharper phase-1 ordering at equal rerankK; threshold route green") {
    val rows = clustered(nc = 16, per = 300, d = 16, seed = 47)
    val base = rows.toDF("id", "vec").repartition(4, col("id"))
    val model = Ivf.train(base, "vec", nlist = 16, metric = "COSINE")
    val pqGlob = PQ.train(base, "vec", 8, 128)
    val pqRes = Ivf.trainResidualPQ(base, "vec", model, 8, 128)
    val root = java.nio.file.Files.createTempDirectory("ivfres").toString
    Ivf.writePartitionedPQ(base, "vec", model, pqGlob, s"$root/glob", idCol = "id")
    Ivf.writePartitionedPQ(base, "vec", model, pqRes, s"$root/res", idCol = "id",
      residualPq = true)
    val queries = rows.take(30).map { case (id, v) => (id, v) }.toDF("qid", "qvec")
    val nprobe = 4
    // probed-exact twin: the layout searches are gated against what an
    // exact scan of the SAME probed clusters returns (routing quality is
    // the IVF model's property, not the codes')
    val probed = {
      val probePairs = rows.take(30).flatMap { case (qid, v) =>
        model.nearestClusters(v.toArray, nprobe).map(c => (qid, c)) }
        .toDF("qid", "cl")
      val assigned = Ivf.assign(base, "vec", model)
        .select(col("id").cast("long").as("nid"), col("cluster_id").as("cl"))
      val exactAll = KnnExact.knn(base, queries, 10, "COSINE", "id", "vec")
      exactAll.select("qid", "nid").join(assigned, "nid")
        .join(broadcast(probePairs), Seq("qid", "cl"), "left_semi")
    }
    // equal, MINIMAL rerank budget: rerankK = topK — phase-1 ordering is
    // the whole signal, zero oversampling slack
    def rec(path: String, pq: graft.operators.PQModel): Double = recallOf(
      Ivf.searchPartitionedPQ(path, queries, model, pq, nprobe,
        topK = 10, rerankK = 10, baseId = "id", baseVec = "vec"), probed)
    val (rRes, rGlob) = (rec(s"$root/res", pqRes), rec(s"$root/glob", pqGlob))
    info(s"zero-slack IVF-PQ recall vs probed-exact: residual $rRes vs global $rGlob")
    assert(rRes >= rGlob, s"residual must not lose: $rRes vs $rGlob")
    assert(rRes >= 0.8, s"residual zero-slack floor: $rRes")
    // threshold route on the residual layout: exact-scale precision must
    // hold (margin calibrates on the residual error)
    val t = 0.93
    val th = Ivf.thresholdSearchPartitionedPQ(s"$root/res", queries, model, pqRes,
      nprobe, t, baseId = "id", baseVec = "vec")
    val exactTh = KnnExact.thresholdSearch(base, queries, t, "COSINE", "id", "vec")
      .select("qid", "nid")
    // precision: every returned row truly clears t (exact re-check)
    assert(th.filter(col("score") < t).count() === 0L)
    // recall vs the probed subset of the exact threshold twin
    val assigned = Ivf.assign(base, "vec", model)
      .select(col("id").cast("long").as("nid"), col("cluster_id").as("cl"))
    val probePairs = rows.take(30).flatMap { case (qid, v) =>
      model.nearestClusters(v.toArray, nprobe).map(c => (qid, c)) }
      .toDF("qid", "cl")
    val probedTh = exactTh.join(assigned, "nid")
      .join(broadcast(probePairs), Seq("qid", "cl"), "left_semi")
    val missing = probedTh.select("qid", "nid")
      .except(th.select("qid", "nid")).count()
    val total = probedTh.count()
    info(s"residual threshold recall: ${1.0 - missing.toDouble / math.max(1, total)} of $total")
    assert(missing.toDouble / math.max(1, total) <= 0.05,
      s"residual threshold route missed $missing of $total probed-exact hits")

    // AUTO-CHUNKED large-batch path: the per-query ADC frame is bounded by
    // chunking the query set; per-query independence makes the union exact
    // — pinned row-for-row against the unchunked run on BOTH layouts and
    // both routes (7 forces 30 queries into 5 chunks)
    for (pth <- Seq(s"$root/res" -> pqRes, s"$root/glob" -> pqGlob)) {
      val (p, pq) = pth
      val whole = Ivf.searchPartitionedPQ(p, queries, model, pq, nprobe,
        topK = 10, rerankK = 10, baseId = "id", baseVec = "vec")
        .select("qid", "rank", "nid", "score").collect().toSet
      Ivf.adcChunkOverride = 7
      try {
        val chunked = Ivf.searchPartitionedPQ(p, queries, model, pq, nprobe,
          topK = 10, rerankK = 10, baseId = "id", baseVec = "vec")
          .select("qid", "rank", "nid", "score").collect().toSet
        assert(chunked === whole, s"chunked top-k must equal unchunked on $p")
      } finally Ivf.adcChunkOverride = 0
    }
    Ivf.adcChunkOverride = 7
    try {
      // threshold route: precision contract must hold under chunking (the
      // auto-margin is sampled per chunk, so HIT SETS may differ slightly;
      // pin exactness by fixing the margin)
      val thChunked = Ivf.thresholdSearchPartitionedPQ(s"$root/res", queries,
        model, pqRes, nprobe, t, adcMargin = 0.1, baseId = "id", baseVec = "vec")
        .select("qid", "nid").collect().toSet
      Ivf.adcChunkOverride = 0
      val thWhole = Ivf.thresholdSearchPartitionedPQ(s"$root/res", queries,
        model, pqRes, nprobe, t, adcMargin = 0.1, baseId = "id", baseVec = "vec")
        .select("qid", "nid").collect().toSet
      assert(thChunked === thWhole, "chunked threshold must equal unchunked at a pinned margin")
    } finally Ivf.adcChunkOverride = 0
  }
}
