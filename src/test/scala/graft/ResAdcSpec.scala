package graft

import graft.index.Ann
import graft.operators.{KnnExact, PQ, PQModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Residual-ADC SERVING on clustered trees (round-13, the serving-side twin
  * of the r12 residual construction): per-node residual codes persisted
  * under a root `_pqres_model` sidecar, scored at search time with
  * per-query residual LUTs + per-cell shift terms (FAISS IVF-PQ serving;
  * the reference's per-query ADC `quantization/PQVectors.java:210` has no
  * shift because it never cell-partitions). */
class ResAdcSpec extends SparkSpec {
  import spark.implicits._

  /** Clusterable corpus: `nc` Gaussian cells of `per` points each. */
  private def clustered(nc: Int, per: Int, d: Int, seed: Long): Seq[(Long, Seq[Float])] = {
    val rnd = new java.util.Random(seed)
    val centers = Array.fill(nc)(Array.fill(d)(rnd.nextGaussian().toFloat * 2))
    (0 until nc * per).map { i =>
      val r = new java.util.Random(i * 131L + seed)
      val c = centers(i % nc)
      (i.toLong, Seq.tabulate(d)(j => c(j) + r.nextGaussian().toFloat * 0.5f))
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

  test("resAdcScorer is exactly the reconstruction score v̂ = cell + decode(r̂), all metrics") {
    // hand-built model: dim 4, m 2, k 4
    val cb: Array[Array[Array[Double]]] = Array(
      Array(Array(0.1, -0.2), Array(0.4, 0.3), Array(-0.5, 0.2), Array(0.0, 0.6)),
      Array(Array(-0.3, 0.1), Array(0.2, 0.2), Array(0.5, -0.4), Array(-0.1, -0.6)))
    val model = PQModel(4, 2, 4, Array(2, 2), Array(0, 2), cb)
    val cell = Array(1.0, -2.0, 0.5, 3.0)
    val q = Array(0.7f, -1.1f, 0.3f, 2.5f)
    val qd = q.map(_.toDouble)
    val flat = Array(1, 2, 0, 3, 3, 0, 2, 1) // 4 nodes x m=2
    val (rdots, _) = PQ.adcTables(qd, model)
    val (cdots, rmags) = PQ.adcTables(cell, model)
    val qn = qd.map(x => x * x).sum
    val cn = cell.map(x => x * x).sum
    val qc = qd.zip(cell).map { case (a, b) => a * b }.sum
    for (mc <- 0 to 2) {
      val score = Ann.resAdcScorer(flat, 2, 4, mc, rdots, cdots, rmags, qn, cn, qc)
      for (i <- 0 until 4) {
        val vhat = model.decode(Array(flat(i * 2), flat(i * 2 + 1)))
          .zip(cell).map { case (r, c) => r + c }
        val dot = qd.zip(vhat).map { case (a, b) => a * b }.sum
        val n2 = vhat.map(x => x * x).sum
        val want = mc match {
          case 0 =>
            val dist = qd.zip(vhat).map { case (a, b) => (a - b) * (a - b) }.sum
            1.0 / (1.0 + dist)
          case 1 => (1.0 + dot) / 2.0
          case 2 => (1.0 + dot / (math.sqrt(n2) * math.sqrt(qn))) / 2.0
        }
        assert(math.abs(score(i) - want) < 1e-9,
          s"metric $mc node $i: scorer ${score(i)} vs reconstruction $want")
      }
    }
  }

  test("clustered pqM>0 build persists res_code/res_cell + _pqres_model; repair preserves them") {
    val rows = clustered(nc = 8, per = 120, d = 16, seed = 41)
    val base = rows.toDF("id", "vec").repartition(4, col("id"))
    val root = java.nio.file.Files.createTempDirectory("graft_resadc_b").toString
    val idx = s"$root/idx"
    val p = Ann.Params(metric = "COSINE", maxDegree = 12, beamWidth = 48, pqM = 4)
    Ann.buildIndexClustered(base, idx, p, nlist = 8)
    val df = spark.read.option("mergeSchema", "true").parquet(idx)
    val n = df.count()
    assert(df.filter(col("res_code").isNotNull).count() === n,
      "every node carries a residual code")
    assert(df.filter(col("res_cell").isNotNull).count() === 8,
      "one encoding cell per segment")
    val model = PQ.load(spark, s"$idx/_pqres_model")
    assert(model.m === math.max(4, 16 / 4), "residual granularity max(pqM, dim/4)")
    // residual codes decode soundly: cell + decode(res_code) lands closer
    // to the vector than the bare cell centroid does
    val sample = df.filter(col("res_cell").isNotNull)
      .select("vec", "res_code", "res_cell").limit(8).collect()
    sample.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val code = r.getSeq[Int](1).toArray
      val cell = r.getSeq[Double](2).toArray
      val vhat = model.decode(code).zip(cell).map { case (a, b) => a + b }
      val err = v.zip(vhat).map { case (a, b) => (a - b) * (a - b) }.sum
      val res = v.zip(cell).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(err < res, s"residual decode must beat the bare cell: err $err vs residual $res")
    }
    // repair keeps the payload: tombstone a few rows, segments rewrite, the
    // residual codes and the (re-homed) cell survive on the new rows
    Ann.repairDeleted(spark, idx, Seq(3L, 20L, 77L).toDF("id"), p)
    val df2 = spark.read.option("mergeSchema", "true").parquet(idx)
    assert(df2.filter(col("res_code").isNotNull).count() === n - 3,
      "repair preserves per-node residual codes")
    assert(df2.filter(col("res_cell").isNotNull).count() === 8,
      "repair re-homes the per-segment cell to the new local 0")
  }

  test("residual two-phase end-to-end on EUCLIDEAN and DOT clustered trees") {
    // the scorer is unit-pinned bit-exact for all three metrics; this
    // covers the metric-code PLUMBING end-to-end (p.metric -> mc ->
    // centroid-term algebra) on non-COSINE clustered trees
    for (metric <- Seq("EUCLIDEAN", "DOT_PRODUCT")) {
      val rows = clustered(nc = 8, per = 150, d = 16, seed = 71)
      val base = rows.toDF("id", "vec").repartition(4, col("id"))
      val root = java.nio.file.Files.createTempDirectory(s"graft_resadc_m_$metric").toString
      val p = Ann.Params(metric = metric, maxDegree = 12, beamWidth = 48, pqM = 4)
      Ann.buildIndexClustered(base, s"$root/idx", p, nlist = 8)
      val queries = rows.take(20).toDF("qid", "qvec")
      val truth = KnnExact.knn(base, queries, 10, metric, "id", "vec")
      val got = Ann.searchIndex(spark, s"$root/idx", queries, 10, ef = 20,
        p.copy(adcFrontierPerK = 1), rerankK = 20)
      val rec = recallOf(got, truth)
      info(s"$metric low-slack residual two-phase recall: $rec")
      assert(rec >= 0.75, s"$metric residual two-phase recall too low: $rec")
    }
  }

  test("service-layout mixed tree: per-batch residual models pair by dir; flush batches carry their own") {
    // the service layout puts the clustered build at batch=0 under the
    // generation dir and aligned flushes at batch=N siblings — EVERY
    // pqM>0 batch persists residual codes under ITS OWN `_pqres_model`
    // sidecar (the flush's model trains on the flush's residuals against
    // the serving cells), and serving pairs each segment with the model
    // of the dir it lives in — never across batches
    val rows = clustered(nc = 8, per = 150, d = 16, seed = 67)
    val base = rows.toDF("id", "vec").repartition(4, col("id"))
    val root = java.nio.file.Files.createTempDirectory("graft_resadc_mix").toString
    val p = Ann.Params(metric = "COSINE", maxDegree = 12, beamWidth = 48, pqM = 4)
    Ann.buildIndexClustered(base, s"$root/idx/batch=0", p, nlist = 8)
    val cells = Ann.loadCells(spark, s"$root/idx").get
    val flushRows = clustered(nc = 8, per = 30, d = 16, seed = 67).zipWithIndex
      .map { case ((_, v), i) => (100000L + i, v) }
    Ann.buildIndexAlignedTo(flushRows.toDF("id", "vec"), s"$root/idx/batch=1", p, cells)
    Ann.invalidateSegmentCounts(s"$root/idx")
    // both batches carry residual codes, each with its own sidecar
    val df = spark.read.option("mergeSchema", "true")
      .option("basePath", s"$root/idx").parquet(s"$root/idx")
    assert(df.filter(col("batch") === 0 && col("res_code").isNull).count() === 0)
    assert(df.filter(col("batch") === 1 && col("res_code").isNull).count() === 0,
      "aligned flushes persist residual codes under their own sidecar")
    val tok0 = Ann.buildToken(spark, s"$root/idx")
    val ra = Ann.loadResAdc(spark, s"$root/idx", tok0, rerankK = 10)
    assert(ra.isDefined, "residual models must resolve one level down (service layout)")
    assert(ra.get.modelsB.value.keySet === Set("batch=0", "batch=1"),
      s"one model per batch dir, got ${ra.get.modelsB.value.keySet}")
    // every segment pairs with its OWN dir's model
    val segBatch = df.select(col("seg"), col("batch")).distinct().collect()
      .map(r => (r.getString(0), s"batch=${r.getInt(1)}")).toMap
    val segDir = ra.get.segDirB.value
    segBatch.foreach { case (seg, bdir) =>
      assert(segDir.get(seg).contains(bdir), s"segment $seg paired with ${segDir.get(seg)}, expected $bdir")
    }
    // two-phase search over the MIXED tree works end-to-end (each batch's
    // segments scored under their own residual model, floors shared) AND
    // actually ENGAGES: pre-r13 the global `_pq_model` lookup was
    // root-only, so batch-nested trees silently fell back to the exact
    // beam and never two-phased at all — reranked > 0 proves the
    // compressed branch ran
    val all = rows ++ flushRows
    val queries = (rows.take(10) ++ flushRows.take(5)).toDF("qid", "qvec")
    val truth = KnnExact.knn(all.toDF("id", "vec"), queries, 10, "COSINE")
    val metrics = Ann.newMetrics(spark)
    val got = Ann.searchIndex(spark, s"$root/idx", queries, 10, 64, p,
      rerankK = 20, metrics = Some(metrics))
    assert(recallOf(got, truth) >= 0.85, "mixed-tree two-phase recall")
    assert(metrics.reranked.value > 0L,
      "two-phase must ENGAGE on a batch-nested tree (per-batch global models)")
    // a THIRD batch (another clustered build, its own model) is likewise
    // paired by dir — more models never disable, they compose
    Ann.buildIndexClustered(base.withColumn("id", col("id") + 200000L),
      s"$root/idx/batch=2", p, nlist = 8)
    val ra2 = Ann.loadResAdc(spark, s"$root/idx",
      Ann.buildToken(spark, s"$root/idx"), rerankK = 10)
    assert(ra2.isDefined && ra2.get.modelsB.value.size === 3,
      "per-batch models compose, one per sidecar dir")
  }

  test("repair on a batch-nested tree keeps residual serving on every segment (no global fallback)") {
    // r13 left a gap: repairDeleted rewrote segments to the ROOT of a
    // batch-nested tree, away from their batch dir's `_pqres_model`, so
    // repaired segments silently fell back to global ADC (and the stale
    // source segment dir was never dropped). The rewrite now lands back in
    // the segment's own batch dir: pairing survives by construction.
    val rows = clustered(nc = 8, per = 150, d = 16, seed = 91)
    val base = rows.toDF("id", "vec").repartition(4, col("id"))
    val root = java.nio.file.Files.createTempDirectory("graft_resadc_rep").toString
    val idx = s"$root/idx"
    val p = Ann.Params(metric = "COSINE", maxDegree = 12, beamWidth = 48, pqM = 4)
    Ann.buildIndexClustered(base, s"$idx/batch=0", p, nlist = 8)
    val cells = Ann.loadCells(spark, idx).get
    val flushRows = clustered(nc = 8, per = 40, d = 16, seed = 91).zipWithIndex
      .map { case ((_, v), i) => (100000L + i, v) }
    Ann.buildIndexAlignedTo(flushRows.toDF("id", "vec"), s"$idx/batch=1", p, cells)
    Ann.invalidateSegmentCounts(idx)
    val n0 = spark.read.option("mergeSchema", "true").option("basePath", idx)
      .parquet(idx).count()
    // tombstone rows from BOTH batches so segments rewrite in each dir
    val dels = Seq(3L, 20L, 77L, 100005L, 100011L).toDF("id")
    Ann.repairDeleted(spark, idx, dels, p)
    val df = spark.read.option("mergeSchema", "true").option("basePath", idx)
      .parquet(idx)
    assert(df.count() === n0 - 5, "repair drops exactly the tombstoned rows")
    assert(df.filter(col("node_id").isin(3L, 20L, 77L, 100005L, 100011L)).count() === 0)
    assert(df.filter(col("res_code").isNull).count() === 0,
      "every surviving node keeps its residual code through a nested repair")
    // EVERY segment — repaired ones included — still pairs with its own
    // batch dir's residual model
    val ra = Ann.loadResAdc(spark, idx, Ann.buildToken(spark, idx), rerankK = 10)
    assert(ra.isDefined)
    val segBatch = df.select(col("seg"), col("batch")).distinct().collect()
      .map(r => (r.getString(0), s"batch=${r.getInt(1)}"))
    val segDir = ra.get.segDirB.value
    segBatch.foreach { case (seg, bdir) =>
      assert(segDir.get(seg).contains(bdir),
        s"repaired segment $seg paired with ${segDir.get(seg)}, expected $bdir")
    }
    // and serving still works end-to-end on the repaired tree
    val live = (rows ++ flushRows).filterNot(r => Set(3L, 20L, 77L, 100005L, 100011L)(r._1))
    val queries = live.take(15).toDF("qid", "qvec")
    val truth = KnnExact.knn(live.toDF("id", "vec"), queries, 10, "COSINE")
    val got = Ann.searchIndex(spark, idx, queries, 10, 64, p, rerankK = 20)
    assert(recallOf(got, truth) >= 0.85, "post-repair two-phase recall on nested tree")
  }

  test("residual ADC beats global ADC at zero rerank slack (equal rerankK, routed)") {
    val rows = clustered(nc = 16, per = 200, d = 16, seed = 53)
    val base = rows.toDF("id", "vec").repartition(8, col("id"))
    val root = java.nio.file.Files.createTempDirectory("graft_resadc_ab").toString
    val res = s"$root/res"
    val p = Ann.Params(metric = "COSINE", maxDegree = 12, beamWidth = 48, pqM = 4,
      adcFrontierPerK = 1)
    Ann.buildIndexClustered(base, res, p, nlist = 16)
    // global-twin: the SAME tree minus the `_pqres_model` sidecar — serving
    // then falls back to global-codebook ADC on identical graphs and codes
    val glob = s"$root/glob"
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(res),
      fs, new org.apache.hadoop.fs.Path(glob), false, conf)
    fs.delete(new org.apache.hadoop.fs.Path(s"$glob/_pqres_model"), true)
    val topK = 10
    val queries = rows.take(32).map { case (id, v) => (id, v) }.toDF("qid", "qvec")
    val truth = KnnExact.knn(base, queries, topK, "COSINE", "id", "vec")
    // ef = topK and frontier 1x: the exact-rerank pool IS the top-k — zero
    // oversampling, so recall measures pure two-phase ORDERING quality
    def rec(path: String): Double = recallOf(
      Ann.searchIndex(spark, path, queries, topK, ef = topK, p, rerankK = topK), truth)
    val (rRes, rGlob) = (rec(res), rec(glob))
    info(s"zero-slack two-phase recall: residual $rRes vs global $rGlob")
    assert(rRes >= rGlob,
      s"residual ADC must not lose to global ADC on a clustered tree: $rRes vs $rGlob")
    assert(rRes >= 0.7, s"residual zero-slack recall floor: $rRes")
  }
}
