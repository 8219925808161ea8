package graft

import graft.index.Vamana
import graft.operators.{PQ, PQPairScorer}
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-scored (PQ) graph construction — the reference's default
  * build mode (default.yml construction compression: PQ;
  * BuildScoreProvider.pqBuildScoreProvider). Contracts: the code-pair
  * scorer equals similarity of decoded vectors; builds are deterministic;
  * a PQ-built graph searched with EXACT scores still clears the recall
  * bar; and construction touches no full-res vectors (scorer-only). */
class PqBuildSpec extends AnyFunSuite {

  private def vecs(n: Int, dim: Int, seed: Int): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  private def trainEncode(vs: Array[Array[Float]], m: Int): (graft.operators.PQModel, Array[Int]) = {
    val spark = SparkSpec.spark
    import spark.implicits._
    val df = vs.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v.toSeq) }.toDF("id", "vec")
    val model = PQ.train(df, "vec", m = m, iters = 4)
    val codes = vs.map(v => model.encodeOne(v.map(_.toDouble)))
    val flat = new Array[Int](vs.length * m)
    codes.zipWithIndex.foreach { case (c, i) => System.arraycopy(c, 0, flat, i * m, m) }
    (model, flat)
  }

  test("PQPairScorer.score == similarity of decoded vectors (all metrics)") {
    val vs = vecs(300, 16, 5)
    val (model, flat) = trainEncode(vs, m = 4)
    val rnd = new scala.util.Random(9)
    for (metric <- Seq("COSINE", "DOT_PRODUCT", "EUCLIDEAN")) {
      val sc = new PQPairScorer(model, flat, metric)
      (0 until 50).foreach { _ =>
        val a = rnd.nextInt(vs.length)
        val b = rnd.nextInt(vs.length)
        val da = model.decode(flat.slice(a * 4, a * 4 + 4)).map(_.toFloat)
        val db = model.decode(flat.slice(b * 4, b * 4 + 4)).map(_.toFloat)
        // da/db round through float32, the scorer stays in double — the
        // difference is float32 rounding of the decoded values, not logic
        val want = Vamana.similarity(metric, da, db)
        assert(math.abs(sc.score(a, b) - want) < 1e-5, s"$metric ($a,$b)")
      }
    }
  }

  test("PQ-scored build: deterministic, degree-bounded, recall holds under exact search") {
    val n = 8000
    val vs = vecs(n, 16, seed = 42)
    val (model, flat) = trainEncode(vs, m = 4)
    val sc = new PQPairScorer(model, flat, "COSINE")
    val entry = sc.entryNode()

    def buildOnce(threads: Int): Vamana =
      new Vamana(vs, "COSINE", maxDegree = 32, beamWidth = 100).buildApprox(sc.score, entry, threads)

    val g = buildOnce(1)
    assert(g.neighbors.forall(_.size <= (32 * 1.2).toInt), "degree bound")

    // recall@10 with EXACT query-time scoring over the PQ-built graph —
    // what a user gets: compressed build, full-res search
    val queries = vecs(100, 16, seed = 7)
    var hits = 0
    queries.foreach { q =>
      val truth = vs.indices.map(i => (i, g.sim(q, vs(i))))
        .sortBy { case (i, s) => (-s, i) }.take(10).map(_._1).toSet
      val got = g.search(q, 10, 100).map(_._1).toSet
      hits += got.intersect(truth).size
    }
    val recall = hits / 1000.0
    assert(recall >= 0.9, s"recall@10 over PQ-built graph too low: $recall")

    // deterministic: rebuilds match edge-for-edge at the same thread count
    // (the parallel schedule differs from sequential insertion by design —
    // its contract is recall parity, same as ParallelBuildSpec's for the
    // exact build)
    val g2 = buildOnce(1)
    assert(g.neighbors.zip(g2.neighbors).forall { case (a, b) => a == b }, "seq determinism")
    assert(g.entryNode === g2.entryNode)
    val gp = buildOnce(4)
    val gp2 = buildOnce(4)
    assert(gp.neighbors.zip(gp2.neighbors).forall { case (a, b) => a == b },
      "parallel approx build deterministic across runs")
    var hitsP = 0
    queries.foreach { q =>
      val truth = vs.indices.map(i => (i, gp.sim(q, vs(i))))
        .sortBy { case (i, s) => (-s, i) }.take(10).map(_._1).toSet
      hitsP += gp.search(q, 10, 100).map(_._1).toSet.intersect(truth).size
    }
    assert(hitsP / 1000.0 >= recall - 0.05,
      s"parallel PQ-build recall ${hitsP / 1000.0} vs sequential $recall")
  }

  test("BQ (hamming) scored build: the other reference build-compression mode") {
    val n = 5000
    val dim = 64 // BQ needs dimension for signal: 1 bit/dim
    val vs = vecs(n, dim, seed = 21)
    val sc = graft.operators.BQPairScorer(vs)
    // scorer sanity: self-similarity 1, symmetric, in [0,1]
    assert(sc.score(7, 7) === 1.0)
    assert(sc.score(3, 9) === sc.score(9, 3))
    assert(sc.score(3, 9) >= 0.0 && sc.score(3, 9) <= 1.0)
    val g = new Vamana(vs, "COSINE", maxDegree = 32, beamWidth = 100)
      .buildApprox(sc.score, sc.entryNode(), threads = 1)
    assert(g.neighbors.forall(_.size <= (32 * 1.2).toInt))
    val queries = vecs(50, dim, seed = 22)
    var hits = 0
    queries.foreach { q =>
      val truth = vs.indices.map(i => (i, g.sim(q, vs(i))))
        .sortBy { case (i, s) => (-s, i) }.take(10).map(_._1).toSet
      hits += g.search(q, 10, 100).map(_._1).toSet.intersect(truth).size
    }
    val recall = hits / 500.0
    // coarser than PQ by design (1 bit/dim); bar reflects measured margin
    assert(recall >= 0.8, s"recall@10 over BQ-built graph too low: $recall")
  }

  test("buildApprox never consults full-res vectors during construction") {
    val n = 2000
    val vs = vecs(n, 16, seed = 3)
    val (model, flat) = trainEncode(vs, m = 4)
    val sc = new PQPairScorer(model, flat, "COSINE")
    // poison pill: hand the builder vectors it must not read. Scoring any
    // poisoned vector yields NaN, which would propagate into edge scores
    // and break the degree/recall assertions below.
    val poisoned = Array.fill(n)(Array.fill(16)(Float.NaN))
    val g = new Vamana(poisoned, "COSINE", maxDegree = 16, beamWidth = 64)
      .buildApprox(sc.score, sc.entryNode(), threads = 1)
    assert(g.neighbors.count(_.nonEmpty) === n, "graph must be fully connected from codes alone")
    // post-build, exact kernels resume: searching the poisoned shell with a
    // real query produces NaN scores — proving vectors were only needed at
    // search time, not build time
    val restored = new Vamana(vs, "COSINE", maxDegree = 16, beamWidth = 64)
    for (i <- 0 until n) restored.neighbors(i) ++= g.neighbors(i)
    restored.entryNode = g.entryNode
    val q = vecs(1, 16, 11).head
    val got = restored.search(q, 10, 64).map(_._1).toSet
    val truth = vs.indices.map(i => (i, restored.sim(q, vs(i))))
      .sortBy { case (i, s) => (-s, i) }.take(10).map(_._1).toSet
    assert(got.intersect(truth).size >= 8, "restored shell over the code-built graph must search well")
  }

  /** One tight k-means-style cell far from the origin: the clustered-build
    * regime where a globally-trained codebook collapses (NOTES_r11 §2b). */
  private def cellVecs(n: Int, dim: Int, seed: Int): (Array[Array[Float]], Array[Double]) = {
    val rnd = new scala.util.Random(seed)
    val cent = Array.fill(dim)(rnd.nextGaussian() * 4.0)
    val vs = Array.fill(n)(Array.tabulate(dim)(j => (cent(j) + rnd.nextGaussian() * 0.3).toFloat))
    (vs, cent)
  }

  private def residualTrainEncode(vs: Array[Array[Float]], cent: Array[Double], m: Int)
      : (graft.operators.PQModel, Array[Int]) = {
    val spark = SparkSpec.spark
    import spark.implicits._
    val res = vs.map(v => Array.tabulate(v.length)(j => v(j).toDouble - cent(j)))
    val df = res.zipWithIndex.toSeq.map { case (r, i) => (i.toLong, r.toSeq) }.toDF("id", "res")
    val model = PQ.train(df, "res", m = m, iters = 4)
    val flat = new Array[Int](vs.length * m)
    res.zipWithIndex.foreach { case (r, i) =>
      System.arraycopy(model.encodeOne(r), 0, flat, i * m, m)
    }
    (model, flat)
  }

  test("ResidualPQPairScorer.score == similarity of reconstructed vectors (all metrics)") {
    val (vs, cent) = cellVecs(300, 16, seed = 31)
    val (model, flat) = residualTrainEncode(vs, cent, m = 4)
    val rnd = new scala.util.Random(17)
    for (metric <- Seq("COSINE", "DOT_PRODUCT", "EUCLIDEAN")) {
      val sc = new graft.operators.ResidualPQPairScorer(model, flat, metric, cent)
      (0 until 50).foreach { _ =>
        val a = rnd.nextInt(vs.length)
        val b = rnd.nextInt(vs.length)
        def recon(i: Int): Array[Float] = {
          val r = model.decode(flat.slice(i * 4, i * 4 + 4))
          Array.tabulate(16)(j => (cent(j) + r(j)).toFloat)
        }
        val want = Vamana.similarity(metric, recon(a), recon(b))
        assert(math.abs(sc.score(a, b) - want) < 1e-4, s"$metric ($a,$b)")
      }
    }
  }

  test("residual-scored build restores within-cell recall a global codebook loses") {
    val n = 4000
    val dim = 32
    val (vs, cent) = cellVecs(n, dim, seed = 8)
    // global model trained on WIDE data (the full corpus a clustered build
    // would see): many cells' worth of spread, so within THIS tight cell
    // its codes barely discriminate
    val spark = SparkSpec.spark
    import spark.implicits._
    val wideRnd = new scala.util.Random(77)
    val wide = Array.fill(8000)(Array.fill(dim)((wideRnd.nextGaussian() * 4.0).toFloat))
    val wideDf = wide.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v.toSeq) }.toDF("id", "vec")
    val globalModel = PQ.train(wideDf, "vec", m = 8, iters = 4)
    val globalFlat = new Array[Int](n * 8)
    vs.zipWithIndex.foreach { case (v, i) =>
      System.arraycopy(globalModel.encodeOne(v.map(_.toDouble)), 0, globalFlat, i * 8, 8)
    }
    val (resModel, resFlat) = residualTrainEncode(vs, cent, m = 16)

    def recallOf(g: Vamana): Double = {
      val queries = {
        val rnd = new scala.util.Random(5)
        Array.fill(60)(Array.tabulate(dim)(j => (cent(j) + rnd.nextGaussian() * 0.3).toFloat))
      }
      var hits = 0
      queries.foreach { q =>
        val truth = vs.indices.map(i => (i, g.sim(q, vs(i))))
          .sortBy { case (i, s) => (-s, i) }.take(10).map(_._1).toSet
        hits += g.search(q, 10, 64).map(_._1).toSet.intersect(truth).size
      }
      hits / 600.0
    }
    val gExact = new Vamana(vs, "COSINE", 16, 64).build(1)
    val scG = new PQPairScorer(globalModel, globalFlat, "COSINE")
    val gGlobal = new Vamana(vs, "COSINE", 16, 64).buildApprox(scG.score, scG.entryNode(), 1)
    val scR = new graft.operators.ResidualPQPairScorer(resModel, resFlat, "COSINE", cent)
    val gRes = new Vamana(vs, "COSINE", 16, 64).buildApprox(scR.score, scR.entryNode(), 1)
    val (rExact, rGlobal, rRes) = (recallOf(gExact), recallOf(gGlobal), recallOf(gRes))
    info(f"recall exact=$rExact%.3f globalPQ=$rGlobal%.3f residualPQ=$rRes%.3f")
    assert(rRes >= rExact - 0.05,
      f"residual-scored build must be within 0.05 of exact-scored: $rRes%.3f vs $rExact%.3f")
    assert(rRes > rGlobal + 0.1,
      f"residual codes must clearly beat global codes within a tight cell: $rRes%.3f vs $rGlobal%.3f")
  }

  test("pqBuild flows through clustered build AND aligned flush with residual scoring") {
    import graft.index.Ann
    val spark = SparkSpec.spark
    import spark.implicits._
    val nClusters = 8; val d = 16
    val rnd = new scala.util.Random(19)
    val centers = Array.fill(nClusters)(Array.fill(d)(rnd.nextGaussian().toFloat * 2))
    def mkRows(ids: Range) = ids.map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Array.tabulate(d)(j => centers(i % nClusters)(j) + r.nextGaussian().toFloat).toSeq)
    }
    val baseRows = mkRows(0 until 2400)
    val base = baseRows.toDF("id", "vec")
      .repartition(4, org.apache.spark.sql.functions.col("id"))
    val p = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64,
      pqM = 4, pqBuild = true)
    val tmp = java.nio.file.Files.createTempDirectory("pqresflush").toString
    // service-shaped layout: the clustered build is batch=0 under the
    // root, flushes append batch=N siblings (one uniform partitioned tree)
    Ann.buildIndexClustered(base, s"$tmp/idx/batch=0", p, nlist = nClusters)
    // aligned flush: new rows built against the SERVING tree's cells, with
    // pqBuild on — must route through the residual construction, not the
    // global-code path (which collapses within tight cells)
    val cells = Ann.loadCells(spark, s"$tmp/idx").get
    val flushRows = mkRows(10000 until 11200)
    val drift = Ann.buildIndexAlignedTo(flushRows.toDF("id", "vec"),
      s"$tmp/idx/batch=1", p, cells)
    assert(drift < 2.0, s"same-distribution flush must not register drift ($drift)")
    Ann.invalidateSegmentCounts(s"$tmp/idx")
    // search the combined tree: every flushed row must be findable by its
    // own vector (self-recall over the pqBuild-constructed flush segments)
    val all = baseRows ++ flushRows
    val queries = flushRows.take(30).toDF("qid", "qvec")
    val got = Ann.searchIndex(spark, s"$tmp/idx", queries, 10, 64, p)
    val want = graft.operators.KnnExact.knn(all.toDF("id", "vec"), queries, 10, "COSINE")
    val hit = got.select("qid", "nid")
      .join(want.select("qid", "nid"), Seq("qid", "nid"), "left_semi").count()
    val rec = hit.toDouble / want.count()
    assert(rec >= 0.85, f"aligned pqBuild flush recall $rec%.3f < 0.85")
  }
}
