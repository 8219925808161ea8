package graft

import graft.functions.VectorFunctions
import graft.operators.{BQ, KnnExact, NVQ, PQ}
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans is deterministic and reduces within-cluster distance") {
    val rnd = new scala.util.Random(7)
    val pts = Array.fill(300)(Array.fill(4)(rnd.nextDouble() * 10))
    val c1 = PQ.kmeans(pts, 16, 6, seed = 1)
    val c2 = PQ.kmeans(pts, 16, 6, seed = 1)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)

    def cost(centers: Array[Array[Double]]) = pts.map { p =>
      centers.map(c => c.zip(p).map { case (a, b) => (a - b) * (a - b) }.sum).min
    }.sum
    val seeded = PQ.kmeans(pts, 16, 0, seed = 1) // k-means++ only, no Lloyd's
    assert(cost(c1) < cost(seeded))
  }

  test("PQ roundtrip reconstruction error is bounded and improves with k") {
    val emb = Tables.embeddings(spark, sfDir)
    def avgErr(kk: Int): Double = {
      val model = PQ.train(emb, "embedding", m = 8, k = kk)
      PQ.decode(PQ.encode(emb, "embedding", model), "pq_code", model)
        .select(avg(VectorFunctions.l2Sq(col("embedding"), col("pq_decoded"))))
        .head().getDouble(0)
    }
    val e16 = avgErr(16)
    val e64 = avgErr(64)
    val norm = emb.select(avg(VectorFunctions.normSq(col("embedding")))).head().getDouble(0)
    assert(e64 < e16, s"error should shrink with more clusters: $e64 vs $e16")
    assert(e64 < norm, "reconstruction must beat the zero-vector baseline")
  }

  test("PQ ADC + rerank achieves high recall vs exact kNN") {
    val emb = Tables.embeddings(spark, sfDir)
    // Uniform-random 64-d vectors have no cluster structure (the hardest PQ
    // case), so use finer subspaces (m=16) and 10x overquery to clear the
    // reference's 0.95 recall contract.
    val model = PQ.train(emb, "embedding", m = 16, k = 64)
    val encoded = PQ.encode(emb, "embedding", model)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val approx = PQ.knn(encoded, queries, model, topK = 10, rerankK = 100,
      metric = "COSINE", baseId = "vec_id", baseVec = "embedding")
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val exact = KnnExact.knn(emb, queries, 10, "COSINE", "vec_id", "embedding")
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = exact.map { case (q, want) =>
      approx.get(q).map(got => got.intersect(want).size.toDouble / want.size).getOrElse(0.0)
    }
    val meanRecall = recalls.sum / recalls.size
    // BASELINE.md filtered-search contract is recall@10 > 0.95; ADC+4x rerank
    // on 64-d embeddings should clear it comfortably.
    assert(meanRecall >= 0.95, s"mean recall $meanRecall below 0.95")
  }

  test("PQ ADC recall holds for EUCLIDEAN and DOT metrics too") {
    val emb = Tables.embeddings(spark, sfDir)
    val model = PQ.train(emb, "embedding", m = 16, k = 64)
    val encoded = PQ.encode(emb, "embedding", model)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    for (metric <- Seq("EUCLIDEAN", "DOT_PRODUCT")) {
      val approx = PQ.knn(encoded, queries, model, topK = 10, rerankK = 100,
        metric = metric, baseId = "vec_id", baseVec = "embedding")
        .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val exact = KnnExact.knn(emb, queries, 10, metric, "vec_id", "embedding")
        .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val recalls = exact.map { case (q, w) =>
        approx.get(q).map(_.intersect(w).size.toDouble / w.size).getOrElse(0.0) }
      val r = recalls.sum / recalls.size
      assert(r >= 0.9, s"$metric ADC recall $r < 0.9")
    }
  }

  test("PQ sidecar save/load round-trips the model; refine keeps or improves cost") {
    val emb = Tables.embeddings(spark, sfDir)
    val model = PQ.train(emb, "embedding", m = 8, k = 16)
    val tmp = java.nio.file.Files.createTempDirectory("pq").toString
    PQ.save(spark, model, s"$tmp/pq")
    val loaded = PQ.load(spark, s"$tmp/pq")
    assert(loaded.dim === model.dim && loaded.m === model.m)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)

    def cost(m: graft.operators.PQModel): Double =
      PQ.decode(PQ.encode(emb, "embedding", m), "pq_code", m)
        .select(avg(VectorFunctions.l2Sq(col("embedding"), col("pq_decoded"))))
        .head().getDouble(0)
    val refined = PQ.refine(emb, "embedding", model, lloydsRounds = 2)
    assert(cost(refined) <= cost(model) * 1.001)
  }

  test("PQ.load is committer-naming agnostic: loads data files not named part-*") {
    val emb = Tables.embeddings(spark, sfDir)
    val model = PQ.train(emb, "embedding", m = 4, k = 16)
    val tmp = java.nio.file.Files.createTempDirectory("pqload").toString
    PQ.save(spark, model, s"$tmp/pq")
    // simulate a different committer / post-hoc compaction: rename every
    // part-* data file to a name the old part-* glob would never match
    val dir = new java.io.File(s"$tmp/pq")
    dir.listFiles().filter(f => f.isFile && f.getName.startsWith("part-"))
      .zipWithIndex.foreach { case (f, i) =>
        val crc = new java.io.File(dir, s".${f.getName}.crc")
        if (crc.exists()) crc.delete()
        assert(f.renameTo(new java.io.File(dir, s"data-$i.parquet")))
      }
    val loaded = PQ.load(spark, s"$tmp/pq")
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("anisotropic PQ: lowers the score-aware (parallel-weighted) loss vs isotropic on unit vectors") {
    // The reference documents the anisotropic objective as valid only for
    // unit-normalized points (KMeansPlusPlusClusterer.java:81-84) — and in
    // PQ it is the SUBVECTORS being clustered, so build vectors whose every
    // subvector is unit length. t must satisfy t^2 > 1/subDim for pcm > 1
    // (else the objective degenerates to isotropic).
    val rnd = new scala.util.Random(11)
    val m = 4; val subDim = 8
    val data = (0 until 600).map { i =>
      val v = Array.fill(m * subDim)(rnd.nextGaussian())
      for (s <- 0 until m) {
        var n = 0.0
        for (j <- 0 until subDim) n += v(s * subDim + j) * v(s * subDim + j)
        val inv = 1.0 / math.sqrt(n)
        for (j <- 0 until subDim) v(s * subDim + j) = v(s * subDim + j) * inv
      }
      (i.toLong, v.toSeq)
    }
    val emb = data.toDF("vec_id", "embedding")
    val t = 0.6
    val iso = PQ.train(emb, "embedding", m = m, k = 32, iters = 6)
    val ani = PQ.train(emb, "embedding", m = m, k = 32, iters = 6, anisotropicThreshold = t)
    // determinism of the anisotropic path
    val ani2 = PQ.train(emb, "embedding", m = m, k = 32, iters = 6, anisotropicThreshold = t)
    assert(ani.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      ani2.codebooks.map(_.map(_.toSeq).toSeq).toSeq)

    // ScaNN weighted loss of each model over the sample, summed per subspace
    val rows = emb.select(col("embedding").cast("array<double>")).limit(500).collect()
      .map(_.getSeq[Double](0).toArray)
    def weightedLoss(model: graft.operators.PQModel): Double = {
      val subDim = model.subSizes(0)
      val parallelCost = t * t
      val pcm = math.max(1.0, parallelCost / ((1.0 - parallelCost) / (subDim - 1)))
      rows.map { v =>
        (0 until model.m).map { s =>
          val x = java.util.Arrays.copyOfRange(v, model.subOffsets(s), model.subOffsets(s) + model.subSizes(s))
          val xn = x.map(a => a * a).sum
          model.codebooks(s).map { c =>
            val cx = c.zip(x).map { case (a, b) => a * b }.sum
            val cn = c.map(a => a * a).sum
            val par = { val d = cx - xn; d * d }
            val resid = cn - 2 * cx + xn
            pcm * par + (resid - par)
          }.min
        }.sum
      }.sum
    }
    val li = weightedLoss(iso)
    val la = weightedLoss(ani)
    assert(la < li, s"anisotropic loss $la should beat isotropic $li on its own objective")
  }

  test("NVQ: learned logistic grid beats (or ties) the uniform grid; encode is deterministic") {
    val emb = Tables.embeddings(spark, sfDir)
    val model = NVQ.train(emb, "embedding")
    assert(model.nSubs == 2 && model.sizes.sum == model.mean.length)
    val dec = NVQ.decode(NVQ.encode(emb, "embedding", model), model)
    val nvqErr = dec
      .select(avg(VectorFunctions.l2Sq(col("embedding"), col("nvq_decoded"))))
      .head().getDouble(0)
    // uniform per-subvector baseline on the same mean-centered rows: the
    // learned growth-rate grid includes ~1e-6 (~linear logistic), so NVQ
    // can never do worse than uniform per subvector — the NVQ premise.
    val rows = emb.select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val uniErr = rows.map { v =>
      (0 until model.nSubs).map { s =>
        val sub = Array.tabulate(model.sizes(s))(i =>
          v(model.offsets(s) + i) - model.mean(model.offsets(s) + i))
        NVQ.uniformLoss(sub)
      }.sum
    }.sum / rows.length
    assert(nvqErr <= uniErr * 1.0001, s"nvq $nvqErr should not exceed uniform $uniErr")
    assert(nvqErr > 0.0, "quantization of random 64-d vectors cannot be lossless")
    // determinism (grid search + closed-form quantize: no randomness)
    val c1 = NVQ.encode(emb.limit(20), "embedding", model).select("nvq_code").collect().map(_.getSeq[Int](0))
    val c2 = NVQ.encode(emb.limit(20), "embedding", model).select("nvq_code").collect().map(_.getSeq[Int](0))
    assert(c1.toSeq == c2.toSeq)
  }

  test("balanced sampling: small strata keep proportional-with-floor representation") {
    import spark.implicits._
    val big = (0 until 8000).map(i => ("A", Seq(1.0f, i.toFloat)))
    val small = (0 until 300).map(i => ("B", Seq(2.0f, i.toFloat)))
    val df = (big ++ small).toDF("src", "vec").repartition(4)
    val sample = graft.operators.Sampling.sampleVectorsBalanced(df, "vec", "src",
      cap = 2000, seed = 1L)
    val bCount = sample.count(_.head == 2.0)
    val aCount = sample.count(_.head == 1.0)
    // quota B = max(min(1000, cap/2), proportional) = 1000 > |B| -> all of B
    assert(bCount === 300, s"small stratum must be fully represented, got $bCount")
    // A trimmed to its normalized quota, not the whole population
    assert(aCount <= 1700 && aCount >= 900, s"big stratum quota off: $aCount")
    // uniform sampling for contrast would give B ~ 2000 * 300/8300 ~ 72
  }

  test("NVQ 4-bit: beats its uniform grid, codes in 0..15, strictly coarser than 8-bit") {
    val emb = Tables.embeddings(spark, sfDir)
    val model = NVQ.train(emb, "embedding")
    val enc4 = NVQ.encode(emb, "embedding", model, bits = 4)
    val dec4 = NVQ.uniformErrCol(NVQ.decode(enc4, model, bits = 4), "embedding", model, bits = 4)
    val r4 = dec4.agg(
      avg(VectorFunctions.l2Sq(col("embedding"), col("nvq_decoded"))),
      avg(col("uniform_err")),
      max(array_max(col("nvq_code"))), min(array_min(col("nvq_code")))).head()
    val (nvq4, uni4) = (r4.getDouble(0), r4.getDouble(1))
    assert(nvq4 <= uni4 * 1.0001, s"4-bit nvq $nvq4 should not exceed uniform $uni4")
    assert(r4.getInt(2) <= 15 && r4.getInt(3) >= 0, "4-bit codes out of range")
    val dec8 = NVQ.decode(NVQ.encode(emb, "embedding", model), model)
    val nvq8 = dec8.agg(avg(VectorFunctions.l2Sq(col("embedding"), col("nvq_decoded"))))
      .head().getDouble(0)
    assert(nvq8 <= nvq4 * 1.0001, s"8-bit err $nvq8 should be <= 4-bit err $nvq4")
    assert(nvq4 > nvq8, "4 bits cannot match 8-bit fidelity on random data")
  }

  test("NVQ approx + exact rerank achieves high recall vs exact kNN") {
    val emb = Tables.embeddings(spark, sfDir)
    val model = NVQ.train(emb, "embedding")
    val encoded = NVQ.encode(emb, "embedding", model)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val approx = NVQ.knn(encoded, queries, model, topK = 10, rerankK = 40,
      metric = "COSINE", baseId = "vec_id", baseVec = "embedding")
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val exact = KnnExact.knn(emb, queries, 10, "COSINE", "vec_id", "embedding")
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = exact.map { case (q, want) =>
      approx.get(q).map(got => got.intersect(want).size.toDouble / want.size).getOrElse(0.0)
    }
    val meanRecall = recalls.sum / recalls.size
    // NVQ is an 8-bit/dim encoding (vs PQ's sub-byte codes): with 4x
    // overquery its recall should clear the reference's 0.95 contract.
    assert(meanRecall >= 0.95, s"mean recall $meanRecall below 0.95")
  }

  test("BQ packing matches sign bits and hamming sim is exact") {
    val df = Seq(
      (0L, Seq(1.0f, -1.0f, 0.5f, 0.0f)),
      (1L, Seq(-1.0f, -1.0f, 0.5f, 2.0f))).toDF("id", "v")
    val bits = df.select($"id", BQ.bitsString(BQ.encodePacked($"v", 4), 4).as("b"))
      .as[(Long, String)].collect().toMap
    assert(bits(0L) === "1010") // >0 at idx 0,2 ; 0.0 is not > 0
    assert(bits(1L) === "0011")
    val sim = df.filter($"id" === 0).select(BQ.encodePacked($"v", 4).as("a"))
      .crossJoin(df.filter($"id" === 1).select(BQ.encodePacked($"v", 4).as("b")))
      .select(BQ.sim($"a", $"b", 4)).head().getDouble(0)
    assert(sim === 1.0 - 2.0 / 4.0) // bits differ at idx 0 and 3
  }

  test("AdcLookupSumExpr is bit-identical to the HOF lookup-sum it replaced") {
    import org.apache.spark.sql.functions._
    val kk = 16
    val m = 6
    val rnd = new scala.util.Random(5)
    val rows = (0 until 200).map { i =>
      (i.toLong,
        Array.fill(m * kk)(rnd.nextDouble() * 2 - 1).toSeq,
        Array.fill(m)(rnd.nextInt(kk)).toSeq)
    }
    val df = rows.toDF("id", "table", "codes")
    val codeIdx = sequence(lit(0), lit(m - 1))
    // the exact pre-r6 composition from PQ.adcApproxScore
    val hof = aggregate(
      transform(codeIdx, i => element_at(col("table"), i * kk + element_at(col("codes"), i + 1) + 1)),
      lit(0.0), (acc, x) => acc + x)
    val native = graft.functions.VectorExpressions.adcLookupSum(col("table"), col("codes"), kk)
    val diff = df.select((hof - native).as("d")).filter(col("d") =!= 0.0).count()
    assert(diff === 0L, "codegen ADC lookup-sum must be bit-identical to the HOF composition")
    // and to a driver-side reference
    val got = df.select(col("id"), native.as("s")).as[(Long, Double)].collect().toMap
    rows.foreach { case (id, table, codes) =>
      val want = codes.zipWithIndex.map { case (c, i) => table(i * kk + c) }.sum
      assert(got(id) === want, s"row $id")
    }
  }

  test("BQ packs >64 dims into multiple words") {
    val v = (0 until 100).map(i => if (i % 3 == 0) 1.0f else -1.0f)
    val bits = Seq(Tuple1(v)).toDF("v")
      .select(BQ.bitsString(BQ.encodePacked($"v", 100), 100)).head().getString(0)
    assert(bits.length === 100)
    assert(bits === (0 until 100).map(i => if (i % 3 == 0) '1' else '0').mkString)
  }
}
