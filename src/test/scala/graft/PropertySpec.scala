package graft

import graft.index.{LongHeap, Vamana}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5 carry-over: the reference uses seeded
  * randomized testing; here ScalaCheck over the pure kernels). Each
  * property runs with a fixed seed for reproducibility. */
class PropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(p: Prop, name: String): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name failed: ${r.status}")
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(2, 32).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray))

  private val vecPairGen: Gen[(Array[Float], Array[Float])] =
    Gen.chooseNum(2, 32).flatMap { d =>
      for {
        a <- Gen.listOfN(d, Gen.chooseNum(-10.0f, 10.0f))
        b <- Gen.listOfN(d, Gen.chooseNum(-10.0f, 10.0f))
      } yield (a.toArray, b.toArray)
    }

  test("similarity formulas: bounded in (0,1], bit-exact symmetric, self-similarity maximal") {
    for (metric <- Seq("EUCLIDEAN", "DOT_PRODUCT", "COSINE")) {
      check(Prop.forAll(vecPairGen) { case (a, b) =>
        val s = Vamana.similarity(metric, a, b)
        val bounded = metric match {
          case "DOT_PRODUCT" => !s.isNaN // dot is unbounded pre-normalization
          case _ => s > 0.0 && s <= 1.0
        }
        // symmetric per-element ops in identical order => bit-exact symmetry
        bounded && s == Vamana.similarity(metric, b, a)
      }, s"$metric bounds/symmetry")
      if (metric != "DOT_PRODUCT")
        check(Prop.forAll(vecGen.suchThat(_.exists(_ != 0.0f))) { a =>
          val self = Vamana.similarity(metric, a, a)
          // self-sim is the formula's maximum: 1.0 for both EUCLIDEAN (d=0)
          // and COSINE ((1+1)/2), up to fp rounding in the cosine norm
          math.abs(self - 1.0) < 1e-9
        }, s"$metric self-similarity")
    }
  }

  test("LongHeap packing: lossless id, float-faithful score, order-preserving") {
    val pairGen = for {
      s <- Gen.chooseNum(0.0, 1.0)
      i <- Gen.chooseNum(0, Int.MaxValue - 1)
    } yield (s, i)
    check(Prop.forAll(pairGen) { case (s, i) =>
      val p = LongHeap.pack(s, i)
      LongHeap.id(p) == i && LongHeap.score(p) == s.toFloat
    }, "pack roundtrip")
    check(Prop.forAll(pairGen, pairGen) { case ((s1, i1), (s2, i2)) =>
      // strictly higher float score => strictly greater packed value
      // (the heap's score-desc, id-asc contract rides on this)
      if (s1.toFloat < s2.toFloat) LongHeap.pack(s1, i1) < LongHeap.pack(s2, i2)
      else if (s1.toFloat > s2.toFloat) LongHeap.pack(s1, i1) > LongHeap.pack(s2, i2)
      else true
    }, "pack order")
  }

  test("graph build invariants: degree bound holds, all nodes reachable results") {
    // smaller counts here: each sample builds a graph
    val smallParams = params.withMinSuccessfulTests(15)
    val g = for {
      n <- Gen.chooseNum(5, 120)
      seed <- Gen.chooseNum(0L, 1000L)
    } yield (n, seed)
    val p = Prop.forAll(g) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val vecs = Array.fill(n)(Array.fill(8)(rnd.nextFloat() * 2 - 1))
      val graph = new Vamana(vecs, "COSINE", maxDegree = 8, beamWidth = 32, seed = seed).build()
      val degreesOk = (0 until n).forall(i => graph.neighbors(i).length <= 8)
      val res = graph.search(vecs(0), math.min(5, n), 32)
      degreesOk && res.nonEmpty && res.head._1 == 0 // self is its own nearest
    }
    val r = SCTest.check(smallParams, p)
    assert(r.passed, s"graph invariants failed: ${r.status}")
  }

  test("MMR greedy selection: every pick is the argmax of the MMR objective (from-scratch oracle)") {
    // the impl maintains maxSim incrementally; the oracle recomputes each
    // step's objective from scratch over the full picked set
    val candGen: Gen[(List[(Long, Double, Array[Float])], Double, Int)] = for {
      d <- Gen.chooseNum(2, 8)
      n <- Gen.chooseNum(1, 20)
      cands <- Gen.listOfN(n, for {
        id <- Gen.chooseNum(0L, 50L)
        rel <- Gen.chooseNum(0.0, 1.0)
        v <- Gen.listOfN(d, Gen.chooseNum(-5.0f, 5.0f))
      } yield (id, rel, v.toArray))
      lambda <- Gen.oneOf(0.0, 0.3, 0.5, 0.8, 1.0)
      k <- Gen.chooseNum(1, 25)
    } yield (cands.distinctBy(_._1), lambda, k)

    check(Prop.forAll(candGen) { case (cands0, lambda, k) =>
      // zero-norm vectors make COSINE NaN — outside the engine's contract
      // (same precondition as every scoring path); shrinking can produce
      // them regardless of the generator's ranges
      val cands = cands0.filter(c => c._3.exists(x => math.abs(x) > 1e-3))
      val arr = cands.toArray
      val got = graft.operators.Hybrid.mmrSelect(arr, lambda, k, "COSINE")
      val sorted = arr.sortBy(t => (-t._2, t._1))
      // oracle: replay greedily, recomputing max-sim-to-picked from scratch
      var picked = Vector.empty[(Long, Array[Float])]
      val okSteps = got.forall { case (rank, nid, score) =>
        val remaining = sorted.filterNot(c => picked.exists(_._1 == c._1))
        val objective = remaining.map { c =>
          val pen = if (picked.isEmpty) 0.0
            else picked.map(p => Vamana.similarity("COSINE", c._3, p._2)).max
          (c._1, lambda * c._2 - (1.0 - lambda) * pen)
        }
        val bestVal = objective.map(_._2).max
        // first-max-wins over the (rel desc, id asc) scan order
        val expect = objective.find(_._2 == bestVal).get
        val ok = rank == picked.size + 1 && nid == expect._1 &&
          math.abs(score - bestVal) < 1e-12
        picked = picked :+ ((nid, sorted.find(_._1 == nid).get._3))
        ok
      }
      okSteps && got.length == math.min(k, arr.length) &&
        got.map(_._2).distinct.length == got.length
    }, "mmr argmax oracle")
  }

  test("NVQ/SQ8 quantization: roundtrip error bounded by the value range") {
    val subGen = Gen.chooseNum(4, 32).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-5.0, 5.0)).map(_.toArray))
    check(Prop.forAll(subGen) { v =>
      val gr = graft.operators.NVQ.learnGrowthRate(v)
      val codes = graft.operators.NVQ.quantizeSub(v, gr)
      val dec = graft.operators.NVQ.dequantizeSub(codes, gr, v.min, v.max)
      val range = v.max - v.min
      codes.forall(c => c >= 0 && c <= 255) &&
        v.indices.forall(i => math.abs(v(i) - dec(i)) <= math.max(range / 8.0, 1e-9))
    }, "nvq roundtrip")
  }
}
