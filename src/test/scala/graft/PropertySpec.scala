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
