package graft.tools

import graft.index.Vamana
import graft.operators.{PQ, ResidualPQPairScorer}

/** Residual-construction granularity curve at the mseg PER-CELL shape
  * (one 4M/64 cell: n=65536, dim=64, sigma=1 around a far centroid —
  * the adversarial isotropic regime where r12's 4M measurement put
  * residual-pqBuild at 0.62 vs 0.81 exact routed recall_abs): how much
  * recall does each construction-code granularity buy, at what build
  * cost? Informs the max(pqM, dim/4) default.
  *
  * Run: sbt "runMain graft.tools.ResGranMicro [n] [dim] [degree] [beam]"
  * (defaults 65536 64 32 64)
  */
object ResGranMicro {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(65536)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val degree = args.lift(2).map(_.toInt).getOrElse(32)
    val beam = args.lift(3).map(_.toInt).getOrElse(64)
    val rnd = new java.util.Random(9)
    val cent = Array.fill(dim)(rnd.nextGaussian() * 2.0)
    val vs = Array.fill(n)(Array.tabulate(dim)(j => (cent(j) + rnd.nextGaussian()).toFloat))
    val queries = Array.fill(100)(Array.tabulate(dim)(j => (cent(j) + rnd.nextGaussian()).toFloat))
    println(s"n=$n dim=$dim degree=$degree beam=$beam kernels=${graft.simd.Kernels.INSTANCE.name}")

    def recallOf(g: Vamana): Double = {
      var hits = 0
      queries.foreach { q =>
        val truth = vs.indices.map(i => (i, g.sim(q, vs(i))))
          .sortBy { case (i, s) => (-s, i) }.take(10).map(_._1).toSet
        hits += g.search(q, 10, 64).map(_._1).toSet.intersect(truth).size
      }
      hits / (queries.length * 10.0)
    }

    locally {
      val t0 = System.nanoTime()
      val g = new Vamana(vs, "COSINE", degree, beam).build(1)
      println(f"exact        build=${(System.nanoTime() - t0) / 1e9}%6.1fs recall@10=${recallOf(g)}%.4f")
    }
    val res = vs.map(v => Array.tabulate(dim)(j => v(j).toDouble - cent(j)))
    for (m <- Seq(8, 16, 32)) {
      val t0 = System.nanoTime()
      val (sizes, offsets) = PQ.subvectorSizes(dim, m)
      val model = graft.operators.PQModel(dim, m, 256, sizes, offsets,
        Array.tabulate(m) { i =>
          val sub = res.take(math.min(n, 128000))
            .map(v => java.util.Arrays.copyOfRange(v, offsets(i), offsets(i) + sizes(i)))
          PQ.kmeans(sub, math.min(256, sub.length), iters = 6, seed = 1 + i)
        })
      val flat = new Array[Int](n * m)
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        System.arraycopy(model.encodeOne(res(i)), 0, flat, i * m, m)
      }
      val prepS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val sc = new ResidualPQPairScorer(model, flat, "COSINE", cent)
      val g = new Vamana(vs, "COSINE", degree, beam).buildApprox(sc.score, sc.entryNode(), 1)
      val buildS = (System.nanoTime() - t1) / 1e9
      println(f"residual m=$m%-3d build=$buildS%6.1fs (+train/encode $prepS%5.1fs) recall@10=${recallOf(g)}%.4f")
    }
  }
}
