package graft.tools

import graft.index.Vamana
import graft.operators.{PQ, PQPairScorer}

/** Dev micro (not driver flow): exact-scored vs PQ-scored segment
  * construction ([[Vamana.buildApprox]]) at a production-ish shape —
  * wall-clock and the recall each graph serves under EXACT query-time
  * scoring. args: [n] [dim] [m] [threads]. */
object PqBuildMicro {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 100000
    val dim = if (args.length > 1) args(1).toInt else 128
    val m = if (args.length > 2) args(2).toInt else dim / 8
    val threads = if (args.length > 3) args(3).toInt else 8
    val rnd = new scala.util.Random(13)
    // clustered data (mixture of gaussians), not uniform-random: uniform
    // dim-128 points are nearly equidistant (even the EXACT build serves
    // ~0.33 recall there), while real embeddings have cluster structure —
    // the regime both the graph and PQ are designed for
    val nCenters = 1024
    val centers = Array.fill(nCenters)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    def point(): Array[Float] = {
      val c = centers(rnd.nextInt(nCenters))
      Array.tabulate(dim)(j => c(j) + (rnd.nextFloat() * 2f - 1f) * 0.15f)
    }
    val vs = Array.fill(n)(point())
    println(s"n=$n dim=$dim m=$m threads=$threads kernels=${graft.simd.Kernels.INSTANCE.name}")

    // train on a bounded sample (driver-side contract), encode all rows
    var t0 = System.nanoTime()
    val sample = vs.take(math.min(n, 128000)).map(_.map(_.toDouble))
    val model = {
      val (sizes, offsets) = PQ.subvectorSizes(dim, m)
      graft.operators.PQModel(dim, m, 256, sizes, offsets,
        Array.tabulate(m) { i =>
          val sub = sample.map(v => java.util.Arrays.copyOfRange(v, offsets(i), offsets(i) + sizes(i)))
          PQ.kmeans(sub, math.min(256, sub.length), iters = 6, seed = 1 + i)
        })
    }
    val trainS = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val flat = new Array[Int](n * m)
    java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
      System.arraycopy(model.encodeOne(vs(i).map(_.toDouble)), 0, flat, i * m, m)
    }
    val encodeS = (System.nanoTime() - t0) / 1e9
    println(f"pq train ${trainS}%.1fs encode ${encodeS}%.1fs")

    t0 = System.nanoTime()
    val gExact = new Vamana(vs, "COSINE", 32, 100).build(threads)
    val exactS = (System.nanoTime() - t0) / 1e9

    val sc = new PQPairScorer(model, flat, "COSINE")
    t0 = System.nanoTime()
    val gPq = new Vamana(vs, "COSINE", 32, 100).buildApprox(sc.score, sc.entryNode(), threads)
    val pqS = (System.nanoTime() - t0) / 1e9

    val queries = Array.fill(100)(point())
    def recallOf(g: Vamana): Double = {
      var hits = 0
      queries.foreach { q =>
        val scored = new Array[(Int, Double)](n)
        var i = 0
        while (i < n) { scored(i) = (i, g.sim(q, vs(i))); i += 1 }
        val truth = scored.sortBy { case (i2, s) => (-s, i2) }.take(10).map(_._1).toSet
        hits += g.search(q, 10, 100).map(_._1).toSet.intersect(truth).size
      }
      hits / (queries.length * 10.0)
    }
    println(f"exact build ${exactS}%.1fs recall@10=${recallOf(gExact)}%.4f")
    println(f"pq    build ${pqS}%.1fs recall@10=${recallOf(gPq)}%.4f " +
      f"(+train ${trainS}%.1fs +encode ${encodeS}%.1fs)")
  }
}
