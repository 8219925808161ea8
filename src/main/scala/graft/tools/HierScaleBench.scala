package graft.tools

import graft.index.Vamana

/** Validates the persisted multi-layer hierarchy at production segment
  * scale (the r4/r5 "done" bar that was never run): build one LARGE
  * segment, round-trip its hierarchy through the persistence seam
  * ([[Vamana.upperAdjacencyOf]] -> [[Vamana.restoreUpperAdjacency]], the
  * exact path `Ann.assembleSegment` runs on segment assembly), and compare
  * search effort/QPS with the restored hierarchy vs a cold-entry shell of
  * the SAME layer-0 graph. Reports visited/query, QPS and recall@10 for
  * both — the hierarchy pays off iff visited drops at equal recall
  * (reference contract: the v6 format serializes all layers so the
  * searcher descends instead of beam-walking from a fixed entry,
  * `OnDiskGraphIndex.java:68-162`).
  *
  * Usage: HierScaleBench [n] [dim] [nQueries] [buildThreads]
  */
object HierScaleBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000000
    val dim = if (args.length > 1) args(1).toInt else 32
    val nQ = if (args.length > 2) args(2).toInt else 200
    val threads = if (args.length > 3) args(3).toInt else 1
    val ef = 64
    val topK = 10
    val rnd = new scala.util.Random(17)
    val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val queries = Array.fill(nQ)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))

    val t0 = System.nanoTime()
    val g = new Vamana(vecs, "COSINE", 32, 100).build(threads)
    println(f"### built n=$n dim=$dim threads=$threads in ${(System.nanoTime() - t0) / 1e9}%.1fs " +
      s"(kernels=${graft.simd.Kernels.INSTANCE.name})")

    // Round-trip through the persistence seam into two fresh shells that
    // share layer-0 adjacency + entry: one restores the hierarchy rows
    // (what searchIndex assembles from upper_nbrs), one stays cold-entry
    // (what a pre-r5 tree or a stripped column yields).
    def shell(restoreHier: Boolean): Vamana = {
      val s = new Vamana(vecs, "COSINE", 32, 100)
      var i = 0
      while (i < n) {
        s.neighbors(i) ++= g.neighbors(i)
        if (restoreHier) {
          val adj = g.upperAdjacencyOf(i)
          if (adj != null) s.restoreUpperAdjacency(i, adj)
        }
        i += 1
      }
      s.entryNode = g.entryNode
      s
    }
    val warm = shell(restoreHier = true)
    val cold = shell(restoreHier = false)

    // exact truth for recall (brute force, double-checked scoring)
    val truth: Array[Set[Int]] = queries.map { q =>
      val scored = new Array[(Int, Double)](n)
      var i = 0
      while (i < n) { scored(i) = (i, g.sim(q, vecs(i))); i += 1 }
      scored.sortBy { case (id, s) => (-s, id) }.take(topK).map(_._1).toSet
    }

    def measure(s: Vamana, label: String): Unit = {
      // warmup
      queries.take(20).foreach(q => s.search(q, topK, ef))
      val vc = new Vamana.VisitCounter
      var rec = 0.0
      val w0 = System.nanoTime()
      queries.zipWithIndex.foreach { case (q, qi) =>
        val got = s.search(q, topK, ef, vc = vc)
        rec += got.map(_._1).toSet.intersect(truth(qi)).size.toDouble / topK
      }
      val sec = (System.nanoTime() - w0) / 1e9
      println(f"### $label%-10s visited/q=${vc.n.toDouble / nQ}%.0f qps=${nQ / sec}%.0f " +
        f"recall@10=${rec / nQ}%.4f visited_ratio=${vc.n.toDouble / nQ / n}%.5f")
    }
    measure(warm, "hierarchy")
    measure(cold, "cold-entry")
  }
}
