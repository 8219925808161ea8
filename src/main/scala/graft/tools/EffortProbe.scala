package graft.tools

import graft.index.{Ann, Vamana}

/** Dev probe for the reference's low-cardinality search-effort contract
  * (`TestLowCardinalityFiltering.java:55,104-106`): 10k x 16d random
  * vectors, two ~even classes, M=32 / beamWidth=64 build, topK=10 search.
  * Prints mean visited/expanded ratios + recall at several beam sizes for
  * the unfiltered and class-filtered searches — driver-side, one segment.
  * Usage: EffortProbe [ef ...] */
object EffortProbe {
  def main(args: Array[String]): Unit = {
    val efs = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 16, 24, 32)
    val n = 10000; val d = 16; val nq = 100; val topK = 10
    val rnd = new java.util.Random(42)
    def vec(): Array[Float] = Array.fill(d)(rnd.nextFloat() * 2 - 1)
    val vecs = Array.fill(n)(vec())
    val cls = Array.fill(n)(rnd.nextBoolean())
    val queries = Array.fill(nq)((vec(), rnd.nextBoolean()))

    val t0 = System.nanoTime()
    val g = new Vamana(vecs, "COSINE", maxDegree = 32, beamWidth = 64).build(8)
    println(f"build ${(System.nanoTime() - t0) / 1e9}%.1fs")

    def exact(q: Array[Float], accept: Int => Boolean): Set[Int] = {
      val sc = g.exactScorer(q)
      (0 until n).filter(accept).map(i => (i, sc(i)))
        .sortBy { case (id, s) => (-s, id) }.take(topK).map(_._1).toSet
    }
    for (ef <- efs; filtered <- Seq(false, true)) {
      var vis = 0L; var exp = 0L; var hits = 0; var want = 0
      for ((q, qc) <- queries) {
        val accept: Int => Boolean = if (filtered) i => cls(i) == qc else _ => true
        val vc = new Vamana.VisitCounter
        val got = g.search(q, topK, ef, accept, vc).map(_._1).toSet
        vis += vc.n; exp += vc.expanded
        val ex = exact(q, accept)
        hits += got.intersect(ex).size; want += ex.size
      }
      println(f"ef=$ef%-3d filtered=$filtered%-5s visited=${vis.toDouble / (n.toLong * nq)}%.4f " +
        f"expanded=${exp.toDouble / (n.toLong * nq)}%.4f recall=${hits.toDouble / want}%.4f")
    }
  }
}
