package graft

import graft.index.Vamana

/** Micro-benchmark for single-segment graph construction (mirrors the
  * reference's GraphBuildBench): prints vectors/sec for a few sizes. */
object BuildBench {
  def main(args: Array[String]): Unit = {
    val dim = if (args.nonEmpty) args(0).toInt else 16
    val sizes = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(2000, 10000)
    for (n <- sizes) {
      val rnd = new scala.util.Random(42)
      val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
      val t0 = System.nanoTime()
      val g = new Vamana(vecs, "COSINE", maxDegree = 32, beamWidth = 100).build()
      val sec = (System.nanoTime() - t0) / 1e9
      val q = vecs(0)
      val t1 = System.nanoTime()
      var i = 0
      while (i < 1000) { g.search(vecs(i % n), 10, 64); i += 1 }
      val qsec = (System.nanoTime() - t1) / 1e9
      println(f"n=$n%6d dim=$dim: build $sec%8.2fs (${n / sec}%8.0f vec/s) " +
        f"search ${1000 / qsec}%8.0f q/s visited/query ${g.visitedCount / 1000}%6d")
    }
  }
}
