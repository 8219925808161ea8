package graft

import graft.index.Vamana

/** Micro-benchmark for single-segment graph construction (mirrors the
  * reference's GraphBuildBench): prints vectors/sec for a few sizes,
  * sequential vs the prefix-doubling parallel schedule.
  * args: [dim] [threads] [sizes...] */
object BuildBench {
  def main(args: Array[String]): Unit = {
    val dim = if (args.nonEmpty) args(0).toInt else 16
    val threads = if (args.length > 1) args(1).toInt else Runtime.getRuntime.availableProcessors() / 2
    val sizes = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(2000, 10000)
    for (n <- sizes; t <- Seq(1, threads).distinct) {
      val rnd = new scala.util.Random(42)
      val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
      val t0 = System.nanoTime()
      val g = new Vamana(vecs, "COSINE", maxDegree = 32, beamWidth = 100).build(t)
      val sec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      var i = 0
      while (i < 1000) { g.search(vecs(i % n), 10, 64); i += 1 }
      val qsec = (System.nanoTime() - t1) / 1e9
      println(f"n=$n%6d dim=$dim threads=$t%2d: build $sec%8.2fs (${n / sec}%8.0f vec/s) " +
        f"search ${1000 / qsec}%8.0f q/s visited/query ${g.visitedCount / 1000}%6d")
    }
  }
}
