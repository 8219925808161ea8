package graft.tools

import graft.index.Vamana

/** Phase split of one segment's Vamana build at the mseg per-cell shape
  * (verdict r12 task #3: where does the 4M x 64 clustered build's time
  * go?): insert beams vs the refine pass vs hierarchy, plus a refine-beam
  * sweep — the refine pass re-searches EVERY node against the finished
  * graph at full `beamWidth`, so capping its beam is the candidate lever.
  * Recall@10 (exact search, ef=64) is reported per variant so a cheaper
  * build that loses quality is visible in the same table.
  *
  * Run: sbt "runMain graft.tools.BuildPhaseMicro [n] [dim] [degree] [beam]"
  * (defaults 65536 64 32 64 — one 4M/64 cell at mseg bench params)
  */
object BuildPhaseMicro {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(65536)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val degree = args.lift(2).map(_.toInt).getOrElse(32)
    val beam = args.lift(3).map(_.toInt).getOrElse(64)
    // fixture: "cell" (default) = one k-means-cell-shaped cloud (the
    // clustered build's per-segment regime); "multi" = 32-cluster mixture
    // (an unclustered segment); "uniform" = iid uniform cube
    val shape = args.lift(4).getOrElse("cell")
    val threads = args.lift(5).map(_.toInt).getOrElse(1)
    val rnd = new java.util.Random(5)
    def mk(): Array[Float] = shape match {
      case "uniform" => Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
      case "multi" =>
        val c = multiCenters(rnd.nextInt(multiCenters.length))
        Array.tabulate(dim)(j => c(j) + rnd.nextGaussian().toFloat * 0.3f)
      case _ =>
        Array.tabulate(dim)(j => cellCent(j) + rnd.nextGaussian().toFloat)
    }
    lazy val cellCent = Array.fill(dim)(rnd.nextGaussian().toFloat * 2f)
    lazy val multiCenters = Array.fill(32)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vs = Array.fill(n)(mk())
    val queries = Array.fill(100)(mk())
    println(s"n=$n dim=$dim degree=$degree beam=$beam shape=$shape threads=$threads " +
      s"kernels=${graft.simd.Kernels.INSTANCE.name}")

    def recallOf(g: Vamana): Double = {
      var hits = 0
      queries.foreach { q =>
        val truth = vs.indices.map(i => (i, g.sim(q, vs(i))))
          .sortBy { case (i, s) => (-s, i) }.take(10).map(_._1).toSet
        hits += g.search(q, 10, 64).map(_._1).toSet.intersect(truth).size
      }
      hits / (queries.length * 10.0)
    }

    for (rb <- Seq(-1, beam / 2, beam / 4, 0)) {
      val g = new Vamana(vs, "COSINE", degree, beam)
      g.refineBeam = rb
      val t0 = System.nanoTime()
      g.build(threads)
      val total = (System.nanoTime() - t0) / 1e9
      val tag = if (rb < 0) s"refine=$beam(full)" else if (rb == 0) "refine=skip" else s"refine=$rb"
      println(f"$tag%-18s total=$total%6.1fs insert=${g.lastInsertNanos / 1e9}%6.1fs " +
        f"refine=${g.lastRefineNanos / 1e9}%6.1fs hier=${g.lastHierNanos / 1e9}%5.1fs " +
        f"recall@10=${recallOf(g)}%.4f")
    }
  }
}
