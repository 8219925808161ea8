package graft.tools

/** One-off: times a single large Vamana build (hierarchy path included). */
object HierBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val dim = 16
    val rnd = new scala.util.Random(3)
    val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val t0 = System.nanoTime()
    val g = new graft.index.Vamana(vecs, "COSINE", 32, 100).build()
    val sec = (System.nanoTime() - t0) / 1e9
    // recall sanity on 50 queries
    var rec = 0.0
    for (_ <- 0 until 50) {
      val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      val want = vecs.indices.map(i => (i, g.sim(q, vecs(i))))
        .sortBy { case (i, s) => (-s, i) }.take(10).map(_._1).toSet
      val got = g.search(q, 10, 64).map(_._1).toSet
      rec += got.intersect(want).size / 10.0
    }
    println(s"### n=$n build_sec=$sec vps=${n / sec} recall=${rec / 50}")
  }
}
