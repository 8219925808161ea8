package graft.tools
import graft.index.Vamana

/** Kernel micro for the Q7 layout decision (no Spark): two-phase search
  * over one 50k-node segment, PQ-ADC beam + exact rerank, comparing the
  * gathered flat-code path against the fused transposed neighbor-code
  * traversal ([[Vamana.searchTwoPhaseFused]]). Codebooks here are fake
  * (random centroids) - the measurement is about memory access patterns,
  * not recall. Measured r9 (2026-08-14) on this AVX-512 box/Java 17,
  * float-table Panama block kernel (adcBlockF, assembleAndSum shape):
  * m=8 fused 64.5-69.2ms vs gathered 73.3-78.4ms (~1.15x); m=16 fused
  * 76.8-79.5ms vs gathered 88.6-117.5ms (1.15-1.30x, variance on the
  * gathered side). Real but below the 1.3x bar at the m=8 the gates
  * serve, so searchIndex keeps fusedAdc=off; the bench line records
  * pq_fused_qps/pq_gathered_qps at every shed level. args: [n] [dim] [m]. */
object FusedMicro {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000; val dim = if (args.length>1) args(1).toInt else 64; val m = if (args.length>2) args(2).toInt else 8; val kk = 256
    val rnd = new scala.util.Random(3)
    val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
    val g = new Vamana(vecs, "COSINE", 32, 100).build()
    println("built")
    val sub = dim / m
    val cbs = Array.fill(m)(Array.fill(kk)(Array.fill(sub)(rnd.nextDouble())))
    def encode(v: Array[Float]): Array[Int] = Array.tabulate(m) { s =>
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < kk) {
        var d = 0.0; var j = 0
        while (j < sub) { val t = v(s*sub+j) - cbs(s)(c)(j); d += t*t; j += 1 }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      best
    }
    val codes = vecs.map(encode)
    val flat = new Array[Int](n * m)
    for (i <- 0 until n) System.arraycopy(codes(i), 0, flat, i*m, m)
    val fused: Array[Array[Int]] = Array.tabulate(n) { u =>
      val nbrs = g.neighbors(u); val deg = nbrs.length
      val block = new Array[Int](m * deg)
      for (s <- 0 until m; j <- 0 until deg) block(s*deg + j) = codes(nbrs(j))(s)
      block
    }
    println("encoded")
    val queries = Array.fill(200)(Array.fill(dim)(rnd.nextFloat()))
    def adcTabs(q: Array[Float]) = {
      val dots = new Array[Double](m*kk); val mags = new Array[Double](m*kk)
      for (s <- 0 until m; c <- 0 until kk) {
        var d = 0.0; var mg = 0.0
        for (j <- 0 until sub) { d += q(s*sub+j).toDouble * cbs(s)(c)(j); mg += cbs(s)(c)(j)*cbs(s)(c)(j) }
        dots(s*kk+c) = d; mags(s*kk+c) = mg
      }
      (dots, mags, q.map(x => x.toDouble*x).sum)
    }
    val tabs = queries.map(adcTabs)
    def runGathered(): Long = {
      var acc = 0L
      for (qi <- queries.indices) {
        val (dots, mags, qn) = tabs(qi)
        val approx: Int => Double = { i =>
          val base = i*m; var dot = 0.0; var mag = 0.0; var s = 0
          while (s < m) { val c = flat(base+s); dot += dots(s*kk+c); mag += mags(s*kk+c); s += 1 }
          (1.0 + dot / (math.sqrt(mag) * math.sqrt(qn))) / 2.0
        }
        acc += g.searchTwoPhase(queries(qi), approx, 10, 100).length
      }
      acc
    }
    def runFused(): Long = {
      var acc = 0L
      for (qi <- queries.indices) {
        val (dots, mags, qn) = tabs(qi)
        acc += g.searchTwoPhaseFused(queries(qi), flat, fused, dots, mags, qn, m, kk, 2, 10, 100)._1.length
      }
      acc
    }
    for (_ <- 1 to 3) { runGathered(); runFused() }
    for (r <- 1 to 4) {
      val t0 = System.nanoTime(); runGathered(); val tg = (System.nanoTime()-t0)/1e6
      val t1 = System.nanoTime(); runFused(); val tf = (System.nanoTime()-t1)/1e6
      println(f"round $r: gathered $tg%.1f ms   fused $tf%.1f ms")
    }
  }
}
