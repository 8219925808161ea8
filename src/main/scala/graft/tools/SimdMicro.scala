package graft.tools

import graft.simd.{Kernels, ScalarKernels}

/** Dev micro (not driver flow): raw kernel throughput, active provider vs
  * scalar, plus a Vamana build+search wall-clock at a representative size.
  * Run with the plain-java runner; pass `-Dgraft.simd=off` to compare.
  */
object SimdMicro {
  def main(args: Array[String]): Unit = {
    val dim = if (args.nonEmpty) args(0).toInt else 64
    val n = 4096
    val rnd = new scala.util.Random(1)
    val vs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val active = Kernels.INSTANCE
    val scalar = new ScalarKernels
    println(s"active kernels: ${active.name}, dim=$dim")

    def bench(name: String, k: graft.simd.VectorKernels): Unit = {
      var sink = 0.0
      // warmup
      var r = 0
      while (r < 3) {
        var i = 0
        while (i < n) { sink += k.dot(vs(i), vs((i * 31 + r) % n)); i += 1 }
        r += 1
      }
      val reps = 2000
      val t0 = System.nanoTime()
      r = 0
      while (r < reps) {
        var i = 0
        while (i < n) { sink += k.dot(vs(i), vs((i * 31 + r) % n)); i += 1 }
        r += 1
      }
      val el = (System.nanoTime() - t0) / 1e9
      val mops = n.toLong * reps / el / 1e6
      println(f"$name%-8s dot: $mops%.1f Mdot/s  (sink=${sink != 0.0})")
    }
    bench(active.name, active)
    bench("scalar", scalar)

    // ADC gather-accumulate (fused-block pattern): m subspaces x deg columns
    {
      val m = 8; val kk = 256; val deg = 32
      val dots = Array.fill(m * kk)(rnd.nextDouble())
      val mags = Array.fill(m * kk)(rnd.nextDouble())
      val blocks = Array.fill(1024)(Array.fill(m * deg)(rnd.nextInt(kk)))
      def benchAdc(name: String, k: graft.simd.VectorKernels): Unit = {
        val dAcc = new Array[Double](deg); val mAcc = new Array[Double](deg)
        var sink = 0.0
        val reps = 20000
        var t0 = System.nanoTime()
        var r = 0
        while (r < reps) {
          val block = blocks(r % blocks.length)
          java.util.Arrays.fill(dAcc, 0.0); java.util.Arrays.fill(mAcc, 0.0)
          var s = 0
          while (s < m) { k.adcAccumulate(dots, mags, s * kk, block, s * deg, deg, dAcc, mAcc); s += 1 }
          sink += dAcc(0) + mAcc(deg - 1)
          r += 1
        }
        val el = (System.nanoTime() - t0) / 1e9
        println(f"$name%-10s adcAccumulate: ${reps.toLong * m * deg / el / 1e6}%.1f Mlookup-pair/s (sink=${sink != 0})")
      }
      // warmup both
      benchAdc("warm-" + active.name, active); benchAdc("warm-scalar", scalar)
      benchAdc(active.name, active); benchAdc("scalar", scalar)
    }

    // engine-level: build + search a 50k graph
    val nb = 50000
    val base = Array.fill(nb)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val tb0 = System.nanoTime()
    val g = new graft.index.Vamana(base, "COSINE", maxDegree = 32, beamWidth = 100).build()
    val buildS = (System.nanoTime() - tb0) / 1e9
    val queries = Array.fill(500)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    var t = System.nanoTime()
    var qi = 0
    while (qi < queries.length) { g.search(queries(qi), 10, 100); qi += 1 }
    var el = (System.nanoTime() - t) / 1e9
    // second pass warm
    t = System.nanoTime(); qi = 0
    while (qi < queries.length) { g.search(queries(qi), 10, 100); qi += 1 }
    el = (System.nanoTime() - t) / 1e9
    println(f"vamana 50k x $dim%dd: build $buildS%.2fs, search ${queries.length / el}%.0f q/s (ef=100, warm)")
  }
}
