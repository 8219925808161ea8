package graft.tools

import graft.index.{Ann, Vamana}

/** Driver-side routing cost micro: [[Ann.pickSegments]] (bounded-heap
  * top-m selection) vs the historical full per-query centroid sort, at
  * serving-scale shapes — 10k queries x 4096 centroids is the 100 TB
  * regime (10^4-10^5 segments, 10^3-10^4 query batches) where a full
  * O(Q * S log S) sort puts ~10^9 comparisons on the driver per batch.
  * Target: heap routing for the whole batch <= ~100 ms.
  *
  * Run: sbt "runMain graft.tools.RouteMicro [queries] [segments] [dim]"
  * (defaults 10000 4096 64). No Spark session needed — this is pure
  * driver work by construction.
  */
object RouteMicro {

  private def fullSortPick(q: Array[Float], metric: String,
      cents: Array[(String, Array[Float])], eff: Int): Seq[String] =
    cents.map { case (s, c) => (s, Vamana.similarity(metric, q, c)) }
      .sortBy { case (s, sc) => (-sc, s) }
      .take(eff).map(_._1).toSeq

  def main(args: Array[String]): Unit = {
    val nQ = args.lift(0).map(_.toInt).getOrElse(10000)
    val nS = args.lift(1).map(_.toInt).getOrElse(4096)
    val d = args.lift(2).map(_.toInt).getOrElse(64)
    val rnd = new java.util.Random(17)
    val cents = Array.tabulate(nS)(i =>
      (f"seg_$i%06d", Array.fill(d)(rnd.nextGaussian().toFloat))).sortBy(_._1)
    val qs = Array.fill(nQ)(Array.fill(d)(rnd.nextGaussian().toFloat))
    val eff = math.max(1, math.ceil(math.sqrt(nS.toDouble)).toInt)
    // filtered shape: ~5% selectivity, heavy-tailed accepted masses
    val perSeg: Map[String, Long] = cents.map { case (s, _) =>
      s -> (if (rnd.nextDouble() < 0.95) 0L else (rnd.nextInt(400) + 1).toLong)
    }.toMap
    val eligible = cents.indices
      .filter(i => perSeg.getOrElse(cents(i)._1, 0L) > 0L).toArray

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val sink = f
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"$label%-28s $ms%9.1f ms   (sink=$sink)")
    }

    println(s"queries=$nQ segments=$nS dim=$d eff=$eff eligible=${eligible.length}")
    time("routePick unfiltered") {
      Ann.routePick(qs, "COSINE", cents, eff, eff, 0L, null, null).map(_.length.toLong).sum
    }
    time("routePick accepted-mass") {
      Ann.routePick(qs, "COSINE", cents, eff, eff, 40L, perSeg, eligible).map(_.length.toLong).sum
    }
    time("heap 1-thread unfiltered") {
      var acc = 0L; var i = 0
      while (i < nQ) {
        acc += Ann.pickSegments(qs(i), "COSINE", cents, eff, eff, 0L, null, null).length
        i += 1
      }
      acc
    }
    // historical baseline at a tenth of the queries (it's the slow side),
    // scaled in the printout
    val nRef = math.max(1, nQ / 10)
    val t0 = System.nanoTime()
    var acc = 0L; var i = 0
    while (i < nRef) { acc += fullSortPick(qs(i), "COSINE", cents, eff).length; i += 1 }
    val ms = (System.nanoTime() - t0) / 1e6
    println(f"full sort (historical)       ${ms * nQ / nRef}%9.1f ms   (extrapolated from $nRef queries, sink=$acc)")
  }
}
