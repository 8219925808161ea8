package graft.tools

import graft.index.Ann

/** Validates the FILTERED routing floor (2·sqrt(S) eligible cells,
  * accepted-mass walking — `Ann.routeQueries`) at realistic segment
  * counts. The r12 fix was gated at 16 cells; the design claim is "2·sqrt
  * of 10⁴ cells is ~2% of the tree" — this micro checks the claim at
  * 4096+ cells with planted filters across selectivities, including the
  * adversarial cluster-correlated case (reference contract:
  * `TestLowCardinalityFiltering.java:54-57`).
  *
  * Pure driver-side: routing is a driver decision over (centroid,
  * accepted-mass) pairs, so no Spark session and no graph builds are
  * needed. Reported recall is ROUTING recall — the fraction of the true
  * filtered top-k whose cell is probed (the in-cell beam's recall on
  * probed cells is gated separately by ann_routed_filtered).
  *
  * Run: sbt "runMain graft.tools.RoutingScaleMicro [cells] [perCell]"
  */
object RoutingScaleMicro {
  def main(args: Array[String]): Unit = {
    val nCells = args.lift(0).map(_.toInt).getOrElse(4096)
    val per = args.lift(1).map(_.toInt).getOrElse(100)
    val d = 32; val topK = 10; val nQ = 40
    val n = nCells * per
    val rnd = new java.util.Random(101)
    // same planted-Gaussian shape as the gate fixtures: centers N(0,2),
    // within-cell noise N(0,1)
    val centers = Array.fill(nCells)(Array.fill(d)(rnd.nextGaussian().toFloat * 2))
    val vecs = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      val r = new java.util.Random(i * 131L + 7)
      val c = centers(i % nCells)
      vecs(i) = Array.tabulate(d)(j => c(j) + r.nextGaussian().toFloat)
      i += 1
    }
    // cell centroids as routing sees them: the per-cell MEAN (segments
    // store the segment mean, not the generator's center)
    val cellMean = Array.fill(nCells)(new Array[Float](d))
    i = 0
    while (i < n) {
      val c = cellMean(i % nCells)
      var j = 0
      while (j < d) { c(j) += vecs(i)(j) / per; j += 1 }
      i += 1
    }
    val cents: Array[(String, Array[Float])] =
      Array.tabulate(nCells)(c => (f"c$c%05d", cellMean(c))) // name order == index order
    val queries = Array.tabulate(nQ)(qi => vecs(qi.toLong.toInt * (n / nQ) + 3))

    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dd = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < d) {
        dd += a(j).toDouble * b(j); na += a(j).toDouble * a(j); nb += b(j).toDouble * b(j)
        j += 1
      }
      dd / (math.sqrt(na) * math.sqrt(nb))
    }

    // ids are laid out id % nCells -> cell, so modulo filters are
    // perfectly CELL-CORRELATED (an id%2 filter accepts only even cells —
    // the adversarial case where mass-blind sqrt routing loses recall);
    // the *u variants hash the id first, giving cell-UNCORRELATED filters
    @inline def mix(id: Int): Int = {
      var h = id * 0x9E3779B9
      h ^= h >>> 16
      h & 0x7fffffff
    }
    val filters: Seq[(String, Int => Boolean)] = Seq(
      ("sel50c", id => id % 2 == 0),
      ("sel5c", id => id % 20 == 0),
      ("sel0.5c", id => id % 200 == 0),
      ("sel50u", id => mix(id) % 2 == 0),
      ("sel5u", id => mix(id) % 20 == 0),
      ("sel0.5u", id => mix(id) % 200 == 0),
      // hardest: only 1/64 of CELLS hold accepted rows at all
      ("corr64c", id => id % nCells % 64 == 0))

    val base = math.max(1, math.ceil(math.sqrt(nCells.toDouble)).toInt)
    val floor = 2 * base
    val want = 4L * topK // FilterRouteOversample * k
    println(s"cells=$nCells rows=$n base=$base floor=$floor want=$want")

    // two-level coarse routing arm (see CoarseRouter): same picks API,
    // candidate pools from sqrt(S) super-centroids instead of a full scan
    val tb = System.nanoTime()
    val coarse = graft.index.CoarseRouter.build(cents)
    println(f"coarse build ${(System.nanoTime() - tb) / 1e9}%.2fs " +
      s"(supers=${coarse.superCents.length})")
    // UNFILTERED routing: per-query wall + recall of the coarse pick vs
    // the exact top-base centroid scan (the serving default's shape).
    // Timing uses a LARGER query batch (arg 3, default 2048) — per-query
    // routing cost only dominates at serving batch sizes.
    locally {
      val timeQ = args.lift(2).map(_.toInt).getOrElse(2048)
      val timingQueries = Array.tabulate(timeQ) { qi =>
        val r = new java.util.Random(qi * 7919L + 13)
        val c = centers(r.nextInt(nCells))
        Array.tabulate(d)(j => c(j) + r.nextGaussian().toFloat)
      }
      def run(c: graft.index.CoarseRouter): (Double, Array[Set[String]]) = {
        val t0 = System.nanoTime()
        Ann.routePick(timingQueries, "COSINE", cents, base, base, 0L,
          null, null, c)
        val wall = (System.nanoTime() - t0) / 1e9
        val picks = Ann.routePick(queries, "COSINE", cents, base, base, 0L,
          null, null, c)
        (wall, picks.map(_.toSet))
      }
      run(null); run(coarse) // warm
      val (tFlat, exact) = run(null)
      val (tCoarse, approx) = run(coarse)
      // routing recall vs the exact TRUE top-k cells (the metric that
      // matters: is the truth's cell probed?)
      var hit = 0; var tot = 0
      queries.indices.foreach { qi =>
        val q = queries(qi)
        val h = new graft.index.LongHeap(topK, min = true)
        var id = 0
        while (id < n) {
          val packed = graft.index.LongHeap.pack(cosine(q, vecs(id)), id)
          if (h.size < topK) h.push(packed)
          else if (packed > h.top) { h.pop(); h.push(packed) }
          id += 1
        }
        while (h.size > 0) {
          val tid = graft.index.LongHeap.id(h.pop())
          tot += 1
          if (approx(qi).contains(f"c${tid % nCells}%05d")) hit += 1
        }
      }
      val overlap = queries.indices.map(qi =>
        (exact(qi) & approx(qi)).size.toDouble / exact(qi).size).sum / queries.length
      println(f"unfiltered: flat=${tFlat}%.3fs coarse=${tCoarse}%.3fs " +
        f"(${tFlat / tCoarse}%.1fx) pick-overlap=$overlap%.3f " +
        f"truth-cell-recall=${hit.toDouble / tot}%.4f")
    }

    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      Runtime.getRuntime.availableProcessors)
    try {
      for ((label, pred) <- filters) {
        val perSeg: Map[String, Long] = (0 until nCells).flatMap { c =>
          var cnt = 0L
          var k = c
          while (k < n) { if (pred(k)) cnt += 1; k += nCells }
          if (cnt > 0) Some((f"c$c%05d", cnt)) else None
        }.toMap
        val eligible: Array[Int] =
          (0 until nCells).filter(c => perSeg.contains(f"c$c%05d")).toArray
        val eligMask = new Array[Long]((nCells + 63) >> 6)
        eligible.foreach(c => eligMask(c >>> 6) |= 1L << (c & 63))
        // per-query: routing picks (flat + coarse) + exact filtered truth
        val futs = queries.map { q =>
          pool.submit(new java.util.concurrent.Callable[(Int, Int, Int, Int)] {
            def call(): (Int, Int, Int, Int) = {
              val picks = Ann.pickSegments(q, "COSINE", cents, base, floor,
                want, perSeg, eligible).toSet
              val picksC = Ann.pickSegments(q, "COSINE", cents, base, floor,
                want, perSeg, eligible, null, coarse, eligMask).toSet
              // exact filtered top-k (score desc, id asc)
              val h = new graft.index.LongHeap(topK, min = true)
              var id = 0
              while (id < n) {
                if (pred(id)) {
                  val packed = graft.index.LongHeap.pack(cosine(q, vecs(id)), id)
                  if (h.size < topK) h.push(packed)
                  else if (packed > h.top) { h.pop(); h.push(packed) }
                }
                id += 1
              }
              var hit = 0; var hitC = 0; var tot = 0
              while (h.size > 0) {
                val cell = f"c${graft.index.LongHeap.id(h.pop()) % nCells}%05d"
                tot += 1
                if (picks.contains(cell)) hit += 1
                if (picksC.contains(cell)) hitC += 1
              }
              (hit, hitC, tot, picksC.size)
            }
          })
        }
        val res = futs.map(_.get())
        val tot = res.map(_._3).sum
        val recall = res.map(_._1).sum.toDouble / tot
        val recallC = res.map(_._2).sum.toDouble / tot
        val probed = res.map(_._4).sum.toDouble / res.length
        println(f"$label%-8s eligible=${eligible.length}%5d routing-recall=$recall%.4f " +
          f"coarse=$recallC%.4f probed=${probed}%.1f cells " +
          f"(${100.0 * probed / nCells}%.2f%% of tree)")
      }
    } finally pool.shutdown()
  }
}
