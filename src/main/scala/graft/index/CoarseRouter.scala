package graft.index

/** Two-level (coarse) centroid routing for trees with MANY segments.
  *
  * [[Ann.pickSegments]] scores every segment centroid per query — O(S·d).
  * Fine at the gate fixtures (16 cells) and still sub-second at 4096, but
  * a 100 TB clustered tree has 10^4–10^5 cells, and a 10k-query serving
  * batch then puts ~10^10–10^11 multiply-adds on the DRIVER per batch —
  * the routing step itself becomes the scale bottleneck after r11 removed
  * the sort. The classic fix (FAISS's coarse quantizer over an IVF's own
  * centroid set — public knowledge, no jvector counterpart since the
  * reference never cell-partitions) is a second clustering level:
  * k-means the S centroids into ~sqrt(S) super-centroids ONCE per
  * (path, build-token), then per query score only the supers and expand
  * the best supers' member lists into an oversampled candidate pool for
  * the existing bounded-heap pick — O(sqrt(S)·d + pool) per query.
  *
  * Engaged by [[Ann.routeQueries]] only at `cells >= Ann.CoarseRouteCells`
  * (default 4096): below the threshold routing is BIT-IDENTICAL to the
  * exact scan, so every existing gate/spec fixture (<= 64 cells) is
  * untouched. Above it, picks are approximate relative to the exact
  * top-eff centroid ranking; routing recall is validated at 4096 and
  * 16384 cells by `tools/RoutingScaleMicro` (>= 0.95 at every planted
  * selectivity) and `CoarseRouteSpec`. The filtered accepted-mass walk
  * keeps its termination AND worst-case exactness: when the walk's
  * doubling prefix reaches the full eligible set, the pool falls back to
  * exactly that set, reproducing today's behavior.
  *
  * Clustering is seeded EUCLIDEAN k-means (stride-sampled k-means++ init,
  * a few Lloyd iterations; assignment parallel across driver cores,
  * accumulation sequential — deterministic regardless of thread
  * scheduling). Euclidean on raw vectors is the standard coarse-quantizer
  * choice for all three metrics; the per-query SUPER ordering uses the
  * serving metric itself.
  */
private[graft] final class CoarseRouter(
    val superCents: Array[Array[Float]],
    /** member centroid indexes per super (into the name-sorted cents). */
    val members: Array[Array[Int]],
    val total: Int) {

  /** Hoisted cosine norms of the supers (computed once per router — the
    * per-(query, super) `Vamana.similarity` call recomputed BOTH norms
    * and allocated a `toUpperCase` string per call: ~6M allocations and
    * 3x the flops per 4096-query routing batch at 1452 supers). Same
    * arithmetic as the inline path (sqrt of a sequential double sum), so
    * similarity values — and hence picks — are bit-identical. */
  @transient private lazy val superNormSqrts: Array[Double] =
    superCents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
      math.sqrt(s)
    }

  /** Candidate centroid-index pool for one query: supers ranked by
    * `metric` similarity best-first, member lists appended (whole supers;
    * the caller's heap prunes) until `need` members pass `mask`
    * (null = unfiltered). Returns every masked member when `need` meets
    * or exceeds the masked total — the caller's exact-fallback guarantee. */
  def pool(qvec: Array[Float], metric: String, need: Int,
      mask: Array[Long], maskCount: Int): Array[Int] = {
    val ns = superCents.length
    val mc = metric.toUpperCase match {
      case "EUCLIDEAN" => 0
      case "DOT_PRODUCT" | "DOT" => 1
      case "COSINE" => 2
      case m => throw new IllegalArgumentException(s"unknown metric: $m")
    }
    val qn: Double = if (mc != 2) 0.0 else {
      var s = 0.0; var i = 0
      while (i < qvec.length) { s += qvec(i).toDouble * qvec(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val packed = new Array[Long](ns)
    var s = 0
    while (s < ns) {
      val c = superCents(s)
      var d = 0.0
      var i = 0
      if (mc == 0) {
        while (i < c.length) {
          val t = qvec(i).toDouble - c(i).toDouble; d += t * t; i += 1
        }
      } else {
        while (i < c.length) { d += qvec(i).toDouble * c(i).toDouble; i += 1 }
      }
      val sim = (mc: @annotation.switch) match {
        case 0 => 1.0 / (1.0 + d)
        case 1 => (1.0 + d) / 2.0
        case _ => (1.0 + d / (qn * superNormSqrts(s))) / 2.0
      }
      packed(s) = LongHeap.pack(sim, s)
      s += 1
    }
    java.util.Arrays.sort(packed) // ascending — walk from the top end
    val target = math.min(need, if (mask == null) total else maskCount)
    val b = new scala.collection.mutable.ArrayBuilder.ofInt
    b.sizeHint(math.min(total, need + 16))
    // spill assignment means a centroid can live in two supers — dedup so
    // the caller's heap never sees (and so never picks) an index twice
    val seen = new Array[Long]((total + 63) >> 6)
    // breadth floor: expand at least ~sqrt(supers) supers regardless of
    // the member target — a member-count rule alone can stop after 2-3
    // (spilled) supers and lose head-of-ranking cells that sit just over a
    // super boundary. DEPTH is the caller's `need`: on real k-means
    // centroid sets (noisy, overlapping cells — unlike planted per-cell
    // means) the relevant ranking spreads wide, and the serving caller
    // passes ~32x its pick count (a super-count floor like ns/8 was
    // measured to over-correct: at 65536 cells it built 25% pools whose
    // branch-y dedup appends ran SLOWER than the flat SIMD scan).
    val minSupers = math.min(ns, math.max(4, math.ceil(math.sqrt(ns.toDouble)).toInt))
    var got = 0
    var p = ns - 1
    while (p >= 0 && (got < target || ns - 1 - p < minSupers)) {
      val mem = members(LongHeap.id(packed(p)))
      var i = 0
      while (i < mem.length) {
        val c = mem(i)
        if ((mask == null || ((mask(c >>> 6) >>> (c & 63)) & 1L) != 0L) &&
            ((seen(c >>> 6) >>> (c & 63)) & 1L) == 0L) {
          seen(c >>> 6) |= 1L << (c & 63)
          b += c; got += 1
        }
        i += 1
      }
      p -= 1
    }
    b.result()
  }
}

private[graft] object CoarseRouter {

  /** Spill degree: every centroid joins its `Spill` nearest supers. 2 was
    * the r13 shipping value; 3 adds 50% member storage and buys head-cell
    * retention on REAL (noisy) centroid sets where a head cell's two
    * nearest supers can both rank below the pool cutoff. Env
    * `SPARK_GRAFT_COARSE_SPILL`; a var for one-tree A/B sweeps. */
  private[graft] var Spill: Int =
    sys.env.get("SPARK_GRAFT_COARSE_SPILL").map(_.toInt).getOrElse(2)

  def build(cents: Array[(String, Array[Float])], seed: Long = 20260815L,
      /** supers = superFactor * sqrt(S): finer supers cost a slightly
        * longer super scan (still sublinear) and buy expansion granularity
        * — the filtered walk picks up to 2*sqrt(S) cells and needs its
        * pool to track the eligible ranking closely. */
      superFactor: Int = 4): CoarseRouter = {
    val S = cents.length
    val d = cents(0)._2.length
    val k = math.max(2, math.min(S / 2,
      superFactor * math.ceil(math.sqrt(S.toDouble)).toInt))
    val vecs = cents.map(_._2)

    @inline def dist2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val df = a(i).toDouble - b(i).toDouble; acc += df * df; i += 1
      }
      acc
    }

    // k-means++ on a bounded deterministic stride sample (init quality
    // only needs coverage, not every point)
    val sampleN = math.min(S, math.max(k * 8, 4096))
    val sample = Array.tabulate(sampleN)(i => vecs(((i.toLong * S) / sampleN).toInt))
    val rnd = new java.util.Random(seed)
    val centers = new Array[Array[Float]](k)
    centers(0) = sample(rnd.nextInt(sampleN)).clone()
    val minD = Array.fill(sampleN)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var tot = 0.0
      var i = 0
      while (i < sampleN) {
        val dd = dist2(sample(i), centers(c - 1))
        if (dd < minD(i)) minD(i) = dd
        tot += minD(i)
        i += 1
      }
      var r = rnd.nextDouble() * tot
      var pick = sampleN - 1
      i = 0
      var done = false
      while (i < sampleN && !done) {
        r -= minD(i)
        if (r <= 0) { pick = i; done = true }
        i += 1
      }
      centers(c) = sample(pick).clone()
      c += 1
    }

    // Lloyd iterations over ALL S centroids: parallel assign (pure,
    // index-addressed writes), sequential accumulate (deterministic).
    // assignTop tracks the `spill` nearest supers for the final spill pass
    // (slot 0 = the Lloyd assignment).
    val spill = math.max(1, math.min(k, Spill))
    val assignTop = Array.ofDim[Int](S, spill)
    val threads = math.max(1, Runtime.getRuntime.availableProcessors - 2)
    def assignAll(): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        val chunk = math.max(1, (S + threads - 1) / threads)
        val futs = (0 until S by chunk).map { lo =>
          pool.submit(new Runnable {
            def run(): Unit = {
              val bd = new Array[Double](spill)
              val bi = new Array[Int](spill)
              var i = lo
              val hi = math.min(S, lo + chunk)
              while (i < hi) {
                java.util.Arrays.fill(bd, Double.MaxValue)
                java.util.Arrays.fill(bi, 0)
                var j = 0
                while (j < k) {
                  val dd = dist2(vecs(i), centers(j))
                  if (dd < bd(spill - 1)) {
                    var p = spill - 1
                    while (p > 0 && bd(p - 1) > dd) {
                      bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1
                    }
                    bd(p) = dd; bi(p) = j
                  }
                  j += 1
                }
                System.arraycopy(bi, 0, assignTop(i), 0, spill)
                i += 1
              }
            }
          })
        }
        futs.foreach(_.get())
      } finally pool.shutdown()
    }
    var iter = 0
    while (iter < 4) {
      assignAll()
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      var i = 0
      while (i < S) {
        val a = assignTop(i)(0); val v = vecs(i)
        var j = 0
        while (j < d) { sums(a)(j) += v(j); j += 1 }
        counts(a) += 1
        i += 1
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0)
          centers(j) = Array.tabulate(d)(x => (sums(j)(x) / counts(j)).toFloat)
        j += 1
      }
      iter += 1
    }
    assignAll()

    // spill assignment (IVF "replica" trick): every centroid joins its
    // `spill` nearest supers, so cells near a super boundary — exactly the
    // ones an exact top-eff ranking picks from several supers — stay
    // reachable from each side. spill-x member storage (ints), large
    // pick-overlap gain.
    val members = Array.fill(k)(new scala.collection.mutable.ArrayBuilder.ofInt)
    var s = 0
    while (s < spill) {
      var i = 0
      while (i < S) {
        val a = assignTop(i)(s)
        var dup = false
        var p = 0
        while (p < s && !dup) { dup = assignTop(i)(p) == a; p += 1 }
        if (!dup) members(a) += i
        i += 1
      }
      s += 1
    }
    new CoarseRouter(centers, members.map(_.result()), S)
  }
}
