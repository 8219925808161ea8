package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{Ann, CoarseRouter, LongHeap}

/** Two-level (coarse) centroid routing (see [[graft.index.CoarseRouter]]):
  * engaged above Ann.CoarseRouteCells, so these tests drive it DIRECTLY
  * through the pickSegments/routePick params — no env dependence, and the
  * below-threshold serving paths stay bit-identical (RoutePickSpec pins
  * those). Pure driver-side: no Spark session. */
class CoarseRouteSpec extends AnyFunSuite {

  private val d = 16
  private val nCells = 1024
  private val rnd = new java.util.Random(77)
  private val cents: Array[(String, Array[Float])] =
    Array.tabulate(nCells) { c =>
      (f"c$c%05d", Array.fill(d)(rnd.nextGaussian().toFloat * 2))
    } // name order == index order (pickSegments contract)
  private val queries: Array[Array[Float]] =
    Array.tabulate(64) { qi =>
      // near a planted centroid, plus noise — the realistic routed shape
      val r = new java.util.Random(qi * 997L + 5)
      val c = cents(r.nextInt(nCells))._2
      Array.tabulate(d)(j => c(j) + r.nextGaussian().toFloat * 0.3f)
    }

  test("build is deterministic; spill covers every centroid once or twice") {
    val a = CoarseRouter.build(cents)
    val b = CoarseRouter.build(cents)
    assert(a.superCents.map(_.toSeq).toSeq == b.superCents.map(_.toSeq).toSeq)
    assert(a.members.map(_.toSeq).toSeq == b.members.map(_.toSeq).toSeq)
    val counts = a.members.flatten.groupBy(identity).view.mapValues(_.length)
    assert((0 until nCells).forall(c => counts.getOrElse(c, 0) >= 1),
      "every centroid must be reachable from at least one super")
    assert(counts.values.forall(n => n >= 1 && n <= 2),
      "spill assignment is at most 2 supers per centroid")
    assert(a.superCents.length ==
      math.min(nCells / 2, 4 * math.ceil(math.sqrt(nCells.toDouble)).toInt))
    // pools never contain duplicates (spill + dedup)
    val pool = a.pool(queries(0), "COSINE", 256, null, 0)
    assert(pool.distinct.length == pool.length)
  }

  test("unfiltered coarse picks retain the HEAD of the exact ranking") {
    // cents here are PURE NOISE (no cluster structure) — the adversarial
    // case for a coarse quantizer. The exact top-eff ranking's TAIL is
    // then non-local by construction (nearest-32-of-1024 random Gaussians
    // spread across many supers), so full-ranking overlap is not the bar:
    // what serving needs is the ranking's HEAD — the cells where true
    // neighbors concentrate (the planted-corpus test below pins truth
    // recall >= 0.95 end-to-end, and tools/RoutingScaleMicro validates the
    // serving metric at 4096/16384 cells with realistic cell structure).
    val coarse = CoarseRouter.build(cents)
    val eff = math.ceil(math.sqrt(nCells.toDouble)).toInt // serving default
    val head = math.max(1, eff / 4)
    var headHit = 0; var headTot = 0
    val overlaps = queries.map { q =>
      val exact = Ann.pickSegments(q, "COSINE", cents, eff, eff, 0L, null, null)
      val approx = Ann.pickSegments(q, "COSINE", cents, eff, eff, 0L, null, null,
        null, coarse, null).toSet
      assert(approx.size == eff, "coarse pick count must match the exact path")
      exact.take(head).foreach { c => headTot += 1; if (approx(c)) headHit += 1 }
      (exact.toSet & approx).size.toDouble / exact.size
    }
    val headRecall = headHit.toDouble / headTot
    assert(headRecall >= 0.9, f"exact top-$head retention $headRecall%.3f < 0.9")
    val mean = overlaps.sum / overlaps.length
    assert(mean >= 0.5, f"mean pick overlap $mean%.3f < 0.5 (sanity floor)")
  }

  test("pool returns every eligible member when need covers the masked total") {
    val coarse = CoarseRouter.build(cents)
    val eligible = (0 until nCells by 3).toArray
    val mask = new Array[Long]((nCells + 63) >> 6)
    eligible.foreach(c => mask(c >>> 6) |= 1L << (c & 63))
    val got = coarse.pool(queries(0), "COSINE", eligible.length, mask, eligible.length)
    assert(got.sorted.toSeq == eligible.toSeq,
      "need >= masked total must yield the full eligible set (exact fallback)")
  }

  test("filtered walk with coarse matches exact once the prefix covers eligible") {
    val coarse = CoarseRouter.build(cents)
    // tiny eligible set: the doubling prefix immediately reaches
    // m >= eligible.length, so the coarse path must fall back to the exact
    // walk and produce IDENTICAL picks
    val eligible = Array(3, 99, 256, 511, 777)
    val perSeg: Map[String, Long] = eligible.map(c => (f"c$c%05d", 100L)).toMap
    val mask = new Array[Long]((nCells + 63) >> 6)
    eligible.foreach(c => mask(c >>> 6) |= 1L << (c & 63))
    queries.take(8).foreach { q =>
      val exact = Ann.pickSegments(q, "COSINE", cents, 4, 4, 40L, perSeg, eligible)
      val approx = Ann.pickSegments(q, "COSINE", cents, 4, 4, 40L, perSeg, eligible,
        null, coarse, mask)
      assert(approx == exact, "exact fallback must be pick-for-pick identical")
    }
  }

  test("filtered coarse walk keeps the truth cell probed on a planted corpus") {
    val coarse = CoarseRouter.build(cents)
    // rows live in their cells; an id%2 filter correlated with cells
    val per = 20
    val n = nCells * per
    def vecOf(i: Int): Array[Float] = {
      val r = new java.util.Random(i * 131L + 9)
      val c = cents(i % nCells)._2
      Array.tabulate(d)(j => c(j) + r.nextGaussian().toFloat * 0.5f)
    }
    val pred = (id: Int) => id % nCells % 2 == 0 // only even cells eligible
    val perSeg: Map[String, Long] = (0 until nCells).collect {
      case c if c % 2 == 0 => (f"c$c%05d", per.toLong)
    }.toMap
    val eligible = (0 until nCells by 2).toArray
    val mask = new Array[Long]((nCells + 63) >> 6)
    eligible.foreach(c => mask(c >>> 6) |= 1L << (c & 63))
    val base = math.ceil(math.sqrt(nCells.toDouble)).toInt
    var hit = 0; var tot = 0
    queries.take(16).foreach { q =>
      val picks = Ann.pickSegments(q, "COSINE", cents, base, 2 * base, 40L,
        perSeg, eligible, null, coarse, mask).toSet
      // exact filtered top-10 truth
      val h = new LongHeap(10, min = true)
      var id = 0
      while (id < n) {
        if (pred(id)) {
          val v = vecOf(id)
          var dd = 0.0; var na = 0.0; var nb = 0.0; var j = 0
          while (j < d) {
            dd += q(j).toDouble * v(j); na += q(j).toDouble * q(j)
            nb += v(j).toDouble * v(j); j += 1
          }
          val packed = LongHeap.pack(dd / (math.sqrt(na) * math.sqrt(nb)), id)
          if (h.size < 10) h.push(packed)
          else if (packed > h.top) { h.pop(); h.push(packed) }
        }
        id += 1
      }
      while (h.size > 0) {
        val cell = f"c${LongHeap.id(h.pop()) % nCells}%05d"
        tot += 1
        if (picks.contains(cell)) hit += 1
      }
    }
    val recall = hit.toDouble / tot
    assert(recall >= 0.95, f"filtered coarse routing recall $recall%.3f < 0.95")
  }
}
