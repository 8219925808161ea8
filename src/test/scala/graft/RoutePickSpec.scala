package graft

import graft.index.{Ann, Vamana}
import org.scalatest.funsuite.AnyFunSuite

/** [[Ann.pickSegments]] (bounded-heap routing selection) must be
  * drop-in equivalent to the full per-query centroid sort it replaced —
  * same picks, same order — for both the unfiltered top-eff route and the
  * accepted-mass walk, across metrics and edge shapes. */
class RoutePickSpec extends AnyFunSuite {

  private def mkCents(n: Int, d: Int, seed: Long): Array[(String, Array[Float])] = {
    val rnd = new java.util.Random(seed)
    Array.tabulate(n)(i => (f"seg_$i%05d", Array.fill(d)(rnd.nextGaussian().toFloat)))
      .sortBy(_._1)
  }

  /** The historical implementation: full sort by (-score, name), then
    * take-eff / accepted-mass walk. Scores compared at FLOAT precision to
    * match the packed-long representation. */
  private def refPick(q: Array[Float], metric: String,
      cents: Array[(String, Array[Float])], eff: Int, base: Int, want: Long,
      perSeg: Map[String, Long]): Seq[String] = {
    val ranked = cents
      .map { case (s, c) => (s, Vamana.similarity(metric, q, c).toFloat) }
      .sortBy { case (s, sc) => (-sc, s) }
    if (perSeg == null) ranked.take(eff).map(_._1).toSeq
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var acc = 0L
      val it = ranked.iterator
      while (it.hasNext && (acc < want || out.length < base)) {
        val (s, _) = it.next()
        val cAcc = perSeg.getOrElse(s, 0L)
        if (cAcc > 0L) { out += s; acc += cAcc }
      }
      out.toSeq
    }
  }

  private def eligibleOf(cents: Array[(String, Array[Float])],
      perSeg: Map[String, Long]): Array[Int] =
    cents.indices.filter(i => perSeg.getOrElse(cents(i)._1, 0L) > 0L).toArray

  test("unfiltered: heap selection == full sort, all metrics, several eff") {
    val cents = mkCents(257, 16, seed = 11)
    val rnd = new java.util.Random(42)
    for (metric <- Seq("COSINE", "EUCLIDEAN", "DOT"); eff <- Seq(1, 16, 100, 257); _ <- 0 until 5) {
      val q = Array.fill(16)(rnd.nextGaussian().toFloat)
      val got = Ann.pickSegments(q, metric, cents, eff, base = eff, want = 0L,
        perSeg = null, eligible = null)
      val want = refPick(q, metric, cents, eff, base = eff, want = 0L, perSeg = null)
      assert(got.toSeq === want, s"metric=$metric eff=$eff")
    }
  }

  test("accepted-mass walk: heap selection == full-ranking walk") {
    val cents = mkCents(200, 12, seed = 3)
    val rnd = new java.util.Random(7)
    // masses: ~40% zero cells, heavy-tailed positives
    val perSeg: Map[String, Long] = cents.map { case (s, _) =>
      s -> (if (rnd.nextDouble() < 0.4) 0L else (rnd.nextInt(50) + 1).toLong)
    }.toMap
    val eligible = eligibleOf(cents, perSeg)
    for (wantK <- Seq(10, 40); base <- Seq(5, 14); _ <- 0 until 8) {
      val q = Array.fill(12)(rnd.nextGaussian().toFloat)
      val w = 4L * wantK
      val got = Ann.pickSegments(q, "COSINE", cents, eff = base, base = base,
        want = w, perSeg = perSeg, eligible = eligible)
      val ref = refPick(q, "COSINE", cents, eff = base, base = base, want = w,
        perSeg = perSeg)
      assert(got.toSeq === ref, s"wantK=$wantK base=$base")
    }
  }

  test("accepted-mass walk: fewer eligible cells than base picks them all") {
    val cents = mkCents(64, 8, seed = 5)
    val rnd = new java.util.Random(9)
    val keep = cents.map(_._1).take(3).toSet // only 3 eligible cells
    val perSeg: Map[String, Long] =
      cents.map { case (s, _) => s -> (if (keep(s)) 2L else 0L) }.toMap
    val eligible = eligibleOf(cents, perSeg)
    val q = Array.fill(8)(rnd.nextGaussian().toFloat)
    val got = Ann.pickSegments(q, "COSINE", cents, eff = 8, base = 8,
      want = 400L, perSeg = perSeg, eligible = eligible)
    val ref = refPick(q, "COSINE", cents, eff = 8, base = 8, want = 400L,
      perSeg = perSeg)
    assert(got.toSeq === ref)
    assert(got.toSet === keep, "must pick every eligible cell when base is unreachable")
  }

  test("hoisted cosine norms + parallel routePick are bit-identical to the scalar path") {
    val cents = mkCents(300, 24, seed = 21)
    val rnd = new java.util.Random(13)
    val qs = Array.fill(50)(Array.fill(24)(rnd.nextGaussian().toFloat))
    val got = Ann.routePick(qs, "COSINE", cents, eff = 18, base = 18, want = 0L,
      perSeg = null, eligible = null)
    qs.indices.foreach { i =>
      val ref = refPick(qs(i), "COSINE", cents, eff = 18, base = 18, want = 0L, perSeg = null)
      assert(got(i).toSeq === ref, s"query $i")
    }
  }

  test("single-cell and empty-eligible edges") {
    val cents = mkCents(1, 4, seed = 1)
    val q = Array.fill(4)(0.5f)
    assert(Ann.pickSegments(q, "COSINE", cents, eff = 3, base = 3, want = 0L,
      perSeg = null, eligible = null).toSeq === Seq(cents(0)._1))
    val perSeg = Map(cents(0)._1 -> 0L)
    assert(Ann.pickSegments(q, "COSINE", cents, eff = 1, base = 1, want = 40L,
      perSeg = perSeg, eligible = Array.emptyIntArray).isEmpty)
  }
}
