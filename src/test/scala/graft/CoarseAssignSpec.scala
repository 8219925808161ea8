package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.Ivf

/** Two-level IVF assignment/probing ([[Ivf.IvfModel.coarseLevel]]): exact
  * below Ivf.CoarseAssignCells (bounded top-n pinned against the full-sort
  * contract), coarse pool above it (agreement pinned on a clustered
  * corpus). Pure driver-side. */
class CoarseAssignSpec extends AnyFunSuite {

  private val d = 24
  private def mkCentroids(n: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)(Array.fill(d)(rnd.nextGaussian() * 2))
  }

  test("bounded top-n probing matches the full-sort contract exactly (all metrics)") {
    val cents = mkCentroids(200, 31) // below any threshold: exact path
    val rnd = new java.util.Random(32)
    for (metric <- Seq("COSINE", "EUCLIDEAN", "DOT")) {
      val m = Ivf.IvfModel(metric, cents)
      (0 until 50).foreach { _ =>
        val v = Array.fill(d)(rnd.nextGaussian())
        val want = cents.indices
          .map(c => (c, m.simTo(v, c)))
          .sortBy { case (c, s) => (-s, c) }
          .take(8).map(_._1).toSeq
        assert(m.nearestClusters(v, 8).toSeq == want,
          s"bounded top-n must equal the full sort under $metric")
        assert(m.assignOne(v) == want.head)
      }
    }
  }

  test("coarse assignment: pool path agrees with exact on a clustered corpus") {
    val saved = Ivf.CoarseAssignCells
    Ivf.CoarseAssignCells = 512
    try {
      val nc = 4096 // pool (512) is 12.5% of the set — the coarse path earns its keep
      val cents = mkCentroids(nc, 41)
      val coarseModel = Ivf.IvfModel("COSINE", cents)
      assert(coarseModel.coarseLevel.isDefined, "coarse level must build at >= threshold")
      Ivf.CoarseAssignCells = Int.MaxValue
      val exactModel = Ivf.IvfModel("COSINE", cents)
      assert(exactModel.coarseLevel.isEmpty)
      // clustered rows (the corpus shape an IVF layout exists for): near a
      // centroid plus noise. Assignment agreement is pinned directly; probe
      // QUALITY is pinned the way it matters downstream — recall of the
      // true nearest DATA through the probe set (a raw probe-SET overlap
      // bar fails on pure-noise centroid rankings whose tail is non-local
      // by construction, while the cells those tails point at hold no
      // preferentially-near data).
      val rnd = new java.util.Random(42)
      var agree = 0
      val n = 2000
      val rows = Array.tabulate(8 * nc) { i =>
        val c = cents(i % nc)
        Array.tabulate(d)(j => c(j) + rnd.nextGaussian() * 0.5)
      }
      val rowCell = rows.map(exactModel.assignOne) // both models agree >= 0.99
      (0 until n).foreach { _ =>
        val c = cents(rnd.nextInt(nc))
        val v = Array.tabulate(d)(j => c(j) + rnd.nextGaussian() * 0.5)
        if (coarseModel.assignOne(v) == exactModel.assignOne(v)) agree += 1
      }
      assert(agree.toDouble / n >= 0.99,
        f"coarse assignment agreement ${agree.toDouble / n}%.4f < 0.99")
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var dd = 0.0; var na = 0.0; var nb = 0.0; var j = 0
        while (j < d) { dd += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1 }
        dd / math.sqrt(na * nb)
      }
      var hitC = 0; var hitE = 0; var tot = 0
      (0 until 100).foreach { qi =>
        val q = rows(qi * 317 % rows.length)
        val truth = rows.indices.sortBy(i => (-cos(q, rows(i)), i)).take(10)
        val probedC = coarseModel.nearestClusters(q, 8).toSet
        val probedE = exactModel.nearestClusters(q, 8).toSet
        truth.foreach { t =>
          tot += 1
          if (probedC(rowCell(t))) hitC += 1
          if (probedE(rowCell(t))) hitE += 1
        }
      }
      val (recC, recE) = (hitC.toDouble / tot, hitE.toDouble / tot)
      info(f"probe-set data recall: coarse $recC%.4f vs exact $recE%.4f")
      assert(recC >= 0.95, f"coarse probe data recall $recC%.4f < 0.95")
      assert(recC >= recE - 0.02,
        f"coarse probe recall $recC%.4f lags exact $recE%.4f by > 0.02")
      // assignOne == nearestClusters(v, 1).head on the coarse path: both
      // draw the SAME CoarsePoolBase pool, so the head contract holds by
      // construction — pinned here because with different pool sizes it
      // silently broke (assignOne's former 32-member pool could disagree)
      (0 until 500).foreach { _ =>
        val v = Array.fill(d)(rnd.nextGaussian() * 2) // UNSTRUCTURED query
        assert(coarseModel.assignOne(v) == coarseModel.nearestClusters(v, 1).head,
          "assignOne must equal nearestClusters(v,1).head on the coarse path")
      }
      // determinism: the structure is seeded — two models agree exactly
      val coarseModel2 = {
        Ivf.CoarseAssignCells = 512
        Ivf.IvfModel("COSINE", cents)
      }
      assert(coarseModel.coarseLevel.get._2.map(_.toSeq).toSeq ==
        coarseModel2.coarseLevel.get._2.map(_.toSeq).toSeq)
    } finally Ivf.CoarseAssignCells = saved
  }
}
