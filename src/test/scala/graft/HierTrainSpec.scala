package graft

import graft.index.Ivf
import org.apache.spark.sql.functions._

/** Hierarchical IVF training ([[Ivf.trainHierarchical]]) — the scale path
  * for very large cell counts: sqrt(nlist) supers on the driver, per-super
  * sub-clustering inside executor groups. */
class HierTrainSpec extends SparkSpec {
  import spark.implicits._

  test("hierarchical training: deterministic, ~nlist centroids, probe quality near flat") {
    val d = 16; val nPlant = 512; val n = 16384
    val rnd = new java.util.Random(7)
    val centers = Array.fill(nPlant)(Array.fill(d)(rnd.nextGaussian() * 2))
    val rows = (0 until n).map { i =>
      val r = new java.util.Random(i * 37L + 3)
      val c = centers(i % nPlant)
      (i.toLong, Seq.tabulate(d)(j => c(j) + r.nextGaussian() * 0.5))
    }
    val df = rows.toDF("id", "vec").repartition(8).cache()
    df.count()
    val nlist = 256
    val hier = Ivf.trainHierarchical(df, "vec", nlist, "COSINE", iters = 4, seed = 5L)
    val hier2 = Ivf.trainHierarchical(df, "vec", nlist, "COSINE", iters = 4, seed = 5L)
    assert(hier.centroids.map(_.toSeq).toSeq == hier2.centroids.map(_.toSeq).toSeq,
      "hierarchical training must be deterministic (order-insensitive sampling)")
    assert(math.abs(hier.centroids.length - nlist) <= nlist / 8,
      s"centroid count ${hier.centroids.length} too far from requested $nlist")

    // downstream contract: probe-set DATA recall within tolerance of the
    // flat-trained model on the same corpus (same bar shape as
    // CoarseAssignSpec — probe sets matter through the data they reach)
    val flat = Ivf.train(df, "vec", nlist, "COSINE", iters = 4, seed = 5L)
    val vecs = rows.map(_._2.toArray).toArray
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dd = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < d) { dd += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1 }
      dd / math.sqrt(na * nb)
    }
    def probeRecall(m: Ivf.IvfModel): Double = {
      val cell = vecs.map(m.assignOne)
      var hit = 0; var tot = 0
      (0 until 50).foreach { qi =>
        val q = vecs(qi * 311 % n)
        val truth = vecs.indices.sortBy(i => (-cos(q, vecs(i)), i)).take(10)
        val probed = m.nearestClusters(q, 8).toSet
        truth.foreach { t => tot += 1; if (probed(cell(t))) hit += 1 }
      }
      hit.toDouble / tot
    }
    val (recH, recF) = (probeRecall(hier), probeRecall(flat))
    info(f"probe data recall: hier $recH%.4f vs flat $recF%.4f " +
      s"(cells: ${hier.centroids.length} vs ${flat.centroids.length})")
    assert(recH >= 0.9, f"hierarchical probe recall $recH%.4f < 0.9")
    assert(recH >= recF - 0.05,
      f"hierarchical recall $recH%.4f lags flat $recF%.4f by > 0.05")
  }

  test("train() delegates to hierarchical above the threshold") {
    val saved = Ivf.HierTrainCells
    Ivf.HierTrainCells = 64
    try {
      val rnd = new java.util.Random(9)
      val df = (0 until 4096).map(i =>
        (i.toLong, Seq.fill(8)(rnd.nextGaussian()))).toDF("id", "vec")
      val m = Ivf.train(df, "vec", 128, "EUCLIDEAN")
      // hierarchical path produces ~nlist centroids and a usable model
      assert(math.abs(m.centroids.length - 128) <= 16)
      val v = Array.fill(8)(0.5)
      assert(m.assignOne(v) >= 0 && m.assignOne(v) < m.centroids.length)
      assert(m.nearestClusters(v, 4).length == 4)
    } finally Ivf.HierTrainCells = saved
  }
}
