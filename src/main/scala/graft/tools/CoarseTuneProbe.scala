package graft.tools

import graft.index.{Ann, CoarseRouter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** One-tree sweep of the coarse-routing pool constants (depth multiplier
  * `Ann.CoarseOverscan`, spill degree `CoarseRouter.Spill`) against the
  * flat-routing arm — REUSES a tree built by CoarseRouteProbe, so each
  * constant combination costs one serving pass, not a rebuild. The r14
  * finding this exists for: at 16384 REAL cells the shipped constants
  * (overscan 4, spill 2) measured end-to-end recall_abs 0.9790 coarse vs
  * 0.9930 flat — outside the ±0.01 parity bar the crossover analysis
  * assumed.
  *
  * Run: sbt "runMain graft.tools.CoarseTuneProbe <n> <cells> <threads> <baseDir>
  *           [centerSeed] [rerankK]"
  * centerSeed 11 (default) matches CoarseRouteProbe trees; 17 matches
  * ClusteredLifecycleProbe trees (whose two-phase serving also wants
  * rerankK=40, the oq4 slack the lifecycle arms use).
  */
object CoarseTuneProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1 << 20)
    val cells = args.lift(1).map(_.toInt).getOrElse(16384)
    val threads = args.lift(2).map(_.toInt).getOrElse(32)
    val base = args.lift(3).getOrElse(
      throw new IllegalArgumentException("pass the CoarseRouteProbe base dir"))
    val centerSeed = args.lift(4).map(_.toLong).getOrElse(11L)
    val rerankK = args.lift(5).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-coarse-tune-probe")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // SAME corpus generator as CoarseRouteProbe (seed 11): the reused tree
    // was built from exactly these vectors
    val dim = 64
    val rnd = new java.util.Random(centerSeed)
    val centers = Array.fill(cells)(Array.fill(dim)(rnd.nextGaussian().toFloat * 2f))
    val centersB = spark.sparkContext.broadcast(centers)
    def vecOf(i: Long): Array[Float] = {
      val r = new java.util.Random(i * 2654435761L)
      val c = centersB.value((i % cells).toInt)
      Array.tabulate(dim)(j => c(j) + r.nextGaussian().toFloat)
    }
    val df = spark.range(0, n, 1, threads).map(i => (i, vecOf(i).toSeq)).toDF("id", "vec")
    val params = graft.index.Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64)
    val path = s"$base/idx"

    val nQ = 200
    val queries = (0 until nQ).map { i =>
      val id = i.toLong * (n / nQ) + 7
      (id, vecOf(id).toSeq)
    }.toDF("qid", "qvec").cache()
    queries.count()
    val truth = graft.operators.KnnExact.knn(df, queries, 10, "COSINE").cache()
    val truthN = truth.count()
    val accepts = df.filter(col("id") % 3 === 0).select("id").cache()
    accepts.count()
    val truthF = graft.operators.KnnExact.knn(df.filter(col("id") % 3 === 0),
      queries, 10, "COSINE").cache()
    val truthFN = truthF.count()

    def recallOf(got: org.apache.spark.sql.DataFrame,
        want: org.apache.spark.sql.DataFrame, wantN: Long): Double =
      got.select("qid", "nid").join(want.select("qid", "nid"),
        Seq("qid", "nid"), "left_semi").count().toDouble / wantN

    // (overscan, spill); (0, _) = the flat arm reference
    val combos = Seq((0, 2), (4, 2), (4, 3), (8, 2), (8, 3), (16, 2), (32, 2))
    for ((os, sp) <- combos) {
      val flat = os == 0
      Ann.CoarseRouteCells = if (flat) Int.MaxValue else 4096
      if (!flat) { Ann.CoarseOverscan = os; CoarseRouter.Spill = sp }
      Ann.clearSegmentCache()
      Ann.unpin(path); Ann.pin(spark, path)
      Ann.searchIndex(spark, path, queries, 10, ef = 64, params,
        probeSegments = Ann.AutoProbe, rerankK = rerankK).count() // warm (also builds the router)
      val tb = System.nanoTime()
      val got = Ann.searchIndex(spark, path, queries, 10, ef = 64, params,
        probeSegments = Ann.AutoProbe, rerankK = rerankK)
      val rec = recallOf(got, truth, truthN)
      val wall = (System.nanoTime() - tb) / 1e9
      Ann.searchIndex(spark, path, queries, 10, ef = 64, params,
        probeSegments = Ann.AutoProbe, rerankK = rerankK, accepts = Some(accepts)).count()
      val tf = System.nanoTime()
      val gotF = Ann.searchIndex(spark, path, queries, 10, ef = 64, params,
        probeSegments = Ann.AutoProbe, rerankK = rerankK, accepts = Some(accepts))
      val recF = recallOf(gotF, truthF, truthFN)
      val wallF = (System.nanoTime() - tf) / 1e9
      val tag = if (flat) "flat" else s"os=$os,sp=$sp"
      System.err.println(f"[crtune] $tag%-10s recall_abs=$rec%.4f batch=${wall}%.2fs " +
        f"filtered_recall=$recF%.4f filtered_batch=${wallF}%.2fs")
    }
    Ann.unpin(path)
    spark.stop()
  }
}
