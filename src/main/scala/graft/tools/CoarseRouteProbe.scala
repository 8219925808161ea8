package graft.tools

import graft.index.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** END-TO-END validation of two-level coarse routing on a REAL clustered
  * tree at a cell count where it engages (>= Ann.CoarseRouteCells):
  * builds an n x `cells` clustered index, then A/Bs the ROUTED serving
  * path with coarse routing on vs off (flat exact centroid scan) inside
  * one JVM — recall_abs vs a brute-force oracle, routed batch wall, and
  * the driver's routing step timed on its own. RoutingScaleMicro validates
  * pick-level recall on planted shapes; this probe closes the loop through
  * the actual beam + merge.
  *
  * Run: sbt "runMain graft.tools.CoarseRouteProbe [n] [cells] [threads]"
  */
object CoarseRouteProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1 << 18)
    val cells = args.lift(1).map(_.toInt).getOrElse(4096)
    val threads = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-coarse-route-probe")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    val rnd = new java.util.Random(11)
    val centers = Array.fill(cells)(Array.fill(dim)(rnd.nextGaussian().toFloat * 2f))
    val centersB = spark.sparkContext.broadcast(centers)
    def vecOf(i: Long): Array[Float] = {
      val r = new java.util.Random(i * 2654435761L)
      val c = centersB.value((i % cells).toInt)
      Array.tabulate(dim)(j => c(j) + r.nextGaussian().toFloat)
    }
    val df = spark.range(0, n, 1, threads).map(i => (i, vecOf(i).toSeq)).toDF("id", "vec")
    val params = graft.index.Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64)
    // arg 4: fixed base dir — reuse an existing build (routing-constant
    // iteration shouldn't pay a rebuild)
    val path = args.lift(3).map(_ + "/idx").getOrElse(
      java.nio.file.Files.createTempDirectory("graft_crprobe").toString + "/idx")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_clustered"))) {
      val t0 = System.nanoTime()
      Ann.buildIndexClustered(df, path, params, nlist = cells)
      System.err.println(f"[crprobe] build ${(System.nanoTime() - t0) / 1e9}%.1fs " +
        s"(n=$n cells=$cells)")
    } else System.err.println(s"[crprobe] reusing index at $path")
    Ann.pin(spark, path)

    val nQ = 200
    val queries = (0 until nQ).map { i =>
      val id = i.toLong * (n / nQ) + 7
      (id, vecOf(id).toSeq)
    }.toDF("qid", "qvec").cache()
    queries.count()
    val truth = graft.operators.KnnExact.knn(df, queries, 10, "COSINE").cache()
    val truthN = truth.count()
    // filtered arm: id % 3 == 0 accept-list (uncorrelated with cells when
    // cells % 3 != 0; adjusts routing to the accepted-mass walk)
    val accepts = df.filter(col("id") % 3 === 0).select("id").cache()
    accepts.count()
    val truthF = graft.operators.KnnExact.knn(df.filter(col("id") % 3 === 0),
      queries, 10, "COSINE").cache()
    val truthFN = truthF.count()

    def recallOf(got: org.apache.spark.sql.DataFrame,
        want: org.apache.spark.sql.DataFrame, wantN: Long): Double =
      got.select("qid", "nid").join(want.select("qid", "nid"),
        Seq("qid", "nid"), "left_semi").count().toDouble / wantN

    for (arm <- Seq("coarse", "flat")) {
      Ann.CoarseRouteCells = if (arm == "coarse") 4096 else Int.MaxValue
      Ann.clearSegmentCache() // drop memoized routing structures between arms
      Ann.unpin(path); Ann.pin(spark, path)
      // warm plans + caches
      Ann.searchIndex(spark, path, queries, 10, ef = 64, params,
        probeSegments = Ann.AutoProbe).count()
      val tb = System.nanoTime()
      val got = Ann.searchIndex(spark, path, queries, 10, ef = 64, params,
        probeSegments = Ann.AutoProbe)
      val rec = recallOf(got, truth, truthN)
      val wall = (System.nanoTime() - tb) / 1e9
      // filtered routed arm (pick-level timing lives in RoutingScaleMicro;
      // this probe reports end-to-end walls only)
      Ann.searchIndex(spark, path, queries, 10, ef = 64, params,
        probeSegments = Ann.AutoProbe, accepts = Some(accepts)).count()
      val tf = System.nanoTime()
      val gotF = Ann.searchIndex(spark, path, queries, 10, ef = 64, params,
        probeSegments = Ann.AutoProbe, accepts = Some(accepts))
      val recF = recallOf(gotF, truthF, truthFN)
      val wallF = (System.nanoTime() - tf) / 1e9
      System.err.println(f"[crprobe] $arm%-6s recall_abs=$rec%.4f batch=${wall}%.2fs " +
        f"filtered_recall=$recF%.4f filtered_batch=${wallF}%.2fs")
    }
    Ann.unpin(path)
    spark.stop()
  }
}
