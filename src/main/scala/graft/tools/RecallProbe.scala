package graft.tools

import graft.index.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Absolute-recall sweep over an EXISTING MsegProfile tree: reconstructs
  * the deterministic corpus/queries from (n, segs) and reports routed +
  * exhaustive recall@10 against the brute-force oracle at several ef —
  * separates "the graph needs a bigger beam" from "the graph is bad".
  *
  * Run: sbt "runMain graft.tools.RecallProbe <indexPath> [n] [segs] [threads]"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val n = if (args.length > 1) args(1).toInt else 1 << 22
    val segs = if (args.length > 2) args(2).toInt else 64
    val threads = if (args.length > 3) args(3).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    val rnd = new java.util.Random(9)
    val centers = Array.fill(segs)(Array.fill(dim)(rnd.nextGaussian().toFloat * 2f))
    val centersB = spark.sparkContext.broadcast(centers)
    def vecOf(i: Long): Array[Float] = {
      val r = new java.util.Random(i * 2654435761L)
      val c = centersB.value((i % segs).toInt)
      Array.tabulate(dim)(j => c(j) + r.nextGaussian().toFloat)
    }
    val df = spark.range(0, n, 1, threads).map(i => (i, vecOf(i).toSeq)).toDF("id", "vec")
    val queries = (0 until 50).map { i =>
      val id = i.toLong * (n / 50) + 7
      (id, vecOf(id).toSeq)
    }.toDF("qid", "qvec")
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64)
    Ann.pin(spark, path)
    val want = graft.operators.KnnExact.knn(df, queries, 10, "COSINE").cache()
    val wantN = want.count()
    for (ef <- Seq(64, 128, 256, 512); probe <- Seq(Ann.AutoProbe, 0)) {
      val got = Ann.searchIndex(spark, path, queries, 10, ef = ef, params,
        probeSegments = probe)
      val hit = got.select("qid", "nid")
        .join(want.select("qid", "nid"), Seq("qid", "nid"), "left_semi").count()
      val tag = if (probe == 0) "exh" else "routed"
      System.err.println(f"[recall] ef=$ef%-4d $tag%-6s recall@10 ${hit.toDouble / wantN}%.3f")
    }
    Ann.unpin(path)
    spark.stop()
  }
}
