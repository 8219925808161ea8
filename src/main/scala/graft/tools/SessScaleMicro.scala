package graft.tools

import graft.index.Ann
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Persisted-session behavior at LARGE query counts (r13 verdict #4): the
  * `_big` distributed-split fallback exists and is spec-covered for
  * correctness, but its per-page wall and state growth at the scale that
  * actually triggers it (`Ann.BigSessionRows`) was unmeasured. For each
  * query count this micro opens a session on the same clustered tree and
  * reports: which split path engaged (driver fast path vs `_big`
  * distributed), open wall, per-page walls, and durable state bytes —
  * the distributed path re-adds a fixed shuffle+commit cost per page,
  * which is the right trade only if it stays FLAT with query count while
  * the driver path's collect would have grown without bound.
  *
  * Run: sbt "runMain graft.tools.SessScaleMicro [n] [segs] [threads] [qCounts...]"
  */
object SessScaleMicro {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1 << 20)
    val segs = args.lift(1).map(_.toInt).getOrElse(64)
    val threads = args.lift(2).map(_.toInt).getOrElse(32)
    val qCounts = if (args.length > 3) args.drop(3).map(_.toInt).toSeq
                  else Seq(1000, 10000, 100000)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-sess-scale-micro")
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
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64)
    val path = java.nio.file.Files.createTempDirectory("graft_sessscale").toString + "/idx"
    val t0 = System.nanoTime()
    Ann.buildIndexClustered(df, path, params, nlist = segs)
    System.err.println(f"[sessscale] build ${(System.nanoTime() - t0) / 1e9}%.1fs " +
      s"(n=$n segs=$segs BigSessionRows=${Ann.BigSessionRows})")
    Ann.pin(spark, path)

    val hfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def stateBytes(st: String): (Long, Long, Boolean) = {
      def sz(d: String): Long = {
        val p = new org.apache.hadoop.fs.Path(s"$st/$d")
        if (hfs.exists(p)) hfs.getContentSummary(p).getLength else 0L
      }
      (sz("cursors"), sz("pool"),
        hfs.exists(new org.apache.hadoop.fs.Path(s"$st/_big")))
    }

    for (nq <- qCounts) {
      // query vectors generated EXECUTOR-side would be ideal, but the
      // session API takes a DataFrame and collects (qid, qvec) for its
      // broadcast either way; nq x 64 floats = 26 MB at 10^5 — fine
      val queries = spark.range(0, nq, 1, threads)
        .map(i => (i, vecOf((i * 131 + 7) % n).toSeq)).toDF("qid", "qvec")
      val st = java.nio.file.Files.createTempDirectory(s"graft_sessscale_q$nq").toString + "/st"
      val tOpen = System.nanoTime()
      Ann.openPagedSession(spark, path, st, queries, 10, 64, params).count()
      val openS = (System.nanoTime() - tOpen) / 1e9
      val (cb0, pb0, big0) = stateBytes(st)
      val pages = (1 to 3).map { _ =>
        val tp = System.nanoTime()
        Ann.nextSessionPage(spark, path, st, 10, 64, params).count()
        (System.nanoTime() - tp) / 1e9
      }
      val (cb1, pb1, big1) = stateBytes(st)
      System.err.println(f"[sessscale] nq=$nq%-7d big=[$big0,$big1] open=$openS%6.2fs " +
        f"pages=${pages.map(t => f"$t%.2f").mkString(",")}s " +
        f"state open: cursors=${cb0 / 1e6}%.1fMB pool=${pb0 / 1e6}%.1fMB " +
        f"after3: cursors=${cb1 / 1e6}%.1fMB pool=${pb1 / 1e6}%.1fMB")
      hfs.delete(new org.apache.hadoop.fs.Path(st), true)
    }
    Ann.unpin(path)
    spark.stop()
  }
}
