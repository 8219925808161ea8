package graft.tools

import graft.sources.Fvecs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale demonstration for the fvecs DataSource V2 (not part of the
  * driver's Bench contract): one ~260 MB fvecs file (1M x 64d) — the shape
  * where the format's design choices matter:
  *
  *   - record-aligned splitting: the single file scans as ~9 parallel
  *     slices at maxPartitionBytes=32m (a raw `binaryRecords` reader would
  *     be one task);
  *   - byte-level column pruning: count(*) / id-only scans enumerate
  *     offsets without reading vector bytes;
  *   - planning-time id-range pruning: a 1% id slice plans (and reads)
  *     ~1% of the file, no data pass to find it.
  *
  * Prints one JSON line with wall seconds per scan shape + the planned
  * split counts.
  */
object ScaleVecsBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000000
    val dim = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("graft_scale_vecs").toString
    val path = s"$tmp/base.fvecs"
    // deterministic LCG vectors, written streaming (no 1M-array in memory)
    val w0 = System.nanoTime()
    Fvecs.writeFvecs(path, Iterator.tabulate(n) { i =>
      var s = i * 6364136223846793005L + 1442695040888963407L
      Array.fill(dim) {
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 40) & 0xffff) / 65536.0f - 0.5f
      }
    })
    val writeSec = (System.nanoTime() - w0) / 1e9
    val fileMb = new java.io.File(path).length() / 1e6

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val df = spark.read.format("fvecs").load(path)
    val fullSplits = df.rdd.getNumPartitions
    spark.range(1000).select(sum("id")).head() // scheduler/codegen warmup

    // id-only: enumeration, no vector bytes
    val (cnt, countSec) = timed(df.count())

    // full scan: every vector byte decoded, split-parallel
    val (_, scanSec) = timed(
      df.agg(sum(element_at(col("vec"), 1))).head())

    // 1% id-range slice: pruned at PLANNING time
    val lo = n / 2
    val hi = lo + n / 100
    val prunedDf = spark.read.format("fvecs").load(path)
      .filter(col("id") >= lo && col("id") < hi)
    val prunedSplits = prunedDf.rdd.getNumPartitions
    val (prunedCnt, prunedSec) = timed(
      prunedDf.agg(count(lit(1)), sum(element_at(col("vec"), 1))).head().getLong(0))

    println(s"""{"metric":"scale_vecs","n":$n,"dim":$dim,"file_mb":${math.round(fileMb)},""" +
      s""""write_sec":${f"$writeSec%.2f"},"full_splits":$fullSplits,""" +
      s""""count_sec":${f"$countSec%.3f"},"count_ok":${cnt == n},""" +
      s""""scan_sec":${f"$scanSec%.2f"},""" +
      s""""pruned_splits":$prunedSplits,"pruned_rows":$prunedCnt,""" +
      s""""pruned_sec":${f"$prunedSec%.3f"},"pruned_ok":${prunedCnt == n / 100}}""")
    spark.stop()
  }
}
