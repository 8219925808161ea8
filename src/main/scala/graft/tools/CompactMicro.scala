package graft.tools

import graft.index.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Compaction-economics micro: the streaming-maintenance shape at scale —
  * one big CLEAN batch plus small fresh batches and a few tombstones —
  * compacted with `mode="merge"` (same-source adjacency reuse, the
  * reference compactor's design) vs `mode="rebuild"` (full buildIndex).
  * Reports wall time, beam-visited construction work, reused edges, and
  * carried segments, plus a recall check of both outputs against the exact
  * live twin. args: [nBig] [nSmallBatches] [rowsPerSmall] [dim] */
object CompactMicro {
  def main(args: Array[String]): Unit = {
    val nBig = if (args.length > 0) args(0).toInt else 100000
    val nBatches = if (args.length > 1) args(1).toInt else 4
    val perBatch = if (args.length > 2) args(2).toInt else 2000
    val dim = if (args.length > 3) args(3).toInt else 32
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_cmicro").toString
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64,
      segmentRows = 0, buildThreads = 4)
    def vecs(n: Int, offset: Long, seed: Long) = {
      spark.range(n).select((col("id") + offset).as("id"),
        expr(s"transform(sequence(1, $dim), j -> cast(pmod(hash(id, j, $seed), 1000) as float) / 1000.0)").as("vec"))
    }
    def timed[T](name: String)(body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[compact-micro] $name%-18s $s%8.2fs"); (r, s)
    }

    // big clean batch: segments of ~25k rows; small batches: one segment each
    timed(s"build big $nBig") {
      Ann.buildIndex(vecs(nBig, 0, 1).repartition(4), s"$root/idx/batch=0", params)
    }
    (1 to nBatches).foreach { b =>
      Ann.buildIndex(vecs(perBatch, nBig + (b - 1).toLong * perBatch, b + 10L).repartition(1),
        s"$root/idx/batch=$b", params)
    }
    val dels = (nBig.toLong until nBig + 20L).toDF("id")
    val binP = params.copy(segmentRows = nBig / 4 + 1) // big segs carry; smalls share bins

    val (mStats, mSec) = timed("compact merge") {
      Ann.compact(spark, s"$root/idx/*", s"$root/m", binP, Some(dels), mode = "merge")
    }
    val (rStats, rSec) = timed("compact rebuild") {
      Ann.compact(spark, s"$root/idx/*", s"$root/r", binP, Some(dels), mode = "rebuild")
    }
    println(f"[compact-micro] merge:   visited=${mStats.visited}%,d reused=${mStats.reusedEdges}%,d carried=${mStats.carriedSegments}")
    println(f"[compact-micro] rebuild: visited=${rStats.visited}%,d")
    println(f"[compact-micro] work multiple: ${rStats.visited.toDouble / math.max(1L, mStats.visited)}%.1fx, wall ${rSec / mSec}%.1fx")

    // recall parity on 16 queries vs the exact live twin
    val total = nBig + nBatches * perBatch
    val all = vecs(nBig, 0, 1).union(
      (1 to nBatches).map(b => vecs(perBatch, nBig + (b - 1).toLong * perBatch, b + 10L))
        .reduce(_ union _)).cache()
    val live = all.join(dels.select(col("id")), Seq("id"), "left_anti")
    val queries = all.filter(col("id") % (total / 16) === 3)
      .select(col("id").as("qid"), col("vec").as("qvec")).limit(16).cache()
    val exact = graft.operators.KnnExact.knn(live, queries, 10, "COSINE")
    def recall(tree: String): Double = {
      val got = Ann.searchIndex(spark, tree, queries, 10, 64, params)
      graft.operators.Metrics.recallAtK(got, exact, 10).head().getDouble(0)
    }
    println(f"[compact-micro] recall merge=${recall(s"$root/m")}%.3f rebuild=${recall(s"$root/r")}%.3f")
    spark.stop()
  }
}
