package graft.tools

import graft.index.Ivf
import graft.operators.{PQ, TopK}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement for the IVF+PQ layout's IO claim: on identical probed
  * searches, how many bytes does the candidate stage actually read from
  * parquet when it scans (id, pq_code) on a [[Ivf.writePartitionedPQ]]
  * layout vs (id, vec) on a [[Ivf.writePartitioned]] layout? Bytes come
  * from Hadoop's JVM-wide FileSystem read statistics, so compression and
  * column pruning are measured, not claimed. Not part of the driver flow.
  *
  * Run: IvfPqMicro [nRows] [dim] [nQueries]
  */
object IvfPqMicro {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 500000
    val dim = if (args.length > 1) args(1).toInt else 64
    val nq = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Hadoop FS statistics and task input metrics both miss the vectorized
    // reader's data-page reads on local files (they count ~footers only);
    // /proc/self/io rchar counts every read() byte this JVM issues —
    // local-mode executors share the JVM, so per-stage deltas are exact
    // (modulo unrelated background reads, which the deltas dwarf)
    def fsBytesRead(): Long =
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/self/io"))
        .stream().filter(_.startsWith("rchar:")).findFirst()
        .map[Long](l => l.split("\\s+")(1).toLong).orElse(0L)
    def measure(label: String)(body: => Long): Unit = {
      val b0 = fsBytesRead()
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      val db = fsBytesRead() - b0
      println(f"### $label%-28s rows=$rows%8d bytesRead=$db%12d (${db / 1e6}%8.1f MB) $sec%6.2fs")
    }

    val rnd = new scala.util.Random(7)
    val rows = (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1).map(_.toDouble))
    }
    val base = spark.sparkContext.parallelize(rows, 16).toDF("id", "vec").cache()
    base.count()
    val queries = rows.take(nq).map { case (i, v) => (i, v) }.toSeq.toDF("qid", "qvec").cache()
    queries.count()

    val model = Ivf.train(base, "vec", nlist = 64, metric = "COSINE")
    val pq = PQ.train(base, "vec", m = 8)
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq_micro").toString
    Ivf.writePartitioned(base, "vec", model, s"$tmp/plain")
    // small pages emulate a production page:cluster ratio (a 10^9-row
    // cluster has ~thousands of default-size pages; this n has ~4) so the
    // survivor-id page-skip contrast below is visible at micro scale
    Ivf.writePartitionedPQ(base, "vec", model, pq, s"$tmp/pq", options = Map(
      "parquet.page.size" -> (16 * 1024).toString,
      "parquet.page.row.count.limit" -> "32"))
    base.unpersist()

    val nprobe = 8
    val qRows = queries.select(col("qid").cast("long"), col("qvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probePairs = qRows.flatMap { case (qid, qv) =>
      model.nearestClusters(qv, nprobe).map(c => (qid, c))
    }
    val probed = probePairs.map(_._2).distinct.sorted
    def prunedScan(path: String) = spark.read.parquet(path)
      .filter(col("cluster_id").isin(probed.map(Integer.valueOf).toSeq: _*))
    val probesDf = probePairs.toSeq.toDF("qid", "cluster_id")

    println(s"### probed clusters: ${probed.length}/64 (candidate-stage contrast is " +
      "per-COLUMN bytes; directory pruning is gated separately in ivf_pruned)")

    // the candidate TopK output must be consumed via explode — a bare
    // count() on the groupBy lets Catalyst prune the aggregate (and with
    // it the vec/code columns), which silently measures a qid-only scan
    measure("candidates full-res") {
      val agg = TopK.udf(80)
      prunedScan(s"$tmp/plain")
        .select(col("id").cast("long").as("__nid"), col("cluster_id"), col("vec"))
        .join(broadcast(probesDf), "cluster_id")
        .join(broadcast(queries), "qid")
        .withColumn("__approx",
          graft.functions.VectorFunctions.cosineSim(col("vec"), col("qvec")))
        .groupBy("qid").agg(agg(col("__nid"), col("__approx")).as("t"))
        .select(col("qid"), explode(col("t._1")))
        .count()
    }

    // candidate stage, PQ layout: reads only the code column
    measure("candidates pq codes") {
      val agg = TopK.udf(80)
      prunedScan(s"$tmp/pq")
        .select(col("id").cast("long").as("__nid"), col("cluster_id"), col("pq_code"))
        .join(broadcast(probesDf), "cluster_id")
        .join(PQ.adcQueryFrame(spark, qRows, pq), "qid")
        .withColumn("__approx", PQ.adcApproxScore(model.metric, pq, "pq_code"))
        .groupBy("qid").agg(agg(col("__nid"), col("__approx")).as("t"))
        .select(col("qid"), explode(col("t._1")))
        .count()
    }

    // rerank-phase contrast: phase 2 with the survivor-id set pushed into
    // parquet (id-sorted range-partitioned files → row-group/page skipping)
    // vs the join-filtered fallback that re-reads every probed vec page.
    // Small batch (5 queries) models serving; the full batch above models
    // analytics where survivors cover every page anyway.
    val qSmall = queries.limit(5).cache(); qSmall.count()
    measure("ivfpq rk=80 nq=5 idpush") {
      Ivf.searchPartitionedPQ(s"$tmp/pq", qSmall, model, pq, nprobe,
        topK = 10, rerankK = 80).count()
    }
    measure("ivfpq rk=80 nq=5 nopush") {
      Ivf.searchPartitionedPQ(s"$tmp/pq", qSmall, model, pq, nprobe,
        topK = 10, rerankK = 80, maxPushdownIds = 0).count()
    }

    // end-to-end probed search on each layout
    measure("search full-res e2e") {
      Ivf.searchPartitioned(s"$tmp/plain", queries, model, nprobe, topK = 10).count()
    }
    val exact = graft.operators.KnnExact.knn(base, queries, 10, "COSINE").cache()
    val recPlain = graft.operators.Metrics.recallAtK(
      Ivf.searchPartitioned(s"$tmp/plain", queries, model, nprobe, topK = 10),
      exact, 10).head().getDouble(0)
    for (rk <- Seq(80, 400, 2000)) {
      measure(s"search ivfpq e2e rk=$rk") {
        Ivf.searchPartitionedPQ(s"$tmp/pq", queries, model, pq, nprobe,
          topK = 10, rerankK = rk).count()
      }
      val res = Ivf.searchPartitionedPQ(s"$tmp/pq", queries, model, pq, nprobe,
        topK = 10, rerankK = rk)
      val rec = graft.operators.Metrics.recallAtK(res, exact, 10).head().getDouble(0)
      println(f"### recall@10 ivfpq(rk=$rk%4d)=$rec%.4f full-res=$recPlain%.4f (same probes)")
    }
    spark.stop()
  }
}
