package graft.tools

import graft.Tables
import graft.index.{Ann, Vamana}
import graft.operators.{KnnExact, Metrics, PQ}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev aid for the k=100 sweep-point investigation (BENCH_r04
  * k100oq2_recall = 0.833 at sf0.1): decomposes the recall loss between
  * beam containment (does the ADC beam's candidate set contain the true
  * top-100 at all?) and ranking noise (it does, but the approx ordering
  * pushes truth below rank rerankK). Not part of the driver flow. */
object K100Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir).cache()
    println(s"### n=${emb.count()} partitions=${emb.rdd.getNumPartitions}")
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec")).cache()
    val params = Ann.Params(pqM = 8)
    val idx = java.nio.file.Files.createTempDirectory("k100probe").toString + "/idx"
    Ann.buildIndex(emb, idx, params, "vec_id", "embedding")
    val segs = spark.read.parquet(idx).select("seg").distinct().count()
    println(s"### segments=$segs")
    val exact100 = KnnExact.knn(emb, queries, 100, "COSINE", "vec_id", "embedding").cache()
    exact100.count()
    def rec(tk: Int, ef: Int, rk: Int, floor: Boolean): Double = {
      val r = Ann.searchIndex(spark, idx, queries, tk, ef = ef, params,
        rerankK = rk, shareRerankFloor = floor)
      Metrics.recallAtK(r, exact100, tk).head().getDouble(0)
    }
    // first (200,200) entry is an intentional warm-up repeat (JIT + cache)
    for ((ef, rk) <- Seq((200, 200), (200, 200), (400, 200), (400, 400), (800, 800), (2000, 2000)))
      println(s"### k=100 ef=$ef rk=$rk floorOn=${rec(100, ef, rk, floor = true)}")
    println(s"### k=100 ef=200 rk=200 floorOFF=${rec(100, 200, 200, floor = false)}")

    // kernel-level containment: single graph over all rows, ADC beam at
    // ef=200 — how many of the true top-100 ids are in the candidate set?
    val rows = emb.select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val g = new Vamana(rows.map(_._2), "COSINE", params.maxDegree, params.beamWidth,
      params.alpha, params.neighborOverflow, params.seed).build()
    val model = PQ.load(spark, s"$idx/_pq_model")
    // NOTE: codes must come from the model actually trained on THIS build
    val codes = rows.map(r => model.encodeOne(r._2.map(_.toDouble)))
    val truth = exact100.collect().groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("nid")).toSet }
    val qArr = queries.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    var contained = 0.0; var exactBeam = 0.0
    qArr.foreach { case (qid, qv) =>
      val qd = qv.map(_.toDouble)
      val (dots, mags) = PQ.adcTables(qd, model)
      var qn = 0.0; qd.foreach(d => qn += d * d)
      val m = model.m; val kk = model.codebooks(0).length
      val approx: Int => Double = { i =>
        var dot = 0.0; var mag = 0.0; var s = 0
        while (s < m) { val c = codes(i)(s); dot += dots(s * kk + c); mag += mags(s * kk + c); s += 1 }
        (1.0 + dot / (math.sqrt(mag) * math.sqrt(qn))) / 2.0
      }
      val cands = g.searchInternalScored(approx, g.entryNode, 200, _ => true)
      val t = truth(qid)
      contained += cands.count(c => t.contains(rows(c._1)._1.toLong)) / 100.0
      val ex = g.search(qv, 100, 200).map(c => rows(c._1)._1)
      exactBeam += ex.count(t.contains) / 100.0
    }
    println(f"### kernel: truth-in-ADC-beam-top200=${contained / qArr.length}%.3f exact-beam-recall@100(ef=200)=${exactBeam / qArr.length}%.3f")
    spark.stop()
  }
}
