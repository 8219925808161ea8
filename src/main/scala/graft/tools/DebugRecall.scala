package graft.tools

import graft.Tables
import graft.index.Ivf
import graft.operators.{KnnExact, Metrics, NVQ, PQ, TopK}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev aid: prints the raw quality metrics behind each gate entry so gate
  * thresholds can be set with margin (not committed to the driver flow). */
object DebugRecall {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val k = 10
    val exact = KnnExact.knn(emb, q, k, "COSINE", "vec_id", "embedding").cache()
    def rec(df: org.apache.spark.sql.DataFrame, kk: Int = k) =
      Metrics.recallAtK(df, if (kk == k) exact else KnnExact.knn(emb, q, kk, "COSINE", "vec_id", "embedding"), kk)
        .head().getDouble(0)

    for (np <- Seq(8, 12, 16, 20)) {
      val ivf32 = Ivf.train(emb, "embedding", nlist = 32, metric = "COSINE")
      val ivfRes = Ivf.search(Ivf.assign(emb, "embedding", ivf32), q, ivf32, nprobe = np,
        topK = k, baseId = "vec_id", baseVec = "embedding")
      println(s"### n=$n ivf_knn(nlist=32,nprobe=$np) recall=${rec(ivfRes)}")
    }

    val ivf16 = Ivf.train(emb, "embedding", nlist = 16, metric = "COSINE")
    def joinRes0(np: Int) = Ivf.knnJoin(emb, emb, ivf16, nprobe = np, topK = 5,
      leftId = "vec_id", leftVec = "embedding", rightId = "vec_id",
      rightVec = "embedding", excludeSelf = true, saltBuckets = 8)
    val joinRes = joinRes0(8)
    val b = emb.select(col("vec_id").cast("long").as("__nid"), col("embedding").as("__vec"))
    val qq = emb.select(col("vec_id").cast("long").as("__qid"), col("embedding").as("__qvec"))
    val agg = TopK.udf(5)
    val exactJoin = b.crossJoin(broadcast(qq)).filter(col("__nid") =!= col("__qid"))
      .withColumn("__score", graft.functions.VectorFunctions.cosineSim(col("__vec"), col("__qvec")))
      .groupBy(col("__qid").as("qid"))
      .agg(agg(col("__nid"), col("__score")).as("t"))
      .select(col("qid"), posexplode(col("t")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"), col("col._1").as("nid"))
    for (np <- Seq(8, 10, 12)) {
      println(s"### ivf_knn_join(nlist=16,nprobe=$np) recall=${Metrics.recallAtK(joinRes0(np), exactJoin, 5).head().getDouble(0)}")
    }

    val pqm = PQ.train(emb, "embedding", 8, 64)
    for (rk <- Seq(40, 80, 100, 150)) {
      val pqRes = PQ.knn(PQ.encode(emb, "embedding", pqm), q, pqm, topK = k, rerankK = rk,
        metric = "COSINE", baseId = "vec_id", baseVec = "embedding")
      println(s"### pq_adc(m=8,k=64,rerank=$rk) recall=${rec(pqRes)}")
    }

    val nvqm = NVQ.train(emb, "embedding")
    val nvqRes = NVQ.knn(NVQ.encode(emb, "embedding", nvqm), q, nvqm, topK = k,
      rerankK = 4 * k, metric = "COSINE", baseId = "vec_id", baseVec = "embedding")
    println(s"### nvq_knn recall=${rec(nvqRes)}")
    spark.stop()
  }
}
