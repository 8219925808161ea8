package graft.tools

import graft.Tables
import graft.index.Ivf
import graft.operators.{KnnExact, TopK}
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iteration aid: time Ivf.knnJoin variants at a given scale dir to pick the
  * bench configuration on measurements instead of guesses. Not part of the
  * driver contract. */
object IvfProbe {

  private def time(f: => Long): (Long, Double) = {
    val t0 = System.nanoTime()
    val n = f
    (n, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir).cache()
    println(s"rows=${emb.count()}")

    def run(name: String, nlist: Int, nprobe: Int, salt: Int): Unit = {
      val model = Ivf.train(emb, "embedding", nlist = nlist, metric = "COSINE")
      val df = Ivf.knnJoin(emb, emb, model, nprobe = nprobe, topK = 5,
        leftId = "vec_id", leftVec = "embedding",
        rightId = "vec_id", rightVec = "embedding", excludeSelf = true,
        saltBuckets = salt)
      df.count() // warmup
      val ts = (1 to 2).map(_ => time(df.count())._2)
      println(f"$name%-28s nlist=$nlist nprobe=$nprobe salt=$salt  avg=${ts.sum / ts.length}%.2fs")
    }

    run("r2_config", 16, 8, 8)
    run("r3_config", 16, 12, 8)
    run("r3_nosalt", 16, 12, 1)
    run("nlist64_np24", 64, 24, 8)
    run("nlist64_np24_nosalt", 64, 24, 1)
    run("nlist64_np16", 64, 16, 8)
    spark.stop()
  }
}
