package graft.tools

import graft.{Tables}
import graft.index.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B micro for the bench's pinned two-phase headline: builds the same
  * pqM=8 flat tree Bench builds from the sf embeddings table, pins it, and
  * loops searchIndex (gathered and fused) reporting best-of batch walls.
  * args: [passes] */
object TwoPhaseMicro {
  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 12
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir).cache(); emb.count()
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec")).cache()
    val nq = queries.count()
    val params = Ann.Params(metric = "COSINE", maxDegree = 32, beamWidth = 100, pqM = 8)
    val path = java.nio.file.Files.createTempDirectory("graft_tp_micro").toString + "/idx"
    Ann.buildIndex(emb, path, params, "vec_id", "embedding")
    Ann.pin(spark, path)
    def run(fused: Boolean): Unit =
      Ann.searchIndex(spark, path, queries, 10, ef = 64, params,
        rerankK = 40, fusedAdc = fused).count()
    (1 to 3).foreach(_ => { run(false); run(true) })
    def t(b: => Unit): Double = { val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
    val g = (1 to passes).map(_ => t(run(false)))
    val f = (1 to passes).map(_ => t(run(true)))
    println(f"[tpmicro] nq=$nq gathered best=${g.min}%.3f med=${g.sorted.apply(passes / 2)}%.3f " +
      f"fused best=${f.min}%.3f med=${f.sorted.apply(passes / 2)}%.3f qps_g=${nq / g.min}%.1f qps_f=${nq / f.min}%.1f")
    spark.stop()
  }
}
