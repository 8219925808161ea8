package graft.tools

import graft.index.Ann
import org.apache.spark.sql.SparkSession

/** A/B probe for the bench's mseg clustered build (4M x 64d x 64 cells by
  * default): generates the EXACT corpus Bench.scala generates and times
  * buildIndexClustered alone. args: [n] [runs] */
object MsegBuildProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1 << 22
    val runs = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val ncl = 64
    val rnd = new java.util.Random(9)
    val centers = Array.fill(ncl)(Array.fill(dim)(rnd.nextGaussian().toFloat * 2f))
    import spark.implicits._
    val centersB = spark.sparkContext.broadcast(centers)
    val df = spark.range(0, n, 1, cpus.toInt).map { i =>
      val r = new java.util.Random(i * 2654435761L)
      val c = centersB.value((i % ncl).toInt)
      (i, Seq.tabulate(dim)(j => c(j) + r.nextGaussian().toFloat))
    }.toDF("id", "vec")
    val p = Ann.Params(metric = "COSINE", maxDegree = 32, beamWidth = 64)
    for (r <- 1 to runs) {
      val path = java.nio.file.Files.createTempDirectory("graft_msegprobe").toString + "/idx"
      val t0 = System.nanoTime()
      Ann.buildIndexClustered(df, path, p, nlist = ncl)
      println(f"[msegbuild] run$r n=$n build=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
