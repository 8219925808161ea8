package graft.tools

import graft.index.Ivf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Flat vs hierarchical IVF training at large nlist: wall clock + probe
  * data recall on a planted corpus. Flat single-level k-means needs
  * O(sample * nlist * d) driver work; hierarchical fans the same budget
  * out as sqrt(nlist) independent executor-side sub-clusterings.
  *
  * Run: sbt "runMain graft.tools.TrainScaleMicro [n] [nlist] [threads]"
  */
object TrainScaleMicro {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1 << 20)
    val nlist = args.lift(1).map(_.toInt).getOrElse(16384)
    val threads = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-train-scale")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val d = 32
    val rnd = new java.util.Random(5)
    val centers = Array.fill(nlist)(Array.fill(d)(rnd.nextGaussian() * 2))
    val centersB = spark.sparkContext.broadcast(centers)
    val df = spark.range(0, n, 1, threads).map { i =>
      val r = new java.util.Random(i * 2654435761L)
      val c = centersB.value((i % nlist).toInt)
      (i, Seq.tabulate(d)(j => c(j) + r.nextGaussian() * 0.5))
    }.toDF("id", "vec").cache()
    df.count()

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      System.err.println(f"[trainscale] $label ${(System.nanoTime() - t0) / 1e9}%.1fs")
      a
    }
    val hier = timed(s"hier  nlist=$nlist")(
      Ivf.trainHierarchical(df, "vec", nlist, "COSINE"))
    System.err.println(s"[trainscale] hier centroids=${hier.centroids.length}")
    val savedH = Ivf.HierTrainCells
    Ivf.HierTrainCells = Int.MaxValue // force the flat path for the A/B
    val flat =
      try timed(s"flat  nlist=$nlist")(Ivf.train(df, "vec", nlist, "COSINE"))
      finally Ivf.HierTrainCells = savedH

    // probe data recall (50 queries, nprobe = ceil(sqrt(nlist))/4 floored
    // at 8): fraction of true top-10 whose assigned cell is probed
    val qs = (0 until 50).map { i =>
      val id = i.toLong * (n / 50) + 3
      val r = new java.util.Random(id * 2654435761L)
      val c = centers((id % nlist).toInt)
      Array.tabulate(d)(j => c(j) + r.nextGaussian() * 0.5f)
    }
    val nprobe = math.max(8, math.ceil(math.sqrt(nlist.toDouble)).toInt / 4)
    def recallOf(m: Ivf.IvfModel): Double = {
      val mB = spark.sparkContext.broadcast(m)
      var hit = 0L; var tot = 0L
      qs.foreach { q =>
        val qB = spark.sparkContext.broadcast(q)
        val top = df.select(col("id"), col("vec").cast("array<double>").as("v"))
          .as[(Long, Array[Double])]
          .mapPartitions { it =>
            val qq = qB.value
            it.map { case (id, v) =>
              var dd = 0.0; var na = 0.0; var nb = 0.0; var j = 0
              while (j < qq.length) {
                dd += qq(j) * v(j); na += qq(j) * qq(j); nb += v(j) * v(j); j += 1
              }
              (id, v, dd / math.sqrt(na * nb))
            }
          }.orderBy(desc("_3"), asc("_1")).limit(10).collect()
        val probed = m.nearestClusters(q, nprobe).toSet
        top.foreach { case (_, v, _) =>
          tot += 1
          if (probed(mB.value.assignOne(v))) hit += 1
        }
        qB.destroy()
      }
      hit.toDouble / tot
    }
    System.err.println(f"[trainscale] nprobe=$nprobe recall: hier=${recallOf(hier)}%.4f " +
      f"flat=${recallOf(flat)}%.4f")
    spark.stop()
  }
}
