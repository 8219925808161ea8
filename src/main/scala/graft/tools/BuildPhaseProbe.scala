package graft.tools

import graft.index.{Ann, Ivf}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Attribution probe for the clustered build wall (NOTES_r14 §10 measured
  * 1646.8 s at 4M x 131072 and attributed it to per-task/per-file fixed
  * costs — this probe turns that attribution into a per-job table): runs
  * ONE `Ann.buildIndexClustered` with a job listener that records every
  * Spark job's wall, task count, and call site, then prints jobs sorted by
  * wall. Driver-side gaps (k-means iterations, sidecar writes, commit
  * protocol) show up as the difference between the job-wall sum and the
  * build wall.
  *
  * Run: sbt "runMain graft.tools.BuildPhaseProbe [n] [cells] [threads]"
  */
object BuildPhaseProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1 << 20)
    val cells = args.lift(1).map(_.toInt).getOrElse(32768)
    val threads = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-build-phase-probe")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      // AQE renames every stage to its thread-pool wrapper; with it off the
      // stage names carry the real call sites the attribution needs. The
      // job SPLIT changes but phase walls don't (verified 2048-cell walls
      // within noise both ways).
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_AQE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    case class JobRec(id: Int, site: String, tasks: Int, startMs: Long, var endMs: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // stage names carry the action call site ("parquet at Ann.scala:NNN")
        val site = e.stageInfos.map(s => s"${s.name}(${s.numTasks})").mkString(" | ")
        val tasks = e.stageInfos.map(_.numTasks).sum
        jobs.put(e.jobId, JobRec(e.jobId, site, tasks, e.time, -1L))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId)
        if (r != null) r.endMs = e.time
      }
    })

    val dim = 64
    val rnd = new java.util.Random(17)
    val centers = Array.fill(cells)(Array.fill(dim)(rnd.nextGaussian().toFloat * 2f))
    val centersB = spark.sparkContext.broadcast(centers)
    def vecOf(i: Long): Array[Float] = {
      val r = new java.util.Random(i * 2654435761L)
      val c = centersB.value((i % cells).toInt)
      Array.tabulate(dim)(j => c(j) + r.nextGaussian().toFloat)
    }
    val df = spark.range(0, n, 1, threads).map(i => (i, vecOf(i).toSeq)).toDF("id", "vec")
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64,
      pqM = 8, pqBuild = true)
    val path = java.nio.file.Files.createTempDirectory("graft_buildphase").toString + "/idx"
    System.err.println(s"[phase] n=$n cells=$cells threads=$threads " +
      s"hierTrain=${cells >= Ivf.HierTrainCells} -> $path")

    val t0 = System.nanoTime()
    Ann.buildIndexClustered(df, path, params, nlist = cells)
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the last job-end event drain

    import scala.jdk.CollectionConverters._
    val recs = jobs.values().asScala.toArray.filter(_.endMs > 0)
      .sortBy(r => -(r.endMs - r.startMs))
    val jobSum = recs.map(r => (r.endMs - r.startMs) / 1e3).sum
    System.err.println(f"[phase] build wall $wall%.1fs; job-wall sum $jobSum%.1fs " +
      f"(driver-side gap ${wall - jobSum}%.1fs); jobs ${recs.length}")
    recs.take(25).foreach { r =>
      System.err.println(f"[phase]   job ${r.id}%3d ${(r.endMs - r.startMs) / 1e3}%8.1fs " +
        f"${r.tasks}%7d tasks  ${r.site}")
    }
    spark.stop()
  }
}
