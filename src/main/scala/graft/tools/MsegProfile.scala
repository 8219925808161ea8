package graft.tools

import graft.index.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm-serving batch decomposition for the multi-segment route (round-11
  * finding: at 4M x 64 segs, routed QPS ~= exhaustive QPS despite an 8x
  * visited-work gap — something batch-shaped dominates beam work).
  *
  * Phases, all on the SAME pinned clustered tree:
  *   decode   — mapPartitions over the pinned nine-column projection that
  *              materializes every row tuple and counts (exactly the
  *              serving task's it.toArray cost) but runs NO searches.
  *   exh      — full exhaustive batch (probeSegments = 0).
  *   routed   — AutoProbe batch.
  * decode ~= exh ~= routed implicates per-batch row materialization;
  * exh >> routed >> decode implicates beam work (healthy).
  *
  * Run: sbt "runMain graft.tools.MsegProfile [n] [segs] [threads] [passes] [pq]"
  * 5th arg "pq" builds PQ-scored (pqM=8, the reference's default
  * construction mode) — measures the build-cost/recall trade at scale.
  */
object MsegProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1 << 20
    val segs = if (args.length > 1) args(1).toInt else 64
    val threads = if (args.length > 2) args(2).toInt else 32
    val passes = if (args.length > 3) args(3).toInt else 3
    val pqBuild = args.length > 4 && args(4).equalsIgnoreCase("pq")
    // "dNN" as the 5th arg overrides maxDegree (e.g. d32)
    val degree = if (args.length > 4 && args(4).startsWith("d"))
      args(4).drop(1).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-mseg-profile")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    val rnd = new java.util.Random(9)
    val centers = Array.fill(segs)(Array.fill(dim)(rnd.nextGaussian().toFloat * 2f))
    val centersB = spark.sparkContext.broadcast(centers)
    def vecOf(i: Long): Array[Float] = {
      val r = new java.util.Random(i * 2654435761L)
      val c = centersB.value((i % segs).toInt)
      Array.tabulate(dim)(j => c(j) + r.nextGaussian().toFloat)
    }
    val df = spark.range(0, n, 1, threads).map { i =>
      (i, vecOf(i).toSeq)
    }.toDF("id", "vec")
    val params =
      if (pqBuild) Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64,
        pqM = 8, pqBuild = true)
      else Ann.Params(metric = "COSINE", maxDegree = degree, beamWidth = 64)
    val path = java.nio.file.Files.createTempDirectory("graft_msegprof").toString + "/idx"
    val t0 = System.nanoTime()
    Ann.buildIndexClustered(df, path, params, nlist = segs)
    System.err.println(f"[msegprof] build ${(System.nanoTime() - t0) / 1e9}%.1fs" +
      (if (pqBuild) " (pq-scored construction)" else ""))
    Ann.pin(spark, path)

    val queries = (0 until 50).map { i =>
      val id = i.toLong * (n / 50) + 7
      (id, vecOf(id).toSeq)
    }.toDF("qid", "qvec")

    // true quality, not just routed-vs-exhaustive parity: routed recall@10
    // against the brute-force oracle over the generated corpus (one
    // distributed exact pass — n x 50 scoring, seconds at these sizes)
    locally {
      val got = Ann.searchIndex(spark, path, queries, 10, ef = 64, params,
        probeSegments = Ann.AutoProbe)
      val want = graft.operators.KnnExact.knn(df, queries, 10, "COSINE")
      val hit = got.select("qid", "nid")
        .join(want.select("qid", "nid"), Seq("qid", "nid"), "left_semi").count()
      System.err.println(f"[msegprof] exact-recall@10 ${hit.toDouble / want.count()}%.3f")
    }

    // SPARK_GRAFT_EF_SWEEP: query-time quality frontier on the SAME tree —
    // recall_abs + routed batch wall per ef. Build degree buys graph
    // quality at construction cost; ef buys beam coverage at QUERY cost.
    // The headline choice should sit on the better of the two frontiers.
    if (sys.env.contains("SPARK_GRAFT_EF_SWEEP")) {
      val truth = graft.operators.KnnExact.knn(df, queries, 10, "COSINE").cache()
      val truthN = truth.count()
      for (ef <- Seq(64, 96, 128, 192, 256)) {
        Ann.searchIndex(spark, path, queries, 10, ef = ef, params,
          probeSegments = Ann.AutoProbe).count() // warm plan
        val t0 = System.nanoTime()
        val got = Ann.searchIndex(spark, path, queries, 10, ef = ef, params,
          probeSegments = Ann.AutoProbe)
        val hit = got.select("qid", "nid")
          .join(truth.select("qid", "nid"), Seq("qid", "nid"), "left_semi").count()
        System.err.println(f"[msegprof] efsweep ef=$ef%-4d recall_abs=" +
          f"${hit.toDouble / truthN}%.3f batch=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      truth.unpersist()
    }

    def timed(name: String)(body: => Unit): Unit = {
      body // warm
      val ts = (1 to passes).map { _ =>
        val s = System.nanoTime(); body; (System.nanoTime() - s) / 1e9
      }
      System.err.println(f"[msegprof] $name%-8s best=${ts.min}%6.3fs  all=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }

    // decode-only: materialize every pinned row tuple exactly like the
    // serving task does, no searches — reads from the SAME storage-cached
    // representation the pinned search path uses (cache + count first)
    val pinned = Ann.readIndex(spark, path)
      .repartition(col("seg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .select(col("seg"), col("local_id"), col("node_id"),
        col("vec"), col("neighbors"), col("is_entry"),
        lit(true).as("live"), col("pq_code"), col("upper_nbrs"))
    timed("decode") {
      val c = pinned
        .as[(String, Int, Long, Array[Float], Array[Int], Boolean, Boolean, Array[Int], Array[Array[Int]])]
        .mapPartitions { it => Iterator.single(it.toArray.length.toLong) }
        .reduce(_ + _)
      require(c == n, s"decoded $c rows, expected $n")
    }
    timed("exh") {
      Ann.searchIndex(spark, path, queries, 10, ef = 64, params, probeSegments = 0).count()
    }
    timed("routed") {
      Ann.searchIndex(spark, path, queries, 10, ef = 64, params,
        probeSegments = Ann.AutoProbe).count()
    }
    // pq mode: the two-phase ROUTED path at scale — residual ADC serving
    // engages automatically on the clustered pqBuild tree (res_code +
    // _pqres_model), so this is the r13 serving fix's at-scale evidence.
    // A sidecar-less copy of the tree gives the global-ADC A/B twin.
    if (pqBuild) {
      val conf = spark.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      val globPath = path.stripSuffix("/idx") + "/idx_glob"
      org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(path),
        fs, new org.apache.hadoop.fs.Path(globPath), false, conf)
      fs.delete(new org.apache.hadoop.fs.Path(s"$globPath/_pqres_model"), true)
      Ann.pin(spark, globPath)
      val truth = graft.operators.KnnExact.knn(df, queries, 10, "COSINE").cache()
      truth.count()
      // pool = ef = rerankK, frontier 1x: the exact-rerank pool IS the
      // sweep variable (ef=64 would floor the pool at 64 for every rk)
      for ((tag, pth) <- Seq("res" -> path, "glob" -> globPath); rk <- Seq(10, 20, 40, 64)) {
        val t0 = System.nanoTime()
        val got = Ann.searchIndex(spark, pth, queries, 10, ef = rk,
          params.copy(adcFrontierPerK = 1), probeSegments = Ann.AutoProbe,
          rerankK = rk)
        val hit = got.select("qid", "nid")
          .join(truth.select("qid", "nid"), Seq("qid", "nid"), "left_semi").count()
        System.err.println(f"[msegprof] twophase_$tag rk=$rk " +
          f"recall_abs=${hit.toDouble / truth.count()}%.3f " +
          f"batch=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      Ann.unpin(globPath)
      truth.unpersist()
    }
    // single-query routed latency tail (the serving-shape number: one
    // query per call, pinned tree) with GC activity tagged per sample —
    // the mseg-scale evidence for the default-vs-ZGC adoption call
    locally {
      val singles = queries.collect().map { r =>
        Seq((r.getLong(0), r.getSeq[Float](1))).toDF("qid", "qvec")
      }
      val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      def gcMs: Long = { var t = 0L; gcBeans.forEach(b => t += math.max(0L, b.getCollectionTime)); t }
      // warm EVERY distinct single-query plan: each singles(i) is its own
      // DataFrame, so pass 1 would otherwise pay Catalyst compilation per
      // query and pollute the tail (first chain run: p99 1983ms from
      // plan-compile samples vs 253ms p90)
      singles.foreach(q => Ann.searchIndex(spark, path, q, 10, ef = 64,
        params, probeSegments = Ann.AutoProbe).count())
      val lats = scala.collection.mutable.ArrayBuffer.empty[(Double, Boolean)]
      (1 to passes).foreach { _ =>
        singles.foreach { q =>
          val g0 = gcMs
          val t0 = System.nanoTime()
          Ann.searchIndex(spark, path, q, 10, ef = 64, params,
            probeSegments = Ann.AutoProbe).count()
          lats += (((System.nanoTime() - t0) / 1e6, gcMs > g0))
        }
      }
      val s = lats.map(_._1).sorted
      def pct(p: Double): Double = s((p * (s.length - 1)).round.toInt)
      val gcShare = lats.count(_._2).toDouble / lats.length
      System.err.println(f"[msegprof] lat_ms p50=${pct(0.5)}%.1f p90=${pct(0.9)}%.1f " +
        f"p99=${pct(0.99)}%.1f max=${s.last}%.1f n=${s.length} gc_active=${gcShare}%.2f " +
        s"collector=${gcBeans.get(0).getName}")
    }
    // paged batch route (shares the warm fast path) vs the PERSISTED
    // session route (kept the 15-column tuple decode + per-page cursor
    // export/state swap): decomposes whether session pages are
    // decode-bound (fix: port the light path) or cursor/state-bound
    // (export + parquet swap dominate and the decode is noise)
    timed("paged") {
      Ann.searchIndexPaged(spark, path, queries, Seq(10, 10), ef = 64, params).count()
    }
    locally {
      val st = java.nio.file.Files.createTempDirectory("graft_msegprof_sess").toString + "/st"
      def stateMb: String = {
        val fs = new org.apache.hadoop.fs.Path(st)
          .getFileSystem(spark.sessionState.newHadoopConf())
        Seq("cursors", "pool").map { d =>
          val p = new org.apache.hadoop.fs.Path(s"$st/$d")
          val b = if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
          f"$d=${b / 1e6}%.1fMB"
        }.mkString(" ")
      }
      val t0 = System.nanoTime()
      Ann.openPagedSession(spark, path, st, queries, 10, 64, params).count()
      System.err.println(f"[msegprof] sess_open ${(System.nanoTime() - t0) / 1e9}%6.3fs  $stateMb")
      val ts = (1 to passes).map { _ =>
        val s = System.nanoTime()
        Ann.nextSessionPage(spark, path, st, 10, 64, params).count()
        (System.nanoTime() - s) / 1e9
      }
      System.err.println(f"[msegprof] sess_pg  best=${ts.min}%6.3fs  all=" +
        ts.map(t => f"$t%.3f").mkString(",") + s"  $stateMb")
    }
    Ann.unpin(path)
    spark.stop()
  }
}
