package graft.tools

import graft.Tables
import graft.index.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the pinned-route latency TAIL (round-10 verdict
  * task #7: clean-window deciles ended 141.8 -> 323.6ms, all-pass p99
  * 929.9ms — is the tail GC, first-touch pinning, or scheduler?).
  *
  * Replays Bench's exact pinned single-query protocol (same sf embeddings,
  * same params, same per-plan warmup) but tags EVERY sample with
  *   - the JVM GC time/count delta across the sample (GarbageCollectorMXBeans),
  *   - its position within the pass (first-touch / scheduler ramp shows up
  *     as position-correlated latency),
  *   - its pass id (contention windows inflate whole passes).
  * Then prints the tail samples (> p90) with their tags plus aggregate
  * splits: mean latency with/without GC activity, by position bucket, and
  * per-pass totals.
  *
  * Run: sbt "runMain graft.tools.PinnedTailProbe [sfDir] [threads] [passes]"
  */
object PinnedTailProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val threads = if (args.length > 1) args(1).toInt else 32
    val passes = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-pinned-tail")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir).cache()
    emb.count()
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec")).cache()
    queries.count()
    val params = Ann.Params(metric = "COSINE", maxDegree = 32, beamWidth = 100)
    val idxPath = java.nio.file.Files.createTempDirectory("graft_tail_idx").toString + "/idx"
    Ann.buildIndex(emb, idxPath, params, "vec_id", "embedding")
    Ann.pin(spark, idxPath)

    val singleQs = queries.collect().map { r =>
      val qid = r.getLong(r.fieldIndex("qid"))
      val qv = r.getSeq[Float](r.fieldIndex("qvec"))
      spark.createDataFrame(Seq((qid, qv))).toDF("qid", "qvec")
    }
    // Bench's warmup: every single-query plan runs once (analysis/codegen
    // is session setup, not serving latency)
    singleQs.foreach(q =>
      Ann.searchIndex(spark, idxPath, q, topK = 10, ef = 64, params).count())

    import scala.jdk.CollectionConverters._
    def gcNow(): (Long, Long) = {
      val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionTime).sum, beans.map(_.getCollectionCount).sum)
    }

    // sample = (pass, pos, latMs, gcMsDelta, gcCountDelta)
    val samples = (0 until passes).flatMap { pass =>
      singleQs.zipWithIndex.map { case (q, pos) =>
        val (gt0, gc0) = gcNow()
        val t0 = System.nanoTime()
        Ann.searchIndex(spark, idxPath, q, topK = 10, ef = 64, params).count()
        val latMs = (System.nanoTime() - t0) / 1e6
        val (gt1, gc1) = gcNow()
        (pass, pos, latMs, gt1 - gt0, gc1 - gc0)
      }
    }
    Ann.unpin(idxPath)

    val lats = samples.map(_._3).sorted
    def pct(p: Int) = lats((lats.length - 1) * p / 100)
    println(f"[tail] n=${samples.length} p50=${pct(50)}%.1f p90=${pct(90)}%.1f " +
      f"p99=${pct(99)}%.1f max=${lats.last}%.1f")

    val p90 = pct(90)
    val tail = samples.filter(_._3 > p90).sortBy(-_._3)
    println("[tail] worst 20 samples (pass, pos, latMs, gcMs, gcN):")
    tail.take(20).foreach { case (pass, pos, lat, gms, gn) =>
      println(f"  pass=$pass pos=$pos lat=$lat%.1f gcMs=$gms gcN=$gn")
    }

    // split 1: GC-active vs GC-quiet samples
    val (withGc, noGc) = samples.partition(_._5 > 0)
    def mean(xs: Seq[Double]) = if (xs.isEmpty) Double.NaN else xs.sum / xs.length
    println(f"[tail] gc-active n=${withGc.length} meanLat=${mean(withGc.map(_._3))}%.1f | " +
      f"gc-quiet n=${noGc.length} meanLat=${mean(noGc.map(_._3))}%.1f")
    val tailGcShare = if (tail.isEmpty) 0.0 else tail.count(_._5 > 0).toDouble / tail.length
    println(f"[tail] share of >p90 samples with GC activity: $tailGcShare%.2f " +
      f"(base rate ${withGc.length.toDouble / samples.length}%.2f)")

    // split 2: position within pass (first-touch / per-pass ramp)
    Seq(0 -> 5, 5 -> 15, 15 -> 50).foreach { case (a, b) =>
      val xs = samples.filter(s => s._2 >= a && s._2 < b).map(_._3)
      println(f"[tail] pos [$a,$b): mean=${mean(xs)}%.1f max=${if (xs.isEmpty) 0.0 else xs.max}%.1f")
    }

    // split 3: per-pass totals (whole-pass contention windows)
    (0 until passes).foreach { p =>
      val xs = samples.filter(_._1 == p)
      println(f"[tail] pass $p total=${xs.map(_._3).sum}%.0f max=${xs.map(_._3).max}%.1f " +
        f"gcMs=${xs.map(_._4).sum}")
    }
    spark.stop()
  }
}
