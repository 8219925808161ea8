package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the r14 dedup single-pass materializations at corpus
  * scale (r14 verdict "Next round" #3): the sf0.1 wall was flat because
  * the duplicate subtrees ran on idle cores — this measures the claim
  * where it matters, a >= 1M-doc corpus that keeps every core busy.
  *
  *   minhash: [[Dedup.minhashLsh]] with singlePass = true (one signature
  *     pass + one shingle pass, the shipped shape) vs false (the
  *     pre-checkpoint shape: both self-join sides re-run the
  *     numHashes-md5s-per-token signature kernel and the shingle hash).
  *   semantic: [[Dedup.semantic]] single assignment pass vs the ~4x
  *     re-executed nearest-centroid scan.
  *
  * Corpus is generated executor-side as a pure function of the row id
  * (nothing driver-sized); ~1% of docs are exact-duplicate partners of
  * their neighbor so the pipelines do real verify/group work while the
  * pair count stays O(n). Timed with the noop sink (full computation, no
  * sink cost). args: [n] [runs]
  */
object DedupPassProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1 << 20
    val runs = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ~24 tokens per doc; ids 100k..100k+1 share text (exact near-dup pair)
    val docs = spark.range(0, n, 1, cpus.toInt).map { i =>
      val base: Long = if (i % 100 == 1) i - 1 else i
      val r = new java.util.Random(base * 2654435761L)
      val toks = Array.tabulate(24)(_ => "w" + r.nextInt(50000))
      (i, toks.mkString(" "))
    }.toDF("id", "text")

    val dim = 16
    val ncl = 256
    val rnd = new java.util.Random(7)
    val centers = Array.fill(ncl)(Array.fill(dim)(rnd.nextGaussian().toFloat * 2f))
    val centersB = spark.sparkContext.broadcast(centers)
    val emb = spark.range(0, n, 1, cpus.toInt).map { i =>
      val base: Long = if (i % 100 == 1) i - 1 else i
      val r = new java.util.Random(base * 2654435761L)
      val c = centersB.value((base % ncl).toInt)
      (i, Seq.tabulate(dim)(j => c(j) + 0.05f * r.nextGaussian().toFloat))
    }.toDF("id", "vec")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(body: => Unit): Double = {
      spark.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[dedup-pass] $tag ${s}%.1fs")
      s
    }

    def minhash(single: Boolean): Double = time(s"minhash single=$single")(noop(
      Dedup.minhashLsh(docs, "id", "text", numHashes = 16, rowsPerBand = 2,
        threshold = 0.5, hubCap = 256, singlePass = single)))
    def semantic(single: Boolean): Double = time(s"semantic single=$single")(noop(
      Dedup.semantic(emb, "id", "vec", nClusters = ncl, threshold = 0.99,
        hubCap = 64, singlePass = single)))

    // warmup (JIT + codegen) on a slice, then alternate modes per run so a
    // contention window cannot land on one mode only
    noop(Dedup.minhashLsh(docs.limit(20000), "id", "text", 16, 2, 0.5))
    noop(Dedup.semantic(emb.limit(20000), "id", "vec", ncl, 0.99, hubCap = 64))
    val mh = (1 to runs).map(_ => (minhash(true), minhash(false)))
    val sd = (1 to runs).map(_ => (semantic(true), semantic(false)))
    def f(d: Double) = f"$d%.1f"
    println(s"""{"metric":"dedup_pass_probe","n":$n,"cpus":$cpus,""" +
      s""""minhash_single_sec":${f(mh.map(_._1).min)},"minhash_multi_sec":${f(mh.map(_._2).min)},""" +
      s""""semantic_single_sec":${f(sd.map(_._1).min)},"semantic_multi_sec":${f(sd.map(_._2).min)},""" +
      s""""minhash_runs":[${mh.map(t => f(t._1) + "," + f(t._2)).mkString("[", "],[", "]")}],""" +
      s""""semantic_runs":[${sd.map(t => f(t._1) + "," + f(t._2)).mkString("[", "],[", "]")}]}""")
    spark.stop()
  }
}
