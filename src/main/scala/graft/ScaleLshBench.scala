package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale demonstration for the LSH skew guard (not part of the driver's
  * Bench contract): a corpus where a large share of documents is ONE
  * boilerplate template — the adversarial case for banded LSH, where a
  * single band bucket of m members would emit m(m-1)/2 candidate pairs.
  * With `hubCap`, the bucket collapses to star edges and the pipeline
  * (candidates -> verify -> duplicateGroups) completes in O(n); uncapped,
  * the same corpus would emit billions of pairs (reported, not run).
  *
  * Prints one JSON line: n, boilerplate share, capped candidate count,
  * theoretical uncapped count, wall seconds, and the recovered giant-group
  * census.
  */
object ScaleLshBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val hubShare = if (args.length > 1) args(1).toDouble else 0.25
    val hubCap = if (args.length > 2) args(2).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val m = (n * hubShare).toLong // boilerplate copies
    val docs = spark.range(n.toLong).select(col("id"),
      when(col("id") < m,
        lit("standard boilerplate navigation header footer copyright notice page"))
        // non-boilerplate docs share only 3 of ~7 distinct tokens pairwise
        // (jaccard ~0.27 < threshold), so they generate candidates only on
        // rare band collisions and never verify — the demo isolates the
        // giant bucket's behavior
        .otherwise(concat(col("id"), lit(" alpha "), pmod(col("id"), lit(999)),
          lit(" beta "), pmod(col("id") * 7919, lit(104729)),
          lit(" gamma "), pmod(col("id") * 104729, lit(7919))))
        .as("text"))

    val t0 = System.nanoTime()
    val pairs = Dedup.minhashLsh(docs, "id", "text",
      numHashes = 32, rowsPerBand = 4, threshold = 0.5, hubCap = hubCap)
      .select("id1", "id2").cache()
    val nPairs = pairs.count()
    val groups = Dedup.duplicateGroups(docs.select(col("id")), "id", pairs)
    val giant = groups.filter(col("group_id") === 0L).count()
    val wallSec = (System.nanoTime() - t0) / 1e9

    val uncapped = m * (m - 1) / 2
    println(s"""{"metric":"scale_lsh_skew","n":$n,"boilerplate_docs":$m,""" +
      s""""hub_cap":$hubCap,"capped_pairs":$nPairs,"uncapped_pairs_theoretical":$uncapped,""" +
      s""""wall_sec":$wallSec,"giant_group_size":$giant,"census_ok":${giant == m}}""")
    spark.stop()
  }
}
