package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CC-at-scale demo (dev tool): duplicate-group resolution over a ~1M-edge
  * candidate graph mixing the two hard shapes — one very long chain (the
  * diameter worst case that defeats plain HashMin label propagation) and
  * many random small clusters (the realistic near-dup shape). Reports
  * wall time, rounds to converge, and validates the group structure.
  *
  * Usage: CcScaleBench [chainLen] [nClusters] [clusterSize]
  */
object CcScaleBench {
  def main(args: Array[String]): Unit = {
    val chainLen = if (args.length > 0) args(0).toInt else 100000
    val nClusters = if (args.length > 1) args(1).toInt else 100000
    val clusterSize = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // chain ids [0, chainLen); cluster c occupies ids
    // [chainLen + c*clusterSize, chainLen + (c+1)*clusterSize) as a path
    val chain = spark.range(chainLen - 1).select(col("id").as("id1"), (col("id") + 1).as("id2"))
    val clusters = spark.range(nClusters.toLong * clusterSize)
      .select((col("id") + chainLen).as("id1"),
        col("id").mod(clusterSize).as("pos"))
      .filter(col("pos") < clusterSize - 1)
      .select(col("id1"), (col("id1") + 1).as("id2"))
    val pairs = chain.union(clusters).cache()
    val nodes = spark.range(chainLen + nClusters.toLong * clusterSize).select(col("id"))
    println(s"### edges=${pairs.count()} nodes=${nodes.count()} chain_diameter=${chainLen - 1}")

    val t0 = System.nanoTime()
    val groups = Dedup.duplicateGroups(nodes, "id", pairs).cache()
    val nGroups = groups.filter(col("is_canonical")).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val chainOk = groups.filter(col("id") < chainLen)
      .filter(col("group_id") =!= 0L).count() == 0
    val sizesOk = groups.filter(col("id") >= chainLen)
      .filter(col("group_size") =!= clusterSize).count() == 0
    println(f"### groups=$nGroups rounds=${Dedup.lastCcRounds} wall=${sec}%.1fs " +
      s"chain_collapsed=$chainOk cluster_sizes_ok=$sizesOk " +
      s"expected_groups=${1 + nClusters}")
    spark.stop()
  }
}
