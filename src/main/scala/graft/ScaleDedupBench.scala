package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale demonstration for the dedup grouping path (not part of the
  * driver's Bench contract): HashMin connected components over a synthetic
  * 1M-node near-dup graph — chain-linked clusters of `groupSize`, so the
  * propagation needs `groupSize - 1` rounds (the worst case for a cluster
  * of that diameter; real near-dup clusters are denser and converge
  * faster). Validates the per-round single-shuffle + lineage-truncation
  * design at a size where an unbounded lineage or per-round driver
  * materialization would fall over.
  *
  * Prints one JSON line: n, edges, group_size, wall seconds, and the
  * verified component census (groups, max/avg size).
  */
object ScaleDedupBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000000
    val groupSize = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nodes = spark.range(n.toLong).select(col("id"))
    // chain edges inside each aligned group of `groupSize`
    val pairs = spark.range(n.toLong - 1)
      .filter(col("id") % groupSize =!= (groupSize - 1))
      .select(col("id").as("id1"), (col("id") + 1).as("id2"))
    val nEdges = pairs.count()

    val t0 = System.nanoTime()
    val groups = Dedup.duplicateGroups(nodes, "id", pairs)
    val census = groups.agg(
      countDistinct(col("group_id")).as("n_groups"),
      max(col("group_size")).as("max_size"),
      avg(col("group_size")).as("avg_size"),
      sum(when(col("is_canonical"), 1).otherwise(0)).as("n_canonical")).head()
    val wallSec = (System.nanoTime() - t0) / 1e9

    val expectGroups = (n + groupSize - 1) / groupSize
    val ok = census.getLong(0) == expectGroups && census.getLong(3) == expectGroups &&
      census.getLong(1) == groupSize
    println(s"""{"metric":"scale_dedup","n":$n,"edges":$nEdges,"group_size":$groupSize,""" +
      s""""wall_sec":$wallSec,"groups":${census.getLong(0)},"max_size":${census.getLong(1)},""" +
      s""""avg_size":${census.getDouble(2)},"census_ok":$ok}""")
    spark.stop()
  }
}
