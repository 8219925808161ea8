package graft

import graft.index.Ann
import org.apache.spark.sql.functions._

/** Index builds must be a pure function of their ROWS and params — never of
  * the input's partition layout (NOTES_r14 §11: `df.sample` + round-robin
  * repartition let partition COUNT leak into training samples, segment
  * membership, and insert order; the same 4M rows at 4 vs 32 partitions
  * built trees with recall_abs 0.788 vs 0.806). At 100 TB partition
  * layouts are never stable run-to-run, so a layout-dependent build makes
  * every recall artifact noise. These tests pin the invariance end-to-end:
  * the SAME rows at different partitionings must produce byte-equal
  * training samples and row-identical trees. */
class ReproducibleBuildSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
  }

  test("sampleVectors is invariant to the input partition layout") {
    val rows = corpus(2000, 6, 31L)
    val a = graft.operators.Sampling.sampleVectors(
      rows.toDF("id", "v").repartition(3), "v", cap = 300, seed = 5L)
    val b = graft.operators.Sampling.sampleVectors(
      rows.toDF("id", "v").repartition(17), "v", cap = 300, seed = 5L)
    assert(a.length === 300 && b.length === 300)
    // element-wise (order included): k-means++ consumes the sample in
    // order, so the ORDER is part of the contract, not just the set
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x.toSeq === y.toSeq, s"sample row $i differs across layouts")
    }
  }

  private def treeRows(path: String) =
    Ann.readIndex(spark, path)
      .select(col("seg"), col("local_id"), col("node_id"),
        col("neighbors").cast("array<int>"), col("is_entry"))
      .as[(String, Int, Long, Seq[Int], Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("buildIndex produces the identical tree from any input partition layout") {
    val df = corpus(3000, 8, 7L).map { case (i, v) => (i, v.map(_.toFloat)) }
      .toDF("id", "vec")
    val p = Ann.Params(metric = "COSINE", maxDegree = 8, beamWidth = 32,
      segmentRows = 400)
    val base = java.nio.file.Files.createTempDirectory("graft_repro").toString
    // both partition counts sit BELOW the segment target count so each
    // takes the hash-repartition route (the coalesce branch is the
    // documented layout-dependent exception for small service flushes)
    Ann.buildIndex(df.repartition(2), s"$base/a", p)
    Ann.buildIndex(df.repartition(7), s"$base/b", p)
    val a = treeRows(s"$base/a")
    val b = treeRows(s"$base/b")
    assert(a.nonEmpty && a.size === b.size)
    assert(a === b, "plain segmented trees differ across input layouts")
  }

  test("buildIndexClustered produces the identical tree from any input partition layout") {
    val df = corpus(3000, 8, 13L).map { case (i, v) => (i, v.map(_.toFloat)) }
      .toDF("id", "vec")
    val p = Ann.Params(metric = "COSINE", maxDegree = 8, beamWidth = 32,
      pqM = 2)
    val base = java.nio.file.Files.createTempDirectory("graft_repro_cl").toString
    Ann.buildIndexClustered(df.repartition(2), s"$base/a", p, nlist = 6)
    Ann.buildIndexClustered(df.repartition(9), s"$base/b", p, nlist = 6)
    val a = treeRows(s"$base/a")
    val b = treeRows(s"$base/b")
    assert(a.nonEmpty && a.size === b.size)
    assert(a === b, "clustered trees differ across input layouts")
    // the residual serving payload must be identical too (same PQ model
    // from the same canonical sample, same codes)
    def res(path: String) = Ann.readIndex(spark, path)
      .select(col("node_id"), col("res_code").cast("array<int>"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    assert(res(s"$base/a") === res(s"$base/b"),
      "residual codes differ across input layouts")
  }
}
