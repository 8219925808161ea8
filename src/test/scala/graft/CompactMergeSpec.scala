package graft

import graft.index.Ann
import graft.operators.KnnExact
import org.apache.spark.sql.functions._

/** Merge-mode compaction (jvector `OnDiskGraphIndexCompactor`): same-source
  * adjacency is reused WITHOUT search, only cross-source candidates are
  * beam-found, clean right-sized segments carry through wholesale.
  * Scenarios mirror the reference suite
  * (`jvector-tests/.../graph/disk/TestOnDiskGraphIndexCompactor.java`):
  * exact vector preservation, deletions, recall after compaction, the
  * compressed sidecar, plus the economics contract (measured construction
  * work a multiple below the full-rebuild arm). */
class CompactMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() = java.nio.file.Files.createTempDirectory("graft_cmpct").toString

  private val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64)

  private def emb = Tables.embeddings(spark, sfDir)

  /** Two disjoint batch sub-indexes under one root (the streaming-ingest
    * layout compaction exists to clean up). */
  private def twoBatches(dir: String, p: Ann.Params, split: Long = 250L): Unit = {
    Ann.buildIndex(emb.filter($"vec_id" < split).repartition(1),
      s"$dir/idx/batch=0", p, "vec_id", "embedding")
    Ann.buildIndex(emb.filter($"vec_id" >= split).repartition(1),
      s"$dir/idx/batch=1", p, "vec_id", "embedding")
  }

  test("merge preserves every vector exactly (testExactVectorValuesAfterCompaction)") {
    val dir = tmpDir()
    val p = params.copy(segmentRows = 10000)
    twoBatches(dir, p)
    val stats = Ann.compact(spark, s"$dir/idx/*", s"$dir/out", p)
    assert(stats.mode === "merge")
    val out = Ann.readIndex(spark, s"$dir/out")
      .select($"node_id", $"vec").as[(Long, Array[Float])].collect().toMap
    val src = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    assert(out.keySet === src.keySet, "every source id survives, none invented")
    out.foreach { case (id, v) => assert(v.toSeq === src(id).toSeq, s"vector $id changed") }
    // one right-sized merged segment, not two carried ones
    assert(Ann.readIndex(spark, s"$dir/out").select("seg").distinct().count() === 1L)
    assert(stats.reusedEdges > 0L, "same-source adjacency must be reused, not re-searched")
  }

  test("merge drops tombstones for real and keeps the rest intact (testCompactWithDeletions)") {
    val dir = tmpDir()
    val p = params.copy(segmentRows = 10000)
    twoBatches(dir, p)
    val dels = Seq(7L, 13L, 260L, 261L, 262L)
    val stats = Ann.compact(spark, s"$dir/idx/*", s"$dir/out", p,
      deletes = Some(dels.toDF("id")))
    assert(stats.mode === "merge")
    val outIds = Ann.readIndex(spark, s"$dir/out").select("node_id").as[Long].collect().toSet
    assert(dels.forall(d => !outIds.contains(d)), "tombstoned ids must be gone")
    assert(outIds.size === (emb.count() - dels.length).toInt)
    // searches never resurrect deleted ids WITHOUT a delete list at query time
    val queries = emb.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val got = Ann.searchIndex(spark, s"$dir/out", queries, 10, 64, p)
    assert(got.select("nid").as[Long].collect().toSet.intersect(dels.toSet).isEmpty)
  }

  test("merged recall matches the full-rebuild arm at a fraction of the construction work") {
    val dir = tmpDir()
    val p = params.copy(segmentRows = 10000)
    twoBatches(dir, p)
    val mergeStats = Ann.compact(spark, s"$dir/idx/*", s"$dir/m", p, mode = "merge")
    val rebuildStats = Ann.compact(spark, s"$dir/idx/*", s"$dir/r", p, mode = "rebuild")
    val queries = emb.filter($"vec_id" < 8).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val exact = KnnExact.knn(emb, queries, 10, "COSINE", "vec_id", "embedding")
    def recall(tree: String): Double = {
      val got = Ann.searchIndex(spark, tree, queries, 10, 64, p)
      graft.operators.Metrics.recallAtK(got, exact, 10).head().getDouble(0)
    }
    val (mr, rr) = (recall(s"$dir/m"), recall(s"$dir/r"))
    assert(mr >= rr - 1e-9, s"merge recall $mr below rebuild recall $rr")
    assert(mr >= 0.95, s"merged-tree recall $mr < 0.95")
    // economics, worst case for merge (two equal halves, nothing carries):
    // cross-source beams must still undercut the rebuild's insert+refine
    // beams over the whole merged corpus. The streaming-shaped win (clean
    // big segments carry with ZERO work) is asserted in the mixed test and
    // the ann_compact_merge gate.
    assert(rebuildStats.visited.toDouble >= 1.3 * math.max(1L, mergeStats.visited),
      s"rebuild visited ${rebuildStats.visited} not >= 1.3x merge ${mergeStats.visited}")
  }

  test("clean right-sized segments carry through wholesale with zero graph work") {
    val dir = tmpDir()
    // one batch, segments ~125 rows; compact at the SAME segment size: every
    // bin holds exactly one clean source segment
    val p = params.copy(segmentRows = 125)
    Ann.buildIndex(emb.repartition(4), s"$dir/idx", p, "vec_id", "embedding")
    val before = Ann.readIndex(spark, s"$dir/idx")
      .select($"seg", $"node_id", $"neighbors")
      .as[(String, Long, Array[Int])].collect()
    val nSegs = before.map(_._1).distinct.length
    val stats = Ann.compact(spark, s"$dir/idx", s"$dir/out", p.copy(segmentRows = 140))
    assert(stats.carriedSegments === nSegs.toLong, "all clean segments must carry")
    assert(stats.visited === 0L && stats.reusedEdges === 0L,
      "carried segments cost zero construction work")
    val after = Ann.readIndex(spark, s"$dir/out")
      .select($"seg", $"node_id", $"neighbors")
      .as[(String, Long, Array[Int])].collect()
    assert(after.length === before.length)
    // per-node degree sequence is preserved (local ids may renumber only if
    // rewritten — carried segments keep rows as-is, so compare directly)
    val degBefore = before.map(r => (r._2, r._3.length)).toMap
    after.foreach { case (_, nid, nbrs) =>
      assert(degBefore(nid) === nbrs.length, s"degree changed for node $nid")
    }
  }

  test("merge with a PQ sidecar retrains and re-encodes every output row (testCompactWithCompressedSidecar)") {
    val dir = tmpDir()
    val p = params.copy(segmentRows = 10000, pqM = 4, pqK = 16)
    twoBatches(dir, p)
    val stats = Ann.compact(spark, s"$dir/idx/*", s"$dir/out", p,
      deletes = Some(Seq(3L, 300L).toDF("id")))
    assert(stats.mode === "merge")
    val m = graft.operators.PQ.load(spark, s"$dir/out/_pq_model")
    assert(m.m === 4, "retrained codebook keeps base m")
    val noCode = Ann.readIndex(spark, s"$dir/out").filter(col("pq_code").isNull).count()
    assert(noCode === 0L, "every merged row re-encodes under the retrained codebook")
    // two-phase search over the merged tree works end-to-end
    val queries = emb.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val got = Ann.searchIndex(spark, s"$dir/out", queries, 10, 64, p, rerankK = 40)
    assert(got.groupBy("qid").count().select(min("count")).head().getLong(0) === 10L)
  }

  test("merge with pqM > 0 on a CODELESS source trains a fresh codebook (rebuild parity)") {
    val dir = tmpDir()
    val plain = params.copy(segmentRows = 10000) // no PQ in the source tree
    twoBatches(dir, plain)
    val p = plain.copy(pqM = 4, pqK = 16)
    Ann.compact(spark, s"$dir/idx/*", s"$dir/out", p)
    val m = graft.operators.PQ.load(spark, s"$dir/out/_pq_model")
    assert(m.m === 4, "fresh codebook trained at the requested (m, k)")
    assert(Ann.readIndex(spark, s"$dir/out").filter(col("pq_code").isNull).count() === 0L)
    val queries = emb.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val got = Ann.searchIndex(spark, s"$dir/out", queries, 10, 64, p, rerankK = 40)
    assert(got.groupBy("qid").count().select(min("count")).head().getLong(0) === 10L)
  }

  test("mixed compaction: clean big batch carries, dirty small batches merge") {
    val dir = tmpDir()
    val p = params.copy(segmentRows = 10000)
    // big clean batch (one ~300-row segment) + two small batches
    Ann.buildIndex(emb.filter($"vec_id" < 300).repartition(1),
      s"$dir/idx/batch=0", p, "vec_id", "embedding")
    Ann.buildIndex(emb.filter($"vec_id" >= 300 && $"vec_id" < 400).repartition(1),
      s"$dir/idx/batch=1", p, "vec_id", "embedding")
    Ann.buildIndex(emb.filter($"vec_id" >= 400).repartition(1),
      s"$dir/idx/batch=2", p, "vec_id", "embedding")
    val dels = Seq(310L, 311L)
    // bin target 250: the 300-row clean segment is oversize -> own bin ->
    // carried; the two 100-row batches share a bin -> true two-source merge
    val stats = Ann.compact(spark, s"$dir/idx/*", s"$dir/out",
      p.copy(segmentRows = 250), deletes = Some(dels.toDF("id")))
    assert(stats.carriedSegments === 1L, "the clean big segment must carry")
    assert(stats.visited > 0L, "the dirty small batches must really merge")
    assert(stats.reusedEdges > 0L)
    val out = Ann.readIndex(spark, s"$dir/out")
    assert(out.select("seg").distinct().count() === 2L)
    val outIds = out.select("node_id").as[Long].collect().toSet
    assert(dels.forall(d => !outIds.contains(d)))
    assert(outIds.size.toLong === emb.count() - dels.length)
    // the streaming economics: merge work is proportional to the SMALL dirty
    // batches; the rebuild arm re-searches the whole corpus including the
    // clean big batch
    val rebuild = Ann.compact(spark, s"$dir/idx/*", s"$dir/out_r",
      p.copy(segmentRows = 250), deletes = Some(dels.toDF("id")), mode = "rebuild")
    assert(rebuild.visited.toDouble >= 2.5 * math.max(1L, stats.visited),
      s"rebuild visited ${rebuild.visited} not >= 2.5x merge ${stats.visited}")
  }
}
