package graft.plans

import graft.index.Ann
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.types._

/** Custom whole-operator integration for index-backed ANN search — the
  * "(c) LogicalPlan + Strategy + SparkPlan" route from SURVEY.md §7.2:
  * Spark has no operator for "top-k by similarity against a graph index",
  * so the search is a first-class plan node rather than an opaque
  * mapPartitions, which lets it compose with Catalyst (column pruning /
  * reuse / EXPLAIN visibility) and leaves room for an optimizer rule to
  * rewrite `ORDER BY sim LIMIT k` into it.
  *
  * The node carries the FULL search surface of the functional route —
  * tombstone deletes (merge-on-read), probeSegments centroid routing, and
  * PQ two-phase rerank — and [[KnnIndexScanExec]] executes through the same
  * kernel as [[Ann.searchIndex]] (warm SegmentCache, chunk fan-out,
  * pushed-down segment pruning), so the plan route can never silently fall
  * behind the functional route.
  *
  * Output schema: (qid LONG, rank INT, nid LONG, score DOUBLE).
  */
case class KnnIndexScan(
    indexPath: String,
    queries: Array[(Long, Array[Float])],
    topK: Int,
    ef: Int,
    params: Ann.Params,
    /** tombstoned node ids (empty = none) — fused into the beam accept
      * filter, jvector liveNodes semantics (`GraphSearcher.java:337`). */
    deletes: Array[Long] = Array.empty,
    /** > 0: per-query centroid routing over this many nearest segments;
      * [[Ann.AutoProbe]] (the default, aligned with [[Ann.searchIndex]])
      * routes ~sqrt(segments) on clustered trees and stays exhaustive on
      * unmarked ones; 0 forces exhaustive. */
    probeSegments: Int = Ann.AutoProbe,
    /** > 0: PQ-ADC approximate beam + exact rerank of this many. */
    rerankK: Int = 0,
    /** Optional accept-list child plan: a single-long-column relation of
      * node ids allowed in results (jvector `Bits`, P1). Planned and
      * executed as a normal child — its ids are broadcast-joined into the
      * index scan's live filter, never collected to the driver. */
    acceptChild: Option[LogicalPlan] = None,
    // constructor field (not a body val) so plan copies made by the
    // analyzer/optimizer keep the same expression ids
    override val output: Seq[Attribute] = KnnIndexScan.schemaAttrs) extends LogicalPlan {

  override def children: Seq[LogicalPlan] = acceptChild.toSeq
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): LogicalPlan =
    copy(acceptChild = newChildren.headOption)

  override def maxRows: Option[Long] = Some(queries.length.toLong * topK)
}

object KnnIndexScan {
  def schemaAttrs: Seq[Attribute] = Seq(
    AttributeReference("qid", LongType, nullable = false)(),
    AttributeReference("rank", IntegerType, nullable = false)(),
    AttributeReference("nid", LongType, nullable = false)(),
    AttributeReference("score", DoubleType, nullable = false)())
}

/** Physical operator: a thin adapter over the [[Ann.searchIndex]] execution
  * kernel. The previous incarnation re-implemented segment assembly inline
  * and had silently lost the warm-cache / routing / deletes / two-phase
  * features of the functional route; delegating to the one kernel makes
  * parity structural instead of aspirational (single source of truth), at
  * the cost of one nested query execution per invocation — negligible next
  * to the search itself. */
case class KnnIndexScanExec(
    indexPath: String,
    queries: Array[(Long, Array[Float])],
    topK: Int,
    ef: Int,
    params: Ann.Params,
    deletes: Array[Long],
    probeSegments: Int,
    rerankK: Int,
    acceptChild: Option[SparkPlan],
    override val output: Seq[Attribute]) extends SparkPlan {

  override def children: Seq[SparkPlan] = acceptChild.toSeq
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan =
    copy(acceptChild = newChildren.headOption)

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = session
    import spark.implicits._
    val qDf = queries.toSeq.toDF("qid", "qvec")
    val delDf = if (deletes.isEmpty) None else Some(deletes.toSeq.toDF("id"))
    val acceptDf = acceptChild.map { c =>
      org.apache.spark.sql.GraftColumnBridge.ofInternalRows(spark, c.output, c.execute())
    }
    val result = Ann.searchIndex(spark, indexPath, qDf, topK, ef, params,
      deletes = delDf, probeSegments = probeSegments, rerankK = rerankK,
      accepts = acceptDf)
      .select(org.apache.spark.sql.functions.col("qid").cast("long"),
        org.apache.spark.sql.functions.col("rank").cast("int"),
        org.apache.spark.sql.functions.col("nid").cast("long"),
        org.apache.spark.sql.functions.col("score").cast("double"))
    result.queryExecution.toRdd
  }
}

/** Plan node for index-backed threshold search (jvector T5 over a persisted
  * graph): all live nodes with sim >= threshold — no top-k bound, so the
  * output is the union of per-segment hits. Planned by [[KnnIndexStrategy]]
  * into [[ThresholdIndexScanExec]], which delegates to
  * [[Ann.thresholdSearchIndex]] (single execution kernel, like the top-k
  * route). Output schema: (qid LONG, nid LONG, score DOUBLE). */
case class ThresholdIndexScan(
    indexPath: String,
    queries: Array[(Long, Array[Float])],
    threshold: Double,
    ef: Int,
    params: Ann.Params,
    deletes: Array[Long] = Array.empty,
    override val output: Seq[Attribute] = ThresholdIndexScan.schemaAttrs) extends LeafNode

object ThresholdIndexScan {
  def schemaAttrs: Seq[Attribute] = Seq(
    AttributeReference("qid", LongType, nullable = false)(),
    AttributeReference("nid", LongType, nullable = false)(),
    AttributeReference("score", DoubleType, nullable = false)())
}

case class ThresholdIndexScanExec(
    indexPath: String,
    queries: Array[(Long, Array[Float])],
    threshold: Double,
    ef: Int,
    params: Ann.Params,
    deletes: Array[Long],
    override val output: Seq[Attribute]) extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = session
    import spark.implicits._
    val qDf = queries.toSeq.toDF("qid", "qvec")
    val delDf = if (deletes.isEmpty) None else Some(deletes.toSeq.toDF("id"))
    val result = Ann.thresholdSearchIndex(spark, indexPath, qDf, threshold, ef,
      params, deletes = delDf)
      .select(org.apache.spark.sql.functions.col("qid").cast("long"),
        org.apache.spark.sql.functions.col("nid").cast("long"),
        org.apache.spark.sql.functions.col("score").cast("double"))
    result.queryExecution.toRdd
  }
}

/** Planner strategy: KnnIndexScan -> KnnIndexScanExec, ThresholdIndexScan ->
  * ThresholdIndexScanExec. Injected via [[graft.GraftExtensions]]
  * (`SparkSessionExtensions.injectPlannerStrategy`). */
object KnnIndexStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case s: KnnIndexScan =>
      KnnIndexScanExec(s.indexPath, s.queries, s.topK, s.ef, s.params,
        s.deletes, s.probeSegments, s.rerankK, s.acceptChild.map(planLater),
        s.output) :: Nil
    case s: ThresholdIndexScan =>
      ThresholdIndexScanExec(s.indexPath, s.queries, s.threshold, s.ef,
        s.params, s.deletes, s.output) :: Nil
    case _ => Nil
  }
}
