package graft.plans

import graft.index.{Ann, Vamana}
import graft.operators.TopKAgg
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
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
  * Output schema: (qid LONG, rank INT, nid LONG, score DOUBLE).
  */
case class KnnIndexScan(
    indexPath: String,
    queries: Array[(Long, Array[Float])],
    topK: Int,
    ef: Int,
    params: Ann.Params,
    // constructor field (not a body val) so plan copies made by the
    // analyzer/optimizer keep the same expression ids
    override val output: Seq[Attribute] = KnnIndexScan.schemaAttrs) extends LeafNode {

  override def computeStats(): org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = BigInt(queries.length.toLong * topK * 28L))
}

object KnnIndexScan {
  def schemaAttrs: Seq[Attribute] = Seq(
    AttributeReference("qid", LongType, nullable = false)(),
    AttributeReference("rank", IntegerType, nullable = false)(),
    AttributeReference("nid", LongType, nullable = false)(),
    AttributeReference("score", DoubleType, nullable = false)())
}

case class KnnIndexScanExec(
    indexPath: String,
    queries: Array[(Long, Array[Float])],
    topK: Int,
    ef: Int,
    params: Ann.Params,
    override val output: Seq[Attribute]) extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = session
    val p = params
    val k = topK
    val searchEf = ef
    val qB = spark.sparkContext.broadcast(queries)

    // segment rows co-located, decoded straight from InternalRows
    // (readIndex anchors hive partition discovery for glob/multi-batch trees)
    val segDf = graft.index.Ann.readIndex(spark, indexPath)
      .select("seg", "local_id", "node_id", "vec", "neighbors", "is_entry")
      .repartition(org.apache.spark.sql.functions.col("seg"))
    val segRdd = segDf.queryExecution.toRdd

    val perSegment: RDD[(Long, (Long, Double))] = segRdd.mapPartitions { it =>
      case class SegRow(seg: String, local: Int, node: Long, vec: Array[Float], nbrs: Array[Int], entry: Boolean)
      val rows = it.map { r =>
        SegRow(r.getUTF8String(0).toString, r.getInt(1), r.getLong(2),
          r.getArray(3).toFloatArray(), r.getArray(4).toIntArray(), r.getBoolean(5))
      }.toArray
      rows.groupBy(_.seg).iterator.flatMap { case (_, seg) =>
        val sorted = seg.sortBy(_.local)
        val g = new Vamana(sorted.map(_.vec), p.metric, p.maxDegree, p.beamWidth,
          p.alpha, p.neighborOverflow, p.seed)
        sorted.foreach { r =>
          g.neighbors(r.local) ++= r.nbrs
          if (r.entry) g.entryNode = r.local
        }
        val ids = sorted.map(_.node)
        qB.value.iterator.flatMap { case (qid, qv) =>
          g.search(qv, k, searchEf).iterator.map { case (l, s) => (qid, (ids(l), s)) }
        }
      }
    }

    // global bounded top-k merge per query (partial results are already <= k
    // per segment, so this reduce moves O(segments * k) rows per query)
    val agg = TopKAgg(k)
    val merged = perSegment
      .aggregateByKey(agg.zero)(
        (buf, x) => agg.reduce(buf, x),
        (a, b) => agg.merge(a, b))
      .flatMap { case (qid, topk) =>
        agg.finish(topk).iterator.zipWithIndex.map { case ((nid, s), i) =>
          (qid, i + 1, nid, s)
        }
      }

    merged.mapPartitions { it =>
      val proj = UnsafeProjection.create(Array[DataType](LongType, IntegerType, LongType, DoubleType))
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
      it.map { case (qid, rank, nid, s) =>
        row.update(0, qid); row.update(1, rank); row.update(2, nid); row.update(3, s)
        proj(row)
      }
    }
  }
}

/** Planner strategy: KnnIndexScan -> KnnIndexScanExec. Injected via
  * [[graft.GraftExtensions]] (`SparkSessionExtensions.injectPlannerStrategy`). */
object KnnIndexStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case s: KnnIndexScan =>
      KnnIndexScanExec(s.indexPath, s.queries, s.topK, s.ef, s.params, s.output) :: Nil
    case _ => Nil
  }
}
