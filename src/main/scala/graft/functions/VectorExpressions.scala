package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot vector kernels (jvector
  * `VectorUtil` family, re-expressed for Tungsten rows).
  *
  * Numeric contract: identical to composed higher-order-function versions —
  * each element widened to double, products per element, sums sequential
  * left-to-right — so results are bit-identical to the DuckDB oracle SQL.
  *
  * Both interpreted eval and `doGenCode` dispatch into [[VecOps]], so the
  * expressions participate in whole-stage codegen (one static call per row,
  * no fallback row materialization).
  */
private[graft] object VecEval {
  def elemIsFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"expected float/double array, got $other")
  }
}

abstract class VectorBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected lazy val leftFloat: Boolean = VecEval.elemIsFloat(left.dataType)
  protected lazy val rightFloat: Boolean = VecEval.elemIsFloat(right.dataType)
  /** VecOps method name implementing this kernel. */
  protected def kernel: String

  override def nullSafeEval(a: Any, b: Any): Any = evalKernel(
    a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalKernel(x: ArrayData, y: ArrayData): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.$kernel($a, $b, $leftFloat, $rightFloat);")
}

case class DotExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override protected def kernel: String = "dot"
  override protected def evalKernel(x: ArrayData, y: ArrayData): Double =
    VecOps.dot(x, y, leftFloat, rightFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr = copy(l, r)
}

case class L2SqExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override protected def kernel: String = "l2sq"
  override protected def evalKernel(x: ArrayData, y: ArrayData): Double =
    VecOps.l2sq(x, y, leftFloat, rightFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqExpr = copy(l, r)
}

case class CosineExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override protected def kernel: String = "cosine"
  override protected def evalKernel(x: ArrayData, y: ArrayData): Double =
    VecOps.cosine(x, y, leftFloat, rightFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineExpr = copy(l, r)
}

/** L2 normalization as a native expression: the norm is computed ONCE per
  * row and each element divided — O(d). The HOF formulation
  * (`transform(d, x => x / sqrt(aggregate(...)))`) embeds the norm fold in
  * the per-element lambda and Catalyst evaluates it per element: O(d²)
  * per row, a ~d× slowdown on a corpus-scale normalization pass. */
case class L2NormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType)
  private lazy val childFloat: Boolean = VecEval.elemIsFloat(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2_normalize expects array<float|double>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VecOps.l2normalize(v.asInstanceOf[ArrayData], childFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VecOps.l2normalize($v, $childFloat));")

  override protected def withNewChildInternal(c: Expression): L2NormalizeExpr = copy(child = c)
}

/** Set Jaccard over two string or integral arrays (distinct semantics,
  * like array_intersect/array_union sizes): |A n B| / |A u B|. */
case class JaccardExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private lazy val mode: Int = left.dataType match {
    case ArrayType(StringType, _) => 0
    case ArrayType(LongType, _) => 1
    case ArrayType(IntegerType, _) => 2
    case other => throw new IllegalArgumentException(s"jaccard over $other unsupported")
  }

  // the element accessor is chosen from the LEFT side, so mismatched
  // element types must fail ANALYSIS: reading an int-backed array with
  // getLong returns packed garbage, not an error
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if lt == rt && (lt == StringType || lt == LongType || lt == IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"jaccard expects two arrays of the SAME string/long/int element type, got $l vs $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.jaccard($a, $b, $mode);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardExpr = copy(l, r)
}

/** ADC lookup-sum: left = per-query flattened m*kk double table, right = a
  * row's m int PQ codes, `kk` = centroids per subspace. Codegen'd so the PQ
  * candidate-scoring scan stays inside one whole-stage span (the HOF
  * transform/aggregate composition it replaces is interpreted per element). */
case class AdcLookupSumExpr(left: Expression, right: Expression, kk: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.adcLookupSum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], kk)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.functions.VecOps.adcLookupSum($t, $c, $kk);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcLookupSumExpr =
    copy(l, r)
}

/** One Broadcast per live model INSTANCE (weak-keyed memo). The
  * model-carrying expressions below reference multi-MB driver objects — an
  * [[graft.index.Ivf.IvfModel]] at 10^5 cells is ~70 MB of centroids plus
  * its coarse level — and `addReferenceObj` on the RAW model serializes it
  * into every stage's task binary, so each job re-ships the model as many
  * times as it has stages (Spark's "Broadcasting large task binary" warning
  * at 131072 cells: 181 MiB per stage). Holding a Broadcast HANDLE instead
  * ships the model once per SparkContext and lets every stage and job reuse
  * the executor-cached blocks. Weak keys let the ContextCleaner reclaim the
  * broadcast once the model itself is unreachable; the memo also keeps
  * expression equality intact (same model => same Broadcast instance). */
private[graft] object ModelBroadcast {
  private val memo = new java.util.WeakHashMap[AnyRef,
    org.apache.spark.broadcast.Broadcast[_]]()
  def of[T <: AnyRef](model: T): org.apache.spark.broadcast.Broadcast[T] =
    memo.synchronized {
      val hit = memo.get(model)
      if (hit != null) hit.asInstanceOf[org.apache.spark.broadcast.Broadcast[T]]
      else {
        val b = org.apache.spark.sql.SparkSession.active.sparkContext
          .broadcast(model: AnyRef)
        memo.put(model, b)
        b.asInstanceOf[org.apache.spark.broadcast.Broadcast[T]]
      }
    }
}

/** Nearest-centroid assignment as a native codegen expression — the IVF
  * write-path partitioner ([[graft.index.Ivf.assign]]). It runs once per
  * corpus row when writing a cluster-partitioned layout, so at 100 TB it is
  * the hottest scalar on the ingest path: a Scala UDF pays a boxed
  * Seq[Double] conversion per row, while this stays primitive
  * (ArrayData.toDoubleArray) and rides whole-stage codegen. The model rides
  * a [[ModelBroadcast]] handle (resolved once per generated-class instance,
  * never per row) so generated code calls the SAME
  * [[graft.index.Ivf.IvfModel.assignOne]] the driver-side probe routing
  * uses — one assignment implementation everywhere. */
case class NearestCentroidExpr(child: Expression,
    modelB: org.apache.spark.broadcast.Broadcast[graft.index.Ivf.IvfModel])
    extends UnaryExpression {
  @transient private lazy val model = modelB.value
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<double>, got $other (cast first)")
  }

  override def nullSafeEval(v: Any): Any =
    model.assignOne(v.asInstanceOf[ArrayData].toDoubleArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[graft.index.Ivf.IvfModel].getName
    val bRef = ctx.addReferenceObj("ivfModelB", modelB,
      "org.apache.spark.broadcast.Broadcast")
    val mVar = ctx.addMutableState(cls, "ivfModel", v => s"$v = ($cls) $bRef.value();")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $mVar.assignOne($v.toDoubleArray());")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroidExpr = copy(child = c)
}

/** PQ row encode as a native codegen expression (the other once-per-row
  * write-path scalar: every row of a compressed layout encodes exactly
  * once). Calls the SAME [[graft.operators.PQModel.encodeOne]] the oracle
  * contract is written against — sequential-double argmin, bit-identical
  * to the DuckDB list_reduce recomputation — so swapping the boxed UDF for
  * this changes per-row overhead, never arithmetic. */
case class PqEncodeExpr(child: Expression,
    modelB: org.apache.spark.broadcast.Broadcast[graft.operators.PQModel])
    extends UnaryExpression {
  @transient private lazy val model = modelB.value
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got $other (cast first)")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(model.encodeOne(v.asInstanceOf[ArrayData].toDoubleArray()))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[graft.operators.PQModel].getName
    val bRef = ctx.addReferenceObj("pqModelB", modelB,
      "org.apache.spark.broadcast.Broadcast")
    val mVar = ctx.addMutableState(cls, "pqModel", v => s"$v = ($cls) $bRef.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"$mVar.encodeOne($v.toDoubleArray()));")
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeExpr = copy(child = c)
}

/** nprobe nearest clusters per row ([[graft.index.Ivf.knnJoin]]'s probe
  * fan-out — once per LEFT row of the embedding-dedup join at 100 TB). */
case class NearestClustersExpr(child: Expression,
    modelB: org.apache.spark.broadcast.Broadcast[graft.index.Ivf.IvfModel], nprobe: Int)
    extends UnaryExpression {
  @transient private lazy val model = modelB.value
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_clusters expects array<double>, got $other (cast first)")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(model.nearestClusters(v.asInstanceOf[ArrayData].toDoubleArray(), nprobe))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[graft.index.Ivf.IvfModel].getName
    val bRef = ctx.addReferenceObj("ivfModelB", modelB,
      "org.apache.spark.broadcast.Broadcast")
    val mVar = ctx.addMutableState(cls, "ivfModel", v => s"$v = ($cls) $bRef.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"$mVar.nearestClusters($v.toDoubleArray(), $nprobe));")
  }

  override protected def withNewChildInternal(c: Expression): NearestClustersExpr = copy(child = c)
}

/** Centroid lookup by cluster id from a broadcast [[graft.index.Ivf.IvfModel]]
  * — replaces the `element_at(typedLit(centroids), id + 1)` pattern on the
  * residual paths (v − centroid[cell]), which embedded the FULL centroid set
  * as a Literal in the plan (and so in every stage's task binary: ~70 MB of
  * boxed Seqs at 10^5 cells). Returns the exact same array<double> rows the
  * literal route produced — residual arithmetic stays bit-identical. */
case class CentroidAtExpr(child: Expression,
    modelB: org.apache.spark.broadcast.Broadcast[graft.index.Ivf.IvfModel])
    extends UnaryExpression {
  @transient private lazy val model = modelB.value
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_at expects int cluster id, got $other")
  }

  override def nullSafeEval(id: Any): Any =
    ArrayData.toArrayData(model.centroids(id.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[graft.index.Ivf.IvfModel].getName
    val bRef = ctx.addReferenceObj("ivfModelB", modelB,
      "org.apache.spark.broadcast.Broadcast")
    val mVar = ctx.addMutableState(cls, "ivfModel", v => s"$v = ($cls) $bRef.value();")
    nullSafeCodeGen(ctx, ev, id =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"$mVar.centroids()[$id]);")
  }

  override protected def withNewChildInternal(c: Expression): CentroidAtExpr = copy(child = c)
}

/** Self-contained NVQ row decode (codes, per-subvector params, bits →
  * float32 vector) — the NVQ segment-assembly path ([[graft.index.Ann]]
  * readIndex): once per row on every cold cache fill, so it stays inside
  * whole-stage codegen instead of paying a boxed UDF round-trip. */
case class NvqDecodeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(codes: Any, params: Any, bits: Any): Any =
    graft.operators.NVQ.decodeRow(
      codes.asInstanceOf[ArrayData], params.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, p, b) =>
      s"${ev.value} = graft.operators.NVQ.decodeRow($c, $p, $b);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): NvqDecodeExpr = copy(f, s, t)
}

object VectorExpressions {
  def dot(a: Column, b: Column): Column = column(DotExpr(expression(a), expression(b)))
  def l2Sq(a: Column, b: Column): Column = column(L2SqExpr(expression(a), expression(b)))
  def cosine(a: Column, b: Column): Column = column(CosineExpr(expression(a), expression(b)))
  def l2Normalize(a: Column): Column = column(L2NormalizeExpr(expression(a)))
  def jaccard(a: Column, b: Column): Column = column(JaccardExpr(expression(a), expression(b)))
  def adcLookupSum(table: Column, codes: Column, kk: Int): Column =
    column(AdcLookupSumExpr(expression(table), expression(codes), kk))
  def nearestCentroid(vec: Column, model: graft.index.Ivf.IvfModel): Column =
    column(NearestCentroidExpr(expression(vec), ModelBroadcast.of(model)))
  def nearestClusters(vec: Column, model: graft.index.Ivf.IvfModel, nprobe: Int): Column =
    column(NearestClustersExpr(expression(vec), ModelBroadcast.of(model), nprobe))
  def pqEncode(vec: Column, model: graft.operators.PQModel): Column =
    column(PqEncodeExpr(expression(vec), ModelBroadcast.of(model)))
  def centroidAt(clusterId: Column, model: graft.index.Ivf.IvfModel): Column =
    column(CentroidAtExpr(expression(clusterId), ModelBroadcast.of(model)))
  def nvqDecode(codes: Column, params: Column, bits: Column): Column =
    column(NvqDecodeExpr(expression(codes), expression(params), expression(bits)))
}
