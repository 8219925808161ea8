package graft.plans

import graft.functions.{CosineExpr, DotExpr, L2SqExpr}
import graft.index.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Opt-in ANN rewrite (SURVEY.md §4's "(b) one logical rewrite rule"):
  * a declarative top-k-by-similarity —
  *
  *   SELECT * FROM t ORDER BY graft_cosine_sim(vec, :qvec) DESC LIMIT k
  *
  * — over a table whose ANN index was registered via
  * [[AnnCatalog.register]] is rewritten into [[KnnIndexScan]] (graph beam
  * search) joined back to the base rows, sorted by score. The rewrite is
  * APPROXIMATE by design (recall-gated, like any ANN index hint), which is
  * why it only fires for explicitly registered tables.
  */
object AnnCatalog {
  case class IndexInfo(
      indexPath: String,
      idCol: String,
      vecCol: String,
      ef: Int,
      params: Ann.Params)

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, IndexInfo]()

  /** Register an index for a parquet table location and install the rule +
    * strategy on the session. */
  def register(spark: SparkSession, tablePath: String, info: IndexInfo): Unit = {
    registry.put(normalize(tablePath), info)
    // the rule/strategy install is check-then-set on shared session state:
    // serialize it, or two concurrent register() calls can lose an append
    // (a plan with KnnIndexScan and no matching strategy fails planning)
    installLock.synchronized {
      if (!spark.experimental.extraOptimizations.contains(AnnRewriteRule))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ AnnRewriteRule
      if (!spark.experimental.extraStrategies.contains(KnnIndexStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ KnnIndexStrategy
    }
  }

  private val installLock = new Object

  def clear(): Unit = registry.clear()

  /** Scheme-insensitive location key: authority + path (so file:/x,
    * file:///x and /x all collide; hdfs://host/x keeps its authority). */
  private def normalize(p: String): String = {
    val key = try {
      val u = new java.net.URI(p)
      if (u.getScheme == null) p
      else Option(u.getAuthority).getOrElse("") + Option(u.getPath).getOrElse("")
    } catch { case _: Exception => p }
    key.stripSuffix("/")
  }

  private[plans] def lookup(rel: LogicalRelation): Option[IndexInfo] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.iterator
          .map(rp => registry.get(normalize(rp.toString)))
          .collectFirst { case info if info != null => info }
      case _ => None
    }
}

object AnnRewriteRule extends Rule[LogicalPlan] {

  /** Marks Filter nodes this rule itself emits (accept-list builds, base
    * re-filters): transformDown recurses into rewritten output, and an
    * emitted `Filter(sim >= t, rel)` must not get threshold-rewritten in
    * turn (a second layer of approximation on an exact sub-plan). */
  private val Generated =
    new org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.ann.generated")

  private def markGenerated(f: Filter): Filter = { f.setTagValue(Generated, true); f }

  /** Extract (vec attribute, query literal as Array[Float], metric). */
  private def matchSim(e: Expression): Option[(AttributeReference, Array[Float], String)] = {
    def arr(l: Literal): Option[Array[Float]] = l.dataType match {
      case ArrayType(FloatType, _) =>
        Some(l.value.asInstanceOf[ArrayData].toFloatArray())
      case ArrayType(DoubleType, _) =>
        Some(l.value.asInstanceOf[ArrayData].toDoubleArray().map(_.toFloat))
      case _ => None
    }
    e match {
      case Divide(Add(Literal(one, DoubleType), CosineExpr(a: AttributeReference, l: Literal), _),
          Literal(two, DoubleType), _) if one == 1.0 && two == 2.0 =>
        arr(l).map((a, _, "COSINE"))
      case Divide(Add(Literal(one, DoubleType), DotExpr(a: AttributeReference, l: Literal), _),
          Literal(two, DoubleType), _) if one == 1.0 && two == 2.0 =>
        arr(l).map((a, _, "DOT_PRODUCT"))
      case Divide(Literal(one, DoubleType),
          Add(Literal(one2, DoubleType), L2SqExpr(a: AttributeReference, l: Literal), _), _)
          if one == 1.0 && one2 == 1.0 =>
        arr(l).map((a, _, "EUCLIDEAN"))
      case _ => None
    }
  }

  /** Build the rewritten plan: index scan (optionally with the predicate
    * pushed as an in-beam accept list) joined back to the base rows,
    * ordered by the engine contract — score desc, id asc
    * (`SearchResult.java:100-106`). */
  private def rewriteTopK(
      k: Int,
      simExpr: Expression,
      rel: LogicalRelation,
      filterCond: Option[Expression]): Option[LogicalPlan] =
    for {
      info <- AnnCatalog.lookup(rel)
      (vecAttr, qv, metric) <- matchSim(simExpr)
      if vecAttr.name.equalsIgnoreCase(info.vecCol) &&
        metric.startsWith(info.params.metric.toUpperCase.take(3))
      idAttr <- rel.output.find(_.name.equalsIgnoreCase(info.idCol))
      // only deterministic predicates over base columns are pushable
      if filterCond.forall(c => c.deterministic && c.references.subsetOf(rel.outputSet))
    } yield {
      // the accept-list child: ids satisfying p (O1 — pushed INTO the beam
      // as the accept filter rather than post-filtering the top-k, so a
      // selective predicate still yields k results)
      val acceptChild = filterCond.map { c =>
        Project(Seq(Alias(Cast(idAttr, org.apache.spark.sql.types.LongType), "id")()),
          markGenerated(Filter(c, rel)))
      }
      val scan = KnnIndexScan(info.indexPath, Array((0L, qv)), k,
        math.max(info.ef, k), info.params, acceptChild = acceptChild)
      val nidAttr = scan.output.find(_.name == "nid").get
      val scoreAttr = scan.output.find(_.name == "score").get
      val base = filterCond.map(c => markGenerated(Filter(c, rel))).getOrElse(rel)
      // the scan side is tiny (<= queries * k rows) — hint it broadcast so
      // the base table never shuffles for the join-back
      // idAttr cast to long explicitly: this rule runs AFTER analysis, so
      // no implicit coercion would repair an int/string id column and the
      // join condition would be ill-typed instead of falling back
      val joined = Join(base, scan, Inner,
        Some(EqualTo(Cast(idAttr, org.apache.spark.sql.types.LongType), nidAttr)),
        JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
      // re-apply the hard LIMIT: the join can exceed k if base ids repeat;
      // nid-asc tiebreak preserves the deterministic result order contract
      Limit(Literal(k),
        Project(rel.output,
          Sort(Seq(SortOrder(scoreAttr, Descending), SortOrder(nidAttr, Ascending)),
            global = true, joined)))
    }

  /** Extract a similarity-threshold conjunct: sim >= t (or t <= sim). Only
    * the non-strict form is matched — the engine's threshold search returns
    * score >= t, so rewriting `>` would wrongly include equality hits. */
  private def matchThreshold(e: Expression): Option[(Expression, Double)] = e match {
    case GreaterThanOrEqual(sim, Literal(t: Double, DoubleType)) if matchSim(sim).isDefined =>
      Some((sim, t))
    case LessThanOrEqual(Literal(t: Double, DoubleType), sim) if matchSim(sim).isDefined =>
      Some((sim, t))
    case _ => None
  }

  /** Rewrite `WHERE sim(vec, :q) >= t [AND p...]` over a registered table
    * into an index-backed threshold scan (T5/O1: the predicate runs INSIDE
    * the graph traversal with the adaptive stop, instead of scoring every
    * row). Approximate by design, like the top-k rewrite: a low-recall
    * traversal may miss matches — the trade the user opted into by
    * registering the index. PRECISION however stays exact regardless of
    * the index's storage mode: the threshold conjunct is re-applied above
    * the join-back against the base side's FULL-RES vectors, so an
    * NVQ-compressed index (which scores reconstructed vectors inside the
    * traversal, and can let a slightly-below-t row through) never leaks a
    * non-matching row. Residual conjuncts stay as a post-filter too. */
  private def rewriteThreshold(
      cond: Expression,
      rel: LogicalRelation): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val hits = conjuncts.flatMap(c => matchThreshold(c).map(c -> _))
    if (hits.length != 1) return None
    val (thrConjunct, (simExpr, t)) = hits.head
    val residual = conjuncts.filterNot(_ eq thrConjunct)
    for {
      info <- AnnCatalog.lookup(rel)
      (vecAttr, qv, metric) <- matchSim(simExpr)
      if vecAttr.name.equalsIgnoreCase(info.vecCol) &&
        metric.startsWith(info.params.metric.toUpperCase.take(3))
      idAttr <- rel.output.find(_.name.equalsIgnoreCase(info.idCol))
      if residual.forall(c => c.deterministic && c.references.subsetOf(rel.outputSet))
    } yield {
      val scan = ThresholdIndexScan(info.indexPath, Array((0L, qv)), t,
        info.ef, info.params)
      val nidAttr = scan.output.find(_.name == "nid").get
      val base = residual.reduceOption(And)
        .map(c => markGenerated(Filter(c, rel))).getOrElse(rel)
      // hits are a small fraction of the base — broadcast the scan side
      val joined = Join(base, scan, Inner,
        Some(EqualTo(Cast(idAttr, org.apache.spark.sql.types.LongType), nidAttr)),
        JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
      // exact-precision gate: recheck sim >= t on the base side's full-res
      // vec (Generated-tagged so this rule never threshold-rewrites its own
      // output if later passes push it down to the relation)
      Project(rel.output, markGenerated(Filter(thrConjunct, joined)))
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case limit @ GlobalLimit(IntegerLiteral(k),
        LocalLimit(_, Sort(Seq(SortOrder(simExpr, Descending, _, _)), true, rel: LogicalRelation, _))) =>
      rewriteTopK(k, simExpr, rel, None).getOrElse(limit)
    case limit @ GlobalLimit(IntegerLiteral(k),
        LocalLimit(_, Sort(Seq(SortOrder(simExpr, Descending, _, _)), true,
          Filter(cond, rel: LogicalRelation), _))) =>
      rewriteTopK(k, simExpr, rel, Some(cond)).getOrElse(limit)
    case filter @ Filter(cond, rel: LogicalRelation)
        if filter.getTagValue(Generated).isEmpty =>
      rewriteThreshold(cond, rel).getOrElse(filter)
  }
}
