package graft

import graft.functions.{HashExpressions, VectorExpressions}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftColumnBridge

/** SQL-surface registration: exposes the engine's expression family to
  * `spark.sql(...)` (and, via [[GraftExtensions]], to sessions created with
  * `.withExtensions`). This is the engine's public scalar-function API —
  * the Spark analogue of jvector's `VectorSimilarityFunction` +
  * `VectorUtil` surface.
  *
  *   SELECT graft_cosine(a.vec, b.vec), graft_jaccard(a.toks, b.toks), ...
  */
object GraftFunctions {

  import org.apache.spark.sql.catalyst.expressions.{Add, Divide, Expression, Literal}
  import graft.functions.{CosineExpr, DotExpr, JaccardExpr, L2SqExpr, MinHashSignatureExpr, NgramShinglesExpr, NgramWindowHashesExpr, SimHashBitsExpr}

  // SQL registration needs pure catalyst trees (Column-built trees stay
  // unresolved through the registry), so the similarity formulas are
  // composed from catalyst nodes directly.
  private def half(e: Expression): Expression = Divide(Add(Literal(1.0), e), Literal(2.0))

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (e => DotExpr(e(0), e(1))),
    "graft_l2sq" -> (e => L2SqExpr(e(0), e(1))),
    "graft_cosine" -> (e => CosineExpr(e(0), e(1))),
    "graft_cosine_sim" -> (e => half(CosineExpr(e(0), e(1)))),
    "graft_dot_sim" -> (e => half(DotExpr(e(0), e(1)))),
    "graft_euclidean_sim" -> (e =>
      Divide(Literal(1.0), Add(Literal(1.0), L2SqExpr(e(0), e(1))))),
    "graft_jaccard" -> (e => JaccardExpr(e(0), e(1))),
    "graft_simhash" -> (e => SimHashBitsExpr(e.head)),
    "graft_minhash16" -> (e => MinHashSignatureExpr(e.head, 16)),
    // n is a plan-time constant in these kernels, so the SQL form takes a
    // foldable int literal as the second argument
    "graft_shingles" -> (e => NgramShinglesExpr(e(0), intLit(e(1), "graft_shingles"))),
    "graft_window_hashes" -> (e =>
      NgramWindowHashesExpr(e(0), intLit(e(1), "graft_window_hashes"))))

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int n, got $other")
  }

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` — injects
  * the function family at session build time (the SparkSessionExtensions
  * integration point; planner rules/strategies slot in here as the custom
  * ANN logical operator lands). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
          builder))
    }
}
