package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector scalar-function family.
  *
  * Semantics mirror the reference engine's `VectorUtil` /
  * `VectorSimilarityFunction` (jvector:
  * `jvector-base/src/main/java/io/github/jbellis/jvector/vector/VectorUtil.java:45-163`,
  * `vector/VectorSimilarityFunction.java:37-69`), re-expressed as Catalyst
  * column expressions built from Spark's higher-order array functions so the
  * whole computation stays inside Tungsten with no UDF/serialization
  * boundary and survives whole-stage codegen planning around it.
  *
  * Numeric contract (important for DuckDB-oracle parity): inputs are cast to
  * `array<double>` first, products are computed per-element in double, and
  * sums are *sequential left folds* (`aggregate`), matching a scalar loop.
  * Score normalization formulas are part of query semantics and must match
  * the reference exactly:
  *   EUCLIDEAN -> 1 / (1 + ||a-b||^2)
  *   DOT       -> (1 + a.b) / 2
  *   COSINE    -> (1 + cos(a,b)) / 2
  */
object VectorFunctions {

  private def asDouble(a: Column): Column = a.cast("array<double>")

  /** Sequential left-fold sum of an array<double> column. */
  private def seqSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float/double array columns (double accumulation).
    * Evaluated by the native [[VectorExpressions]] kernel — bit-identical
    * to the sequential HOF fold, ~20x cheaper per row. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column = VectorExpressions.l2Sq(a, b)

  /** Squared L2 norm (= sequential fold of x*x, same order as dot(a,a)). */
  def normSq(a: Column): Column = VectorExpressions.dot(a, a)

  /** Raw cosine in [-1, 1]. */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)

  /** L2-normalized copy of the vector (native expression — the norm is
    * computed once per row, not once per element as a HOF lambda would). */
  def l2Normalize(a: Column): Column = VectorExpressions.l2Normalize(a)

  /** Similarity score in (0, 1], higher = more similar — reference formulas. */
  def euclideanSim(a: Column, b: Column): Column = lit(1.0) / (lit(1.0) + l2Sq(a, b))
  def dotSim(a: Column, b: Column): Column = (lit(1.0) + dot(a, b)) / lit(2.0)
  def cosineSim(a: Column, b: Column): Column = (lit(1.0) + cosine(a, b)) / lit(2.0)

  /** Dispatch by metric name (EUCLIDEAN | DOT_PRODUCT | COSINE). */
  def similarity(metric: String)(a: Column, b: Column): Column = metric.toUpperCase match {
    case "EUCLIDEAN" => euclideanSim(a, b)
    case "DOT_PRODUCT" | "DOT" => dotSim(a, b)
    case "COSINE" => cosineSim(a, b)
    case m => throw new IllegalArgumentException(s"unknown metric: $m")
  }

  /** Hamming distance between two array<long> bit-packed code columns
    * (reference: `VectorUtil.hammingDistance`, BQ scoring). Mismatched
    * code lengths ERROR like the float kernels do — zip_with would pad
    * with null and the sum would come out null, silently dropping the row
    * from a `hamming <= k` filter as a plausible non-match. */
  def hammingDistance(a: Column, b: Column): Column =
    when(size(a) =!= size(b),
      raise_error(format_string(
        "hamming: code lengths differ: %d vs %d", size(a), size(b))).cast("long"))
      .otherwise(
        aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))), lit(0L), (acc, x) => acc + x))

  /** Elementwise sum of two vectors. */
  def add(a: Column, b: Column): Column = zip_with(asDouble(a), asDouble(b), (x, y) => x + y)

  /** Elementwise difference a - b. */
  def sub(a: Column, b: Column): Column = zip_with(asDouble(a), asDouble(b), (x, y) => x - y)

  /** Scale a vector by a scalar column. */
  def scale(a: Column, s: Column): Column = transform(asDouble(a), x => x * s)

  /** Subvector slice [start, start+len) — 0-based (Spark slice is 1-based). */
  def subVector(a: Column, start: Int, len: Int): Column = slice(a, start + 1, len)

  /** Driver-side scalar dot product (same sequential fold as `dot`). */
  def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
}
