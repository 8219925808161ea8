package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels invoked from both interpreted eval and generated code
  * (doGenCode emits static calls into this object — keeping the vector
  * math inside whole-stage codegen spans with one invoke per row). */
object VecOps {

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** The reference refuses mismatched dimensions (`VectorUtil.java:46-48`);
    * silently truncating to the shorter vector would return a plausible but
    * wrong score. */
  @inline private def checkDims(x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"vector dimensions differ: $n vs ${y.numElements()}")
    n
  }

  def dot(x: ArrayData, y: ArrayData, xf: Boolean, yf: Boolean): Double = {
    val n = checkDims(x, y)
    var acc = 0.0; var i = 0
    while (i < n) { acc += get(x, i, xf) * get(y, i, yf); i += 1 }
    acc
  }

  def l2sq(x: ArrayData, y: ArrayData, xf: Boolean, yf: Boolean): Double = {
    val n = checkDims(x, y)
    var acc = 0.0; var i = 0
    while (i < n) { val d = get(x, i, xf) - get(y, i, yf); acc += d * d; i += 1 }
    acc
  }

  def cosine(x: ArrayData, y: ArrayData, xf: Boolean, yf: Boolean): Double = {
    val n = checkDims(x, y)
    var dot = 0.0; var i = 0
    while (i < n) { dot += get(x, i, xf) * get(y, i, yf); i += 1 }
    var na = 0.0; i = 0
    while (i < x.numElements()) { val v = get(x, i, xf); na += v * v; i += 1 }
    var nb = 0.0; i = 0
    while (i < y.numElements()) { val v = get(y, i, yf); nb += v * v; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** ADC partial-sum gather (jvector `PQVectors.java:210` O3 folding, the
    * per-row half): sum over subspaces i of table[i*kk + codes[i]], where
    * `table` is a per-query m*kk flattened lookup table and `codes` a row's
    * m PQ centroid ids. Left-to-right summation — bit-identical to the
    * aggregate/transform HOF composition it replaces. */
  def adcLookupSum(table: ArrayData, codes: ArrayData, kk: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0; var i = 0
    while (i < m) { acc += table.getDouble(i * kk + codes.getInt(i)); i += 1 }
    acc
  }

  /** mode: 0 = string, 1 = long, 2 = int. */
  def jaccard(x: ArrayData, y: ArrayData, mode: Int): Double = {
    if (mode == 0) return jaccardStrings(x, y)
    // integral arrays: primitive sort + in-place dedupe + merge-count —
    // no boxing, no hash probes (this runs once per candidate PAIR in the
    // dedup verify joins)
    val a = toSortedDistinct(x, mode)
    val b = toSortedDistinct(y, mode)
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  private def toSortedDistinct(x: ArrayData, mode: Int): Array[Long] = {
    val n = x.numElements()
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = if (mode == 1) x.getLong(i) else x.getInt(i).toLong; i += 1 }
    java.util.Arrays.sort(a)
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    if (w == n) a else java.util.Arrays.copyOf(a, w)
  }

  private def jaccardStrings(x: ArrayData, y: ArrayData): Double = {
    val sa = new java.util.HashSet[Any](x.numElements() * 2)
    var i = 0
    while (i < x.numElements()) { sa.add(x.getUTF8String(i)); i += 1 }
    val sb = new java.util.HashSet[Any](y.numElements() * 2)
    i = 0
    while (i < y.numElements()) { sb.add(y.getUTF8String(i)); i += 1 }
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) { if (sa.contains(it.next())) inter += 1 }
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** L2-normalized copy: norm computed ONCE (sequential x*x fold, same
    * order as dot(a,a)), then one divide per element — O(d). A HOF
    * formulation re-evaluates the norm fold inside the per-element lambda
    * (O(d^2) per row). Zero vectors normalize to NaN elements (0/0), the
    * same contract as the HOF form. */
  def l2normalize(x: ArrayData, xf: Boolean): Array[Double] = {
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = get(x, i, xf); acc += v * v; i += 1 }
    val nrm = math.sqrt(acc)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = get(x, i, xf) / nrm; i += 1 }
    out
  }
}
