package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels invoked from both interpreted eval and generated code
  * (doGenCode emits static calls into this object — keeping the vector
  * math inside whole-stage codegen spans with one invoke per row). */
object VecOps {

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(x: ArrayData, y: ArrayData, xf: Boolean, yf: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += get(x, i, xf) * get(y, i, yf); i += 1 }
    acc
  }

  def l2sq(x: ArrayData, y: ArrayData, xf: Boolean, yf: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { val d = get(x, i, xf) - get(y, i, yf); acc += d * d; i += 1 }
    acc
  }

  def cosine(x: ArrayData, y: ArrayData, xf: Boolean, yf: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += get(x, i, xf) * get(y, i, yf); i += 1 }
    var na = 0.0; i = 0
    while (i < x.numElements()) { val v = get(x, i, xf); na += v * v; i += 1 }
    var nb = 0.0; i = 0
    while (i < y.numElements()) { val v = get(y, i, yf); nb += v * v; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** mode: 0 = string, 1 = long, 2 = int. */
  def jaccard(x: ArrayData, y: ArrayData, mode: Int): Double = {
    def read(a: ArrayData, i: Int): Any = mode match {
      case 0 => a.getUTF8String(i)
      case 1 => java.lang.Long.valueOf(a.getLong(i))
      case 2 => java.lang.Long.valueOf(a.getInt(i).toLong)
    }
    val sa = new java.util.HashSet[Any](x.numElements() * 2)
    var i = 0
    while (i < x.numElements()) { sa.add(read(x, i)); i += 1 }
    val sb = new java.util.HashSet[Any](y.numElements() * 2)
    i = 0
    while (i < y.numElements()) { sb.add(read(y, i)); i += 1 }
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) { if (sa.contains(it.next())) inter += 1 }
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}
