package graft.index

/** Array-backed binary heap over packed longs — (float score bits << 32) |
  * id — the same packing trick as the reference's NodeQueue/BoundedLongHeap
  * (`graph/NodeQueue.java:42-150`): zero boxing in the search hot loop.
  * Scores are in (0,1] so their float bits are monotonic as integers.
  * `min=true` keeps the WORST element on top (bounded result set);
  * `min=false` pops the BEST first (candidate frontier). */
final class LongHeap(initCap: Int, min: Boolean) {
  private var arr = new Array[Long](math.max(4, initCap))
  private var n = 0

  @inline private def better(a: Long, b: Long): Boolean = if (min) a < b else a > b

  def size: Int = n
  def nonEmpty: Boolean = n > 0
  def top: Long = arr(0)
  def clear(): Unit = n = 0

  def push(v: Long): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(n) = v
    var i = n
    n += 1
    while (i > 0) {
      val p = (i - 1) >> 1
      if (better(arr(i), arr(p))) {
        val t = arr(i); arr(i) = arr(p); arr(p) = t; i = p
      } else i = 0
    }
  }

  def pop(): Long = {
    val out = arr(0)
    n -= 1
    arr(0) = arr(n)
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var b = i
      if (l < n && better(arr(l), arr(b))) b = l
      if (r < n && better(arr(r), arr(b))) b = r
      if (b == i) done = true
      else { val t = arr(i); arr(i) = arr(b); arr(b) = t; i = b }
    }
    out
  }

  def toArray: Array[Long] = java.util.Arrays.copyOf(arr, n)
}

object LongHeap {
  /** IEEE-754 bits mapped to an unsigned-sortable 32-bit key (standard
    * trick: flip sign bit for positives, all bits for negatives) so packed
    * longs order correctly for NEGATIVE scores too (dotSim goes below 0
    * when dot < -1). The id is stored COMPLEMENTED in the low 31 bits:
    * on score ties, a max-heap pops the smaller id first (candidate
    * frontier) and a min-heap evicts the larger id first (bounded results)
    * — matching the engine's score-desc, id-asc contract. Ids must fit in
    * 31 bits (segment-local ordinals). */
  @inline private def sortableBits(score: Double): Long = {
    val b = java.lang.Float.floatToIntBits(score.toFloat)
    val s = if (b >= 0) b ^ 0x80000000 else ~b
    s.toLong & 0xffffffffL
  }

  @inline def pack(score: Double, id: Int): Long =
    (sortableBits(score) << 31) | ((~id).toLong & 0x7fffffffL)

  @inline def score(packed: Long): Float = {
    val s = (packed >>> 31).toInt
    val b = if (s < 0) s ^ 0x80000000 else ~s
    java.lang.Float.intBitsToFloat(b)
  }

  @inline def id(packed: Long): Int = (~packed.toInt) & 0x7fffffff
}
