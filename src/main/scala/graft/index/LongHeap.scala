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
  @inline def pack(score: Double, id: Int): Long =
    (java.lang.Float.floatToIntBits(score.toFloat).toLong << 32) | (id.toLong & 0xffffffffL)
  @inline def score(packed: Long): Float =
    java.lang.Float.intBitsToFloat((packed >>> 32).toInt)
  @inline def id(packed: Long): Int = packed.toInt
}
