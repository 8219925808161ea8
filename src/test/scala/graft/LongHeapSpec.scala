package graft

import graft.index.LongHeap
import org.scalatest.funsuite.AnyFunSuite

class LongHeapSpec extends AnyFunSuite {

  test("pack/unpack round-trips scores (including negatives) and ids") {
    for (s <- Seq(-3.5, -1.0, -0.25, 0.0, 0.25, 0.5, 1.0); id <- Seq(0, 1, 12345, (1 << 30))) {
      val p = LongHeap.pack(s, id)
      assert(LongHeap.score(p) === s.toFloat)
      assert(LongHeap.id(p) === id)
    }
  }

  test("packed ordering matches score order across sign boundary") {
    val scores = Seq(-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0)
    val packed = scores.map(LongHeap.pack(_, 7))
    assert(packed === packed.sorted, "packed keys must ascend with score")
  }

  test("ties: max-heap pops smaller id first; min-heap evicts larger id first") {
    val maxH = new graft.index.LongHeap(4, min = false)
    maxH.push(LongHeap.pack(0.5, 9)); maxH.push(LongHeap.pack(0.5, 3))
    assert(LongHeap.id(maxH.pop()) === 3)
    val minH = new graft.index.LongHeap(4, min = true)
    minH.push(LongHeap.pack(0.5, 9)); minH.push(LongHeap.pack(0.5, 3))
    assert(LongHeap.id(minH.pop()) === 9)
  }

  test("heap sorts a negative-score workload correctly") {
    val rnd = new scala.util.Random(3)
    val xs = Array.fill(500)((rnd.nextDouble() * 4 - 3, rnd.nextInt(1 << 20)))
    val h = new graft.index.LongHeap(8, min = false)
    xs.foreach { case (s, i) => h.push(LongHeap.pack(s, i)) }
    val popped = Array.fill(500)(h.pop()).map(LongHeap.score)
    assert(popped.toSeq === popped.sortBy(-_).toSeq)
  }
}
