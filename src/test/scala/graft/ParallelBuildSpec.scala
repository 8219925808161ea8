package graft

import graft.index.Vamana
import org.scalatest.funsuite.AnyFunSuite

/** The prefix-doubling parallel build (Vamana.build(threads)) must be
  * deterministic under any thread interleaving and quality-equivalent to
  * the sequential insert order it replaces. */
class ParallelBuildSpec extends AnyFunSuite {

  private val n = 5000
  private val dim = 16
  private def vecs: Array[Array[Float]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
  }

  private def bruteTop10(vs: Array[Array[Float]], q: Array[Float]): Set[Int] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    vs.indices.map(i => (i, cos(q, vs(i)))).sortBy { case (id, s) => (-s, id) }
      .take(10).map(_._1).toSet
  }

  test("parallel build is deterministic across runs") {
    val vs = vecs
    val g1 = new Vamana(vs, "COSINE", 32, 100).build(8)
    val g2 = new Vamana(vs, "COSINE", 32, 100).build(8)
    assert(g1.entryNode === g2.entryNode)
    (0 until n).foreach { i =>
      assert(g1.neighbors(i).toList === g2.neighbors(i).toList, s"adjacency differs at node $i")
    }
  }

  test("parallel-built graph matches sequential recall and degree bounds") {
    val vs = vecs
    val seq = new Vamana(vs, "COSINE", 32, 100).build()
    val par = new Vamana(vs, "COSINE", 32, 100).build(8)
    (0 until n).foreach { i =>
      assert(par.neighbors(i).length <= 32, s"degree overflow at node $i")
    }
    val queries = (0 until 50).map(qi => vs(qi * 97 % n))
    def recall(g: Vamana): Double = {
      val hits = queries.map { q =>
        val truth = bruteTop10(vs, q)
        g.search(q, 10, 64).count { case (id, _) => truth(id) } / 10.0
      }
      hits.sum / hits.length
    }
    val rSeq = recall(seq)
    val rPar = recall(par)
    assert(rPar >= 0.90, s"parallel recall@10 $rPar below bar")
    assert(rPar >= rSeq - 0.05, s"parallel recall@10 $rPar vs sequential $rSeq")
  }
}
