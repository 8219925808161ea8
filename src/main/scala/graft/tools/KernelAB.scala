package graft.tools
import graft.index.Vamana

object KernelAB {
  def main(args: Array[String]): Unit = {
    val n = 2000; val dim = 64
    val rnd = new scala.util.Random(7)
    val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
    val g = new Vamana(vecs, "COSINE", 32, 100).build(16)
    val qs = Array.fill(50)(Array.fill(dim)(rnd.nextFloat()))
    def run(): Unit =
      java.util.stream.IntStream.range(0, 1000).parallel()
        .forEach(i => { g.search(qs(i % qs.length), 10, 64); () })
    (1 to 5).foreach(_ => run())
    val ts = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }
    println(f"kernel qps best=${1000 / ts.min}%.0f med=${1000 / ts.sorted.apply(2)}%.0f")
  }
}
