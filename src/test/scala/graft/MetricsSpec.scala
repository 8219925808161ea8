package graft

import graft.operators.Metrics

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private val truth = Seq(
    (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
    (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3)).toDF("qid", "nid", "rank")

  test("recallAtK counts intersection over kGT * nQueries") {
    val results = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 12L, 3), // 2/3 for q1
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3)) // 3/3 for q2
      .toDF("qid", "nid", "rank")
    val r = Metrics.recallAtK(results, truth, 3).head().getDouble(0)
    assert(math.abs(r - 5.0 / 6.0) < 1e-12)
  }

  test("recall is 0 for disjoint results and 1 for identical") {
    val none = Seq((1L, 90L, 1), (2L, 91L, 1)).toDF("qid", "nid", "rank")
    assert(Metrics.recallAtK(none, truth, 3).head().getDouble(0) === 0.0)
    assert(Metrics.recallAtK(truth, truth, 3).head().getDouble(0) === 1.0)
  }

  test("MAP: perfect ranking = 1.0, relevant-late ranking < 1") {
    assert(Metrics.meanAveragePrecision(truth, truth, 3).head().getDouble(0) === 1.0)
    val late = Seq(
      (1L, 98L, 1), (1L, 99L, 2), (1L, 10L, 3), // AP = (1/3)/1 = 1/3
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3)) // AP = 1
      .toDF("qid", "nid", "rank")
    val m = Metrics.meanAveragePrecision(late, truth, 3).head().getDouble(0)
    assert(m < 1.0 && m > 0.3)
  }
}
