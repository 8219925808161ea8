package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join is strict, per-key, and null before first right row") {
    val left = Seq(
      (1L, 10L, 100L), (2L, 20L, 100L), (3L, 20L, 200L), (4L, 5L, 200L))
      .toDF("lid", "t", "k")
    val right = Seq(
      (100L, 10L, 1.0), (100L, 20L, 2.0), (200L, 15L, 3.0))
      .toDF("k", "t", "v")
      .select($"k", $"t", $"v")

    val out = AsOfJoin.join(left, right, "k", "t", "t", Seq("v"))
      .select("lid", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === None) // t=10 strict: right@10 excluded
    assert(out(2L) === Some(1.0)) // t=20 sees right@10, not right@20
    assert(out(3L) === Some(3.0)) // key 200 sees its own rows only
    assert(out(4L) === None) // before first right row
  }

  test("matched values come from ONE right row even when some are NULL") {
    val left = Seq((1L, 20L, 100L)).toDF("lid", "t", "k")
    val right = Seq(
      (100L, 5L, Some(3L), Some(7.0)),
      (100L, 10L, Some(5L), Option.empty[Double])) // latest row has NULL value
      .toDF("k", "t", "rid", "v")
    val row = AsOfJoin.join(left, right, "k", "t", "t", Seq("rid", "v"))
      .select("asof_rid", "asof_v").head()
    assert(row.getLong(0) === 5L)
    assert(row.isNullAt(1), "value must come from the matched row, not an older one")
  }

  test("NULL keys never match (join semantics)") {
    val left = Seq((1L, 20L, Option.empty[Long]), (2L, 20L, Some(9L))).toDF("lid", "t", "k")
    val right = Seq((Option.empty[Long], 10L, 1.0), (Some(9L), 10L, 2.0)).toDF("k", "t", "v")
    val out = AsOfJoin.join(left, right, "k", "t", "t", Seq("v"))
      .select("lid", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === None)
    assert(out(2L) === Some(2.0))
  }
}
