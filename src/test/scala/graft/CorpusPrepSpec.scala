package graft

import graft.operators.CorpusPrep
import org.apache.spark.sql.functions._

class CorpusPrepSpec extends SparkSpec {

  test("chunk: windows advance by stride, short tail kept, empty doc represented") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),
      (3L, "")).toDF("doc_id", "text")
    val got = CorpusPrep.chunk(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: starts 0,3,6,9 -> 4 chunks; last has 1 token
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq === Seq(0, 1, 2, 3))
    assert(d1.map(_._3).toSeq === Seq(4, 4, 4, 1))
    assert(d1.head._4 === "t1 t2 t3 t4")
    assert(d1(1)._4 === "t4 t5 t6 t7") // overlap of 1 token
    assert(d1.last._4 === "t10")
    // doc 2: single chunk of 2; doc 3: one empty chunk
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0, 2, "a b")))
    assert(got.filter(_._1 == 3L).toSeq === Seq((3L, 0, 0, "")))
  }

  test("repetitionStats: repeated content flags, varied content passes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),          // one token repeated
      (2L, "one two three four five six seven eight"), // all distinct
      (3L, "")).toDF("doc_id", "text")
    val got = CorpusPrep.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val d1 = got.head
    assert(d1._2 === 0.75) // 4 trigrams, 1 distinct
    assert(d1._3 === 1.0)
    assert(d1._4)
    val d2 = got(1)
    assert(d2._2 === 0.0 && d2._3 === 0.125 && !d2._4)
    val d3 = got(2)
    assert(d3._2 === 0.0 && d3._3 === 0.0 && !d3._4)
  }

  test("decontaminate: shared shingles counted, clean docs absent") {
    import spark.implicits._
    val evalSet = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "we saw the quick brown fox yesterday"), // shares 3-grams
      (2L, "completely unrelated content here")).toDF("doc_id", "text")
    val got = CorpusPrep.decontaminate(train, evalSet, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 shares "the quick brown" and "quick brown fox"
    assert(got.toSeq === Seq((1L, 100L, 2L)))
  }
}
