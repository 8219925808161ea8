package graft

import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupTextSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "  THE  quick   brown fox jumps over the lazy dog  "), // same tokens, diff ws/case
    (2L, "a completely different document about spark engines"),
    (3L, "the quick brown fox jumps over the lazy cat") // near-dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup groups whitespace/case-normalized duplicates") {
    val rows = Dedup.exact(docs, "doc_id", "text")
      .select("id", "keep_id", "is_dup").as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(0L) === ((0L, false)))
    assert(rows(1L) === ((0L, true))) // normalized dup of doc 0
    assert(rows(2L) === ((2L, false)))
    assert(rows(3L) === ((3L, false)))
  }

  test("minhash LSH finds the near-dup pair and not the unrelated doc") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      numHashes = 32, rowsPerBand = 4, threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // identical token sets, jaccard 1.0
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("simhash: identical token sets get identical hashes; unrelated differ") {
    val h = docs.select($"doc_id", Dedup.simhashBits($"text").as("h"))
      .as[(Long, String)].collect().toMap
    assert(h(0L) === h(1L))
    assert(h(0L).length === 64)
    assert(h(0L).forall(c => c == '0' || c == '1'))
    assert(h(0L) !== h(2L))
    // near-dup: small hamming distance vs unrelated
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(h(0L), h(3L)) < ham(h(0L), h(2L)))
  }

  test("ngram jaccard ranks near-dup above unrelated") {
    val blocked = docs.withColumn("src", lit("s"))
    val out = Dedup.ngramJaccard(blocked, "doc_id", "text", "src", n = 3, threshold = 0.0)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((0L, 1L)) === 1.0)
    assert(out((0L, 3L)) > out((0L, 2L)))
  }

  test("token/quality/langid functions behave on edge cases") {
    val df = Seq((0L, ""), (1L, "   "), (2L, "The the THE"), (3L, "der und ist nicht"))
      .toDF("id", "text")
    val r = df.select($"id",
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.langId($"text").as("lang"))
      .as[(Long, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(r(0L) === ((0, "und")))
    assert(r(1L) === ((0, "und")))
    assert(r(2L) === ((3, "en")))
    assert(r(3L) === ((4, "de")))
  }

  test("embedding near-dup finds identical vectors") {
    val emb = Seq(
      (0L, 0, Seq(1.0f, 0.0f)), (1L, 0, Seq(1.0f, 0.0f)),
      (2L, 0, Seq(-1.0f, 0.0f)), (3L, 1, Seq(1.0f, 0.0f)))
      .toDF("id", "lbl", "v")
    val pairs = Dedup.embeddingNearDup(emb, "id", "v", "lbl", 0.99)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L))) // 2 is opposite; 3 is another block
  }
}
