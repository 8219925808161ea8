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

  test("minhash LSH hubCap: a giant near-identical cluster emits O(n) star edges, not O(n^2)") {
    // 120 identical docs (one LSH bucket per band) + 3 unrelated docs
    val giant = (0L until 120L).map(i => (i, "repeated boilerplate template page content here"))
    val others = Seq(
      (200L, "a completely different document about spark engines"),
      (201L, "another unrelated piece of text entirely"),
      (202L, "a completely different document about spark pipelines")) // near-dup of 200
    val corpus = (giant ++ others).toDF("doc_id", "text")

    val capped = Dedup.minhashLsh(corpus, "doc_id", "text",
      numHashes = 32, rowsPerBand = 4, threshold = 0.5, hubCap = 20)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // star edges only for the giant cluster: every member connects to hub 0
    val clusterEdges = capped.filter(p => p._1 < 200L && p._2 < 200L)
    assert(clusterEdges.size === 119, s"expected 119 star edges, got ${clusterEdges.size}")
    assert(clusterEdges.forall(_._1 == 0L), "all cluster edges anchor at the min-id hub")
    // the unrelated near-dup pair outside the giant bucket is still found pairwise
    assert(capped.contains((200L, 202L)))

    // connectivity preserved: grouping still produces ONE group of 120
    val groups = Dedup.duplicateGroups(
      corpus.select($"doc_id"), "doc_id",
      capped.toSeq.toDF("id1", "id2"))
    val sizes = groups.filter($"group_id" === 0L).count()
    assert(sizes === 120)

    // equivalence: with no oversized bucket, capped == uncapped
    val smallCorpus = others.toDF("doc_id", "text")
    val a = Dedup.minhashLsh(smallCorpus, "doc_id", "text", 32, 4, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val b = Dedup.minhashLsh(smallCorpus, "doc_id", "text", 32, 4, 0.5, hubCap = 20)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(a === b)
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

  test("Bm25 inverted index: searchIndex equals the scan route; scan is bucket-pruned + tok-pushed") {
    import graft.operators.Bm25
    val docs = Tables.documents(spark, sfDir)
    val terms = Seq("vector", "hash", "join")
    val tmp = java.nio.file.Files.createTempDirectory("bm25idx").toString + "/idx"
    Bm25.buildIndex(docs, "doc_id", "text", tmp, nBuckets = 16)
    val idx = Bm25.searchIndex(spark, tmp, terms, topN = 20).cache()
    val scan = Bm25.search(docs, "doc_id", "text", terms, topN = 20)
    val got = idx.orderBy("rank").collect().map(_.toSeq).toSeq
    val want = scan.orderBy("rank").collect().map(_.toSeq).toSeq
    assert(got === want, "indexed route must reproduce the scan route")

    // serving plan: partition pruning on bucket, tok filter pushed to the
    // postings scan (the per-query cost must be O(matching postings))
    val lines = idx.queryExecution.executedPlan.toString.linesIterator.toSeq
    assert(lines.exists { l =>
      val i = l.indexOf("PartitionFilters: [")
      i >= 0 && l.substring(i).contains("bucket")
    }, s"no bucket partition pruning in plan:\n${lines.mkString("\n")}")
    assert(lines.exists(l => l.contains("PushedFilters") && l.contains("In(tok")),
      s"no pushed tok filter in plan:\n${lines.mkString("\n")}")

    // unknown terms: empty result, not an error
    assert(Bm25.searchIndex(spark, tmp, Seq("zzz_not_a_token")).count() === 0)
  }

  test("Bm25.searchIndexBatch matches per-query searchIndex") {
    import graft.operators.Bm25
    import org.apache.spark.sql.functions.{array, lit, col}
    val docs = Tables.documents(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("bm25b").toString + "/idx"
    Bm25.buildIndex(docs, "doc_id", "text", tmp, nBuckets = 16)
    val qs = Seq(
      (0L, Seq("vector", "hash", "join")),
      (1L, Seq("the", "data")),
      (2L, Seq("zzz_not_a_token"))).toDF("qid", "terms")
    val batch = Bm25.searchIndexBatch(spark, tmp, qs, topN = 15)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    val single = Seq(0L -> Seq("vector", "hash", "join"), 1L -> Seq("the", "data"))
      .flatMap { case (qid, terms) =>
        Bm25.searchIndex(spark, tmp, terms, topN = 15)
          .withColumn("qid", lit(qid)).select("qid", "rank", "id", "score")
          .collect().map(_.toSeq)
      }
    assert(batch === single, "batch route must equal the per-query route (qid 2 empty)")
  }
}
