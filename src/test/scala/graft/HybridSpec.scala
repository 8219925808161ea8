package graft

import graft.operators.Hybrid
import org.apache.spark.sql.functions._

class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("rrf: hand-computed fusion, absent members contribute 0, id tiebreak") {
    // list A ranks: 1->10, 2->20, 3->30; list B ranks: 1->20, 2->40
    val a = Seq((0L, 10L, 1), (0L, 20L, 2), (0L, 30L, 3)).toDF("qid", "id", "rank")
    val b = Seq((0L, 20L, 1), (0L, 40L, 2)).toDF("qid", "id", "rank")
    val got = Hybrid.rrf(Seq(a, b), topN = 4, rrfK = 60)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect()
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // 20: 1/62 + 1/61 (both lists); 10: 1/61; 40: 1/62; 30: 1/63
    val want = Seq(
      (0L, 1, 20L, r6(1.0 / 62 + 1.0 / 61)),
      (0L, 2, 10L, r6(1.0 / 61)),
      (0L, 3, 40L, r6(1.0 / 62)),
      (0L, 4, 30L, r6(1.0 / 63)))
    assert(got.toSeq === want)
  }

  test("rrf: fuses per query independently") {
    val a = Seq((1L, 10L, 1), (2L, 99L, 1)).toDF("qid", "id", "rank")
    val b = Seq((1L, 10L, 1), (2L, 98L, 1)).toDF("qid", "id", "rank")
    val got = Hybrid.rrf(Seq(a, b), topN = 1)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(got.map(t => (t._1, t._3)) === Set((1L, 10L), (2L, 98L)))
  }

  test("linearFusion: hand-computed normalized weighted sum, degenerate list, absent = 0") {
    // list A scores: 10->4.0, 20->2.0, 30->1.0 (norms 1, 1/3, 0)
    // list B scores: 20->0.9, 40->0.9 (degenerate -> both norm 1.0)
    val a = Seq((0L, 10L, 4.0), (0L, 20L, 2.0), (0L, 30L, 1.0)).toDF("qid", "id", "score")
    val b = Seq((0L, 20L, 0.9), (0L, 40L, 0.9)).toDF("qid", "id", "score")
    val got = Hybrid.linearFusion(Seq(a, b), Seq(0.4, 0.6), topN = 4)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect()
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // 20: (1/3)*0.4 + 1*0.6; 40: 0.6; 10: 0.4; 30: 0
    val want = Seq(
      (0L, 1, 20L, r6(1.0 / 3 * 0.4 + 0.6)),
      (0L, 2, 40L, 0.6),
      (0L, 3, 10L, 0.4),
      (0L, 4, 30L, 0.0))
    assert(got.toSeq === want)
  }

  test("linearFusion: per-query normalization is independent across qids") {
    // qid 1's scores are 10x qid 2's — normalization must erase the scale
    val a = Seq((1L, 10L, 100.0), (1L, 11L, 50.0),
      (2L, 10L, 10.0), (2L, 11L, 5.0)).toDF("qid", "id", "score")
    val got = Hybrid.linearFusion(Seq(a), Seq(1.0), topN = 2)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(got === Set((1L, 1, 10L, 1.0), (1L, 2, 11L, 0.0),
      (2L, 1, 10L, 1.0), (2L, 2, 11L, 0.0)))
  }

  test("mmr: demotes a near-duplicate of the top pick; lambda=1 is plain top-k") {
    // cand 1: the top hit; cand 2: its near-duplicate (slightly lower rel);
    // cand 3: diverse, lower rel. At lambda=0.5 MMR must pick 1 then 3.
    val v1 = Array(1.0f, 0.0f)
    val v2 = Array(0.999f, 0.01f)
    val v3 = Array(0.0f, 1.0f)
    val cand = Seq(
      (0L, 1L, 0.99, v1), (0L, 2L, 0.98, v2), (0L, 3L, 0.80, v3))
      .toDF("qid", "nid", "score", "vec")
    val picked = Hybrid.mmr(cand, lambda = 0.5, k = 2)
      .orderBy("rank").select("nid").as[Long].collect().toSeq
    assert(picked === Seq(1L, 3L))
    val plain = Hybrid.mmr(cand, lambda = 1.0, k = 2)
      .orderBy("rank").select("nid").as[Long].collect().toSeq
    assert(plain === Seq(1L, 2L))
  }

  test("mmr: NaN-scored candidates are unpickable, not task-killing") {
    val cand = Seq(
      (0L, 1L, 0.9, Array(1.0f, 0.0f)),
      (0L, 2L, Double.NaN, Array(0.0f, 1.0f)),
      (0L, 3L, 0.5, Array(0.0f, 0.0f))) // zero-norm: NaN under COSINE
      .toDF("qid", "nid", "score", "vec")
    val got = Hybrid.mmr(cand, 0.5, 10).orderBy("rank")
      .select("nid").as[Long].collect().toSeq
    // 1 picks first (finite rel); 3 stays pickable on its finite relevance
    // (its NaN similarity to picked never updates the penalty — strict
    // compare); 2's NaN relevance is unpickable, so with only 2 left the
    // loop stops cleanly at two picks instead of dying on used(-1)
    assert(got === Seq(1L, 3L))
  }

  test("mmr: k beyond candidate count returns all candidates, deterministic") {
    val cand = Seq(
      (0L, 5L, 0.9, Array(1.0f, 0.0f)), (0L, 6L, 0.7, Array(0.0f, 1.0f)))
      .toDF("qid", "nid", "score", "vec")
    val r1 = Hybrid.mmr(cand, 0.5, 10).collect().map(_.toSeq).toSet
    val r2 = Hybrid.mmr(cand, 0.5, 10).collect().map(_.toSeq).toSet
    assert(r1.size === 2)
    assert(r1 === r2)
  }

  test("rrf composes with the ANN index route (lexical + graph-index lists)") {
    import graft.index.Ann
    import graft.operators.{Bm25, Hybrid}
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("hybann").toString
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64)
    Ann.buildIndex(emb, s"$tmp/idx", params, "vec_id", "embedding")
    val qv = emb.filter(col("vec_id") === 7)
      .select(lit(0L).as("qid"), col("embedding").as("qvec"))
    val annList = Ann.searchIndex(spark, s"$tmp/idx", qv, 20, ef = 64, params)
      .select(col("qid"), col("nid").as("id"), col("rank"))
    val lexList = Bm25.search(docs, "doc_id", "text", Seq("vector", "hash", "join"), topN = 20)
      .select(lit(0L).as("qid"), col("id"), col("rank"))
    val fused = Hybrid.rrf(Seq(lexList, annList), topN = 10).cache()
    assert(fused.count() === 10)
    val lexIds = lexList.select("id").as[Long].collect().toSet
    val annIds = annList.select("id").as[Long].collect().toSet
    val fusedIds = fused.select("id").as[Long].collect().toSet
    assert(fusedIds.subsetOf(lexIds ++ annIds))
    // any doc in BOTH top-20 lists outranks every single-list doc
    // (worst dual 1/80 + 1/80 > best single 1/61), so with a non-empty
    // intersection the fused rank 1 must be dual-present
    val both = lexIds intersect annIds
    assert(both.nonEmpty, "fixture drift: lists no longer overlap")
    val top = fused.filter(col("rank") === 1).select("id").head().getLong(0)
    assert(both.contains(top))
  }

  test("maxSimTopK: matches a from-scratch MaxSim oracle; partial docs score partially") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 6
    def v(): Array[Float] = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    // 20 docs x 3 vectors, 2 queries x 2 vectors
    val docs = for (d <- 0 until 20; i <- 0 until 3) yield (d.toLong, v())
    val qs = for (q <- 0 until 2; i <- 0 until 2) yield (q.toLong, i, v())
    val docDf = docs.toDF("doc_id", "vec")
    val qDf = qs.toDF("qid", "q_idx", "qvec")
    val got = operators.LateInteraction.maxSimTopK(docDf, qDf, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      (1.0 + dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))) / 2.0
    }
    val want = for (q <- 0 until 2) yield {
      val qvs = qs.filter(_._1 == q).sortBy(_._2).map(_._3)
      val scored = (0 until 20).map { d =>
        val dvs = docs.filter(_._1 == d).map(_._2)
        (d.toLong, qvs.map(qv => dvs.map(dv => cos(dv, qv)).max).sum)
      }.sortBy { case (id, s) => (-s, id) }.take(5)
      scored.zipWithIndex.map { case ((id, s), i) => (q.toLong, i + 1, id, s) }
    }
    val wantFlat = want.flatten
    assert(got.length === wantFlat.length)
    got.zip(wantFlat).foreach { case ((gq, gr, gid, gs), (wq, wr, wid, ws)) =>
      assert((gq, gr, gid) === ((wq, wr, wid)))
      assert(math.abs(gs - ws) < 1e-6, s"score mismatch q=$gq rank=$gr: $gs vs $ws")
    }
  }

  test("maxSimTopK: all-pairs candidate restriction equals the cross-join path") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val docs = for (d <- 0 until 15; i <- 0 until 2)
      yield (d.toLong, Array.fill(5)(rnd.nextFloat()))
    val qs = for (q <- 0 until 2; i <- 0 until 2)
      yield (q.toLong, i, Array.fill(5)(rnd.nextFloat()))
    val docDf = docs.toDF("doc_id", "vec")
    val qDf = qs.toDF("qid", "q_idx", "qvec")
    val allPairs = (for (q <- 0 until 2; d <- 0 until 15) yield (q.toLong, d.toLong))
      .toDF("qid", "doc_id")
    val full = operators.LateInteraction.maxSimTopK(docDf, qDf, 5)
      .collect().map(_.toSeq).toSet
    val cand = operators.LateInteraction.maxSimTopK(docDf, qDf, 5,
        candidates = Some(allPairs))
      .collect().map(_.toSeq).toSet
    assert(full === cand)
    // a restricted candidate set: results contained in it, 5 rows per query
    val some = allPairs.filter($"doc_id" < 8)
    val restr = operators.LateInteraction.maxSimTopK(docDf, qDf, 5,
        candidates = Some(some))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(restr.length === 10)
    assert(restr.forall(_._2 < 8))
  }

  test("hybrid_topk and mmr_rerank query entries run green on sf0.001") {
    val hybrid = queries.RetrievalQueries.queries("hybrid_topk")(spark, sfDir)
      .cache()
    assert(hybrid.count() === 10)
    assert(hybrid.select("id").distinct().count() === 10)
    val gates = queries.RetrievalQueries.queries("mmr_rerank")(spark, sfDir)
    assert(gates.filter(col("pass") === false).count() === 0)
  }
}
