package graft

import graft.operators.{KnnExact, TopK}
import org.apache.spark.sql.functions._

class TopKKnnSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAgg keeps k best with score desc, id asc tiebreak") {
    val rows = Seq(
      (1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.9), (1L, 13L, 0.1),
      (2L, 20L, 0.3), (2L, 21L, 0.2))
    val df = rows.toDF("g", "id", "s")
    val agg = TopK.udf(2)
    val out = df.groupBy("g").agg(agg($"id", $"s").as("t"))
      .select($"g", $"t").as[(Long, Seq[(Long, Double)])].collect().toMap
    assert(out(1L) === Seq((11L, 0.9), (12L, 0.9))) // tie -> lower id first
    assert(out(2L) === Seq((20L, 0.3), (21L, 0.2)))
  }

  test("TopKAgg merge path handles many values per group") {
    val df = (1 to 10000).map(i => (i % 3L, i.toLong, (i % 97).toDouble)).toDF("g", "id", "s")
    val agg = TopK.udf(5)
    val out = df.groupBy("g").agg(agg($"id", $"s").as("t"))
      .select($"g", $"t").as[(Long, Seq[(Long, Double)])].collect().toMap
    for ((_, topk) <- out) {
      assert(topk.size === 5)
      assert(topk.forall(_._2 === 96.0)) // plenty of 96-scored in each group
      assert(topk.map(_._1) === topk.map(_._1).sorted) // id asc within ties
    }
  }

  test("knn matches driver-table brute force via window") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val got = KnnExact.knn(emb, queries, 5, "COSINE", "vec_id", "embedding")
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet

    // independent reference: window row_number plan
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions
    val scored = emb.crossJoin(broadcast(queries))
      .withColumn("s", VectorFunctions.cosineSim($"embedding", $"qvec"))
    val w = Window.partitionBy("qid").orderBy($"s".desc, $"vec_id".asc)
    val want = scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"qid", $"rank".cast("int"), $"vec_id").as[(Long, Int, Long)].collect().toSet
    assert(got === want)
  }

  test("threshold search returns exactly the rows above threshold") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" === 0).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val got = KnnExact.thresholdSearch(emb, queries, 0.6, "COSINE", "vec_id", "embedding")
    import graft.functions.VectorFunctions
    val want = emb.crossJoin(broadcast(queries))
      .withColumn("s", VectorFunctions.cosineSim($"embedding", $"qvec"))
      .filter($"s" >= 0.6).count()
    assert(got.count() === want)
    assert(got.agg(min("score")).head().getDouble(0) >= 0.6)
  }

  test("contrastive mining: bands separated, self excluded, negatives are the hardest") {
    val emb = Tables.embeddings(spark, sfDir)
    val anchors = emb.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val posT = 0.62; val negT = 0.6
    val got = operators.ContrastiveMining.minePairs(emb, anchors, 4, 4, posT, negT)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    // no anchor paired with itself; bands respected
    got.foreach { case (q, kind, _, n, s) =>
      assert(n !== q)
      if (kind == "pos") assert(s >= posT - 1e-9) else assert(s < negT + 1e-9)
    }
    // per (qid, kind) ranks dense from 1, scores non-increasing
    got.groupBy(t => (t._1, t._2)).values.foreach { ms =>
      val sorted = ms.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === (1 to sorted.length).toSeq)
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._5 >= p(1)._5))
    }
    // negatives are the HARDEST below negT: no unpicked item below negT
    // scores above a picked negative (checked for anchor 0)
    import graft.functions.VectorFunctions
    val all0 = emb.crossJoin(broadcast(anchors.filter($"qid" === 0)))
      .filter($"vec_id" =!= $"qid")
      .withColumn("s", VectorFunctions.cosineSim($"embedding", $"qvec"))
      .filter($"s" < negT).orderBy($"s".desc, $"vec_id".asc)
      .select("vec_id").as[Long].take(4).toSeq
    val neg0 = got.filter(t => t._1 == 0L && t._2 == "neg").sortBy(_._3).map(_._4).toSeq
    assert(neg0 === all0)
  }
}
