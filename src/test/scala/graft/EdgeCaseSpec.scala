package graft

import graft.index.{Ann, Vamana}
import graft.operators.{Dedup, KnnExact, PQ}
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: empty tables, single rows, empty query sets,
  * blank documents — the operators must degrade to empty/identity results,
  * never throw. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("id", "vec")
  private val oneVec = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "vec")
  private val q1 = Seq((0L, Seq(1.0f, 1.0f))).toDF("qid", "qvec")

  test("Vamana handles n=0 and n=1") {
    val g0 = new Vamana(Array.empty, "COSINE").build()
    assert(g0.search(Array(1.0f), 5, 8).isEmpty)
    val g1 = new Vamana(Array(Array(1.0f, 0.0f)), "COSINE").build()
    assert(g1.search(Array(1.0f, 0.0f), 5, 8).map(_._1).toSeq === Seq(0))
  }

  test("exact kNN: empty base, empty queries, single row") {
    assert(KnnExact.knn(emptyVecs, q1, 5, "COSINE").count() === 0)
    val emptyQ = Seq.empty[(Long, Seq[Float])].toDF("qid", "qvec")
    assert(KnnExact.knn(oneVec, emptyQ, 5, "COSINE").count() === 0)
    val r = KnnExact.knn(oneVec, q1, 5, "COSINE").collect()
    assert(r.length === 1 && r(0).getAs[Long]("nid") === 1L)
  }

  test("segmented ANN search: empty base and single row") {
    val (res, _) = Ann.searchWithMetrics(emptyVecs, q1, 5, 8)
    assert(res.count() === 0)
    val (one, _) = Ann.searchWithMetrics(oneVec, q1, 5, 8)
    assert(one.select("nid").as[Long].collect().toSeq === Seq(1L))
  }

  test("dedup operators tolerate blank documents") {
    val docs = Seq((0L, ""), (1L, "   "), (2L, "a b c")).toDF("doc_id", "text")
    val ex = Dedup.exact(docs, "doc_id", "text")
      .select("id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(ex(1L) === true) // "" and whitespace-only share the empty fingerprint
    assert(ex(2L) === false)
    // signatures defined (empty-token docs hash to the empty-min sentinel)
    val sig = docs.select(Dedup.minhashSignature($"text", 4)).collect()
    assert(sig.length === 3)
    val sh = docs.select(Dedup.simhashBits($"text")).as[String].collect()
    assert(sh.forall(_.length === 64))
  }

  test("PQ: k capped by sample size; encode of single vector") {
    val model = PQ.train(oneVec, "vec", m = 2, k = 256) // 1 point -> k=1
    assert(model.codebooks.forall(_.length === 1))
    val enc = PQ.encode(oneVec, "vec", model).select("pq_code").as[Seq[Int]].head()
    assert(enc === Seq(0, 0))
  }

  test("threshold search with no matches returns empty, not error") {
    val r = KnnExact.thresholdSearch(oneVec, q1, threshold = 2.0, metric = "COSINE")
    assert(r.count() === 0)
  }

  test("write-path codegen expressions propagate null rows as null") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(6)
    val model = graft.index.Ivf.IvfModel("COSINE",
      Array.fill(4)(Array.fill(4)(rnd.nextDouble())))
    val pq = PQ.train(
      Seq.fill(20)(Tuple1(Seq.fill(4)(rnd.nextDouble().toFloat))).toDF("vec"),
      "vec", m = 2)
    val df = Seq(
      (1L, Some(Seq(0.1, 0.2, 0.3, 0.4))),
      (2L, None: Option[Seq[Double]])).toDF("id", "v")
    val out = df.select(col("id"),
        graft.functions.VectorExpressions.nearestCentroid(col("v"), model).as("c"),
        graft.functions.VectorExpressions.nearestClusters(col("v"), model, 2).as("p"),
        graft.functions.VectorExpressions.pqEncode(col("v"), pq).as("e"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).isNullAt(1) && !out(1L).isNullAt(2) && !out(1L).isNullAt(3))
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(2) && out(2L).isNullAt(3),
      "null vector row must yield null outputs, not a crash")
    assert(out(1L).getSeq[Int](2).length === 2)
  }

  test("Tables.load normalizes every events ts physical form to TimestampType") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("evts").toString
    // micros NTZ form (what the current driver generation writes)
    spark.sql(
      """SELECT CAST(1 AS BIGINT) AS event_id,
        |  TIMESTAMP_NTZ '2026-01-01 00:00:00' AS ts,
        |  CAST(1 AS BIGINT) AS user_id, 'click' AS event_type,
        |  1.0 AS value, '{}' AS props""".stripMargin)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val ntz = graft.Tables.events(spark, tmp)
    assert(ntz.schema("ts").dataType === TimestampType)
    assert(ntz.select(org.apache.spark.sql.functions.expr("unix_micros(ts)"))
      .head().getLong(0) > 0L)
    // nanos-as-long form (pre-r7 generations; nanosAsLong=true is set in
    // the shared test session): simulate by writing the long column the
    // reader produces
    spark.sql(
      """SELECT CAST(2 AS BIGINT) AS event_id,
        |  CAST(1767225600000000000 AS BIGINT) AS ts,
        |  CAST(1 AS BIGINT) AS user_id, 'click' AS event_type,
        |  1.0 AS value, '{}' AS props""".stripMargin)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val lng = graft.Tables.events(spark, tmp)
    assert(lng.schema("ts").dataType === TimestampType)
    assert(lng.select(org.apache.spark.sql.functions.expr("unix_micros(ts)"))
      .head().getLong(0) === 1767225600000000L)
  }
}
