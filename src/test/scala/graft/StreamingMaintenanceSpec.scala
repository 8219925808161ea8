package graft

import graft.index.Ann
import graft.operators.KnnExact
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._

class StreamingMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() = java.nio.file.Files.createTempDirectory("graft_stream").toString

  test("micro-batch segment ingest: streamed batches are searchable with full recall") {
    val dir = tmpDir()
    val emb = Tables.embeddings(spark, sfDir)
    // two source files -> two micro-batches
    emb.filter($"vec_id" < 250).write.parquet(s"$dir/src/f1")
    emb.filter($"vec_id" >= 250).write.parquet(s"$dir/src/f2")
    val schema = emb.schema

    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64)
    val q = StreamingIngest.startSegmentIngest(
      spark, s"$dir/src/*", schema, s"$dir/idx", params, "vec_id", "embedding")
    q.awaitTermination(120000)

    val queries = emb.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val got = Ann.searchIndex(spark, s"$dir/idx/*", queries, 10, 64, params)
    val want = KnnExact.knn(emb, queries, 10, "COSINE", "vec_id", "embedding")
    val g = got.select("qid", "nid").as[(Long, Long)].collect().toSet
    val w = want.select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(g.intersect(w).size.toDouble / w.size >= 0.95)
  }

  test("watermarked hourly window aggregation matches batch twin") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sfDir)
    ev.write.parquet(s"$dir/events")
    val stream = spark.readStream.schema(ev.schema).parquet(s"$dir/events")
    val agg = StreamingIngest.hourlyEventCounts(stream)
    val q = agg.writeStream.outputMode("append").format("memory").queryName("hourly").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT event_type, CAST(n AS LONG) n FROM hourly")
      .groupBy("event_type").agg(sum("n").as("n"))
      .as[(String, Long)].collect().toMap
    val batch = ev.groupBy("event_type").count().as[(String, Long)].collect().toMap
    // append mode only emits windows past the watermark; all but the last
    // couple hours of events must be present
    assert(streamed.values.sum >= batch.values.sum * 9 / 10)
  }

  test("watermark dedup drops duplicate event ids in-stream") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sfDir).limit(200).cache()
    ev.union(ev).write.parquet(s"$dir/dup") // every event twice
    val stream = spark.readStream.schema(ev.schema).parquet(s"$dir/dup")
    val q = StreamingIngest.dedupedEvents(stream)
      .writeStream.outputMode("append").format("memory").queryName("dedup_ev").start()
    q.processAllAvailable(); q.stop()
    val n = spark.sql("SELECT count(DISTINCT event_id) c, count(*) n FROM dedup_ev").head()
    assert(n.getLong(0) === n.getLong(1), "no duplicate event_ids may survive")
    assert(n.getLong(1) === 200)
  }

  test("stateful sessionization (flatMapGroupsWithState) matches the batch twin on closed sessions") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sfDir)
    ev.write.parquet(s"$dir/events")
    val schema = ev.schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/events")
      .selectExpr("user_id", "event_id", "ts", "value")
      .as[StreamingIngest.SessionEvent]
    val q = StreamingIngest.sessionize(stream)
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT user_id, session_id, n FROM sessions")
      .as[(Long, Int, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // batch twin (oracled): compare CLOSED sessions (streaming can't emit
    // the still-open last session per user without a timeout/final batch)
    val batch = graft.queries.RelationalQueries.eventsSessions(spark, sfDir)
      .select($"user_id", ($"session_id" - 1).as("session_id"), $"n") // batch ids are 1-based
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2.toInt) -> r._3.toInt).toMap
    assert(streamed.nonEmpty)
    for ((k, n) <- streamed) assert(batch.get(k).contains(n), s"session $k count mismatch")
  }

  test("stateful sessionization closes the trailing session by event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "event_id", "ts", "value")
      .as[StreamingIngest.SessionEvent]
    val q = StreamingIngest.sessionize(events, gapMinutes = 30, watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sess_to").start()
    // user 1's only session (timestamps clear of the epoch-0 initial
    // watermark); user 2 keeps the stream alive later
    mem.addData((1L, 1L, ts(100), 1.0), (1L, 2L, ts(105), 2.0))
    q.processAllAvailable()
    // nothing closed yet: no gap observed, watermark still at min 5
    assert(spark.sql("SELECT * FROM sess_to WHERE user_id = 1").count() === 0)
    // advance the watermark far past user 1's gap via another user's event
    mem.addData((2L, 3L, ts(500), 1.0))
    q.processAllAvailable()
    mem.addData((2L, 4L, ts(501), 1.0)) // one more batch so timeouts fire
    q.processAllAvailable()
    mem.addData((1L, 5L, ts(600), 4.0)) // user 1 RETURNS after eviction
    q.processAllAvailable()
    mem.addData((2L, 6L, ts(1200), 1.0)) // advance watermark past the gap
    q.processAllAvailable()
    mem.addData((2L, 7L, ts(1201), 1.0)) // one more batch so timeouts fire
    q.processAllAvailable()
    q.stop()
    val u1 = spark.sql(
      "SELECT session_id, session_start, n, total FROM sess_to WHERE user_id = 1 ORDER BY session_start")
      .collect().map(r => (r.getInt(0), r.getTimestamp(1), r.getInt(2), r.getDouble(3)))
    assert(u1.length === 2, s"expected the original + the post-eviction session, got ${u1.toSeq}")
    assert((u1(0)._1, u1(0)._3, u1(0)._4) === ((0, 2, 3.0)),
      s"user 1's trailing session must close by timeout, got ${u1.toSeq}")
    // state eviction RESET the counter — both sessions carry session_id 0;
    // the collision-proof key is (user_id, session_start), which differs
    assert(u1(1)._1 === 0 && u1(1)._3 === 1 && u1(1)._4 === 4.0)
    assert(u1(0)._2.getTime === ts(100).getTime && u1(1)._2.getTime === ts(600).getTime,
      "session_start must carry each session's first event time across evictions")
  }

  test("session_window sessionization is out-of-order-safe: late event bridges two sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "event_id", "ts", "value")
    val q = StreamingIngest.sessionizeWindowed(events, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_win").start()
    // batch 1: two clusters 50 min apart -> would be two sessions
    mem.addData((1L, 1L, ts(0), 1.0), (1L, 2L, ts(10), 1.0), (1L, 3L, ts(60), 1.0))
    q.processAllAvailable()
    // batch 2: a LATE event at min 35 bridges the gap (arrival-order state
    // would have closed session 1 and mis-assigned this); then an event far
    // past the watermark so the merged session actually emits
    mem.addData((1L, 4L, ts(35), 1.0))
    q.processAllAvailable()
    mem.addData((1L, 9L, ts(60 * 24), 1.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT user_id, session_start, n FROM sess_win")
      .as[(Long, java.sql.Timestamp, Long)].collect()
    // all four early events must land in ONE merged session starting at 0
    assert(rows.exists(r => r._2.getTime == 0L && r._3 == 4L),
      s"late bridge event did not merge the sessions: ${rows.mkString(", ")}")
    assert(!rows.exists(r => r._2.getTime == 3600000L),
      s"a separate session at min 60 survived the bridge: ${rows.mkString(", ")}")
  }

  test("tombstone deletes: merge-on-read filtering, then compaction removes rows") {
    val dir = tmpDir()
    val emb = Tables.embeddings(spark, sfDir)
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64)
    Ann.buildIndex(emb, s"$dir/idx", params, "vec_id", "embedding")

    val queries = emb.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    // tombstone the query vectors themselves (they are their own top-1)
    val deletes = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")

    val live = Ann.searchIndex(spark, s"$dir/idx", queries, 10, 64, params, Some(deletes))
    val liveIds = live.select("nid").as[Long].collect().toSet
    assert(liveIds.intersect(Set(0L, 1L, 2L, 3L, 4L)).isEmpty, "deleted ids must not surface")

    Ann.compact(spark, s"$dir/idx", s"$dir/idx2", params, Some(deletes))
    val after = spark.read.parquet(s"$dir/idx2")
    assert(after.filter(col("node_id") < 5).count() === 0)
    val got = Ann.searchIndex(spark, s"$dir/idx2", queries, 10, 64, params)
    assert(got.select("nid").as[Long].collect().toSet.intersect(Set(0L, 1L, 2L, 3L, 4L)).isEmpty)
    assert(got.groupBy("qid").count().select(min("count")).head().getLong(0) === 10)
  }

  test("incremental delete repair rewrites ONLY tombstoned segments; untouched files identical") {
    val dir = tmpDir()
    val emb = Tables.embeddings(spark, sfDir)
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64, segmentRows = 100)
    Ann.buildIndex(emb.repartition(5), s"$dir/idx", params, "vec_id", "embedding")

    def segFiles(): Map[String, Map[String, (Long, Long)]] = {
      val root = new java.io.File(s"$dir/idx")
      root.listFiles().filter(_.getName.startsWith("seg=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
      }.toMap
    }
    val before = segFiles()
    assert(before.size >= 3, s"want several segments, got ${before.size}")

    // tombstone all nodes of ONE segment's first rows + a few of another
    val idx = spark.read.parquet(s"$dir/idx")
    val segOfNode = idx.select("seg", "node_id").as[(String, Long)].collect()
    val someSeg = segOfNode.head._1
    val delIds = segOfNode.filter(_._1 == someSeg).map(_._2).take(30)
    val deletes = delIds.toSeq.toDF("id")

    Ann.repairDeleted(spark, s"$dir/idx", deletes, params)

    val after = segFiles()
    val affectedSegs = segOfNode.filter(r => delIds.contains(r._2)).map(_._1).toSet.map((s: String) => s"seg=$s")
    // untouched segment directories: byte-for-byte identical file listings
    for ((seg, files) <- before if !affectedSegs.contains(seg))
      assert(after(seg) === files, s"untouched segment $seg was modified")
    // affected segment dirs replaced by fresh seg ids
    affectedSegs.foreach(s => assert(!after.contains(s), s"$s should be dropped"))

    val post = spark.read.parquet(s"$dir/idx")
    assert(post.filter(col("node_id").isin(delIds.map(java.lang.Long.valueOf): _*)).count() === 0,
      "deleted node rows must be gone")
    // graph still navigable: recall vs exact over the live rows
    val queries = emb.filter($"vec_id" < 8).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val got = Ann.searchIndex(spark, s"$dir/idx", queries, 10, 64, params)
    assert(got.select("nid").as[Long].collect().toSet.intersect(delIds.toSet).isEmpty)
    val liveBase = emb.filter(!$"vec_id".isin(delIds.map(java.lang.Long.valueOf): _*))
    val exact = graft.operators.KnnExact.knn(liveBase, queries, 10, "COSINE", "vec_id", "embedding")
    val g = got.select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val w = exact.select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val rec = w.map { case (q, ws) => g.get(q).map(_.intersect(ws).size.toDouble / ws.size).getOrElse(0.0) }.sum / w.size
    assert(rec >= 0.9, s"post-repair recall $rec < 0.9")
    // degree bound still enforced on repaired segments
    assert(post.select(max(size(col("neighbors")))).head().getInt(0) <= (16 * params.neighborOverflow).toInt)
  }

  test("compaction retrains the PQ codebook on a balanced cross-segment sample") {
    val dir = tmpDir()
    val rnd = new scala.util.Random(5)
    // two batch sub-indexes with DIFFERENT distributions: a big old batch
    // and a small fresh one shifted far away
    val big = (0 until 4000).map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat())))
    val small = (4000 until 4400).map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat() + 4.0f)))
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64, pqM = 4, pqK = 16)
    Ann.buildIndex(big.toDF("id", "vec").repartition(2), s"$dir/idx/batch=0", params)
    Ann.buildIndex(small.toDF("id", "vec").repartition(1), s"$dir/idx/batch=1", params)

    Ann.compact(spark, s"$dir/idx/*", s"$dir/out", params)
    val m = graft.operators.PQ.load(spark, s"$dir/out/_pq_model")
    assert(m.m === 4 && m.codebooks(0).length <= 16, "retrained codebook keeps base (m, k)")
    // the retrained codebook must cover the small batch's far-away region:
    // encode+decode error there stays comparable to the big region's
    def avgErr(rows: Seq[(Long, Seq[Float])]): Double = {
      val errs = rows.take(200).map { case (_, v) =>
        val d = v.map(_.toDouble).toArray
        val dec = m.decode(m.encodeOne(d))
        d.zip(dec).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      errs.sum / errs.size
    }
    val (eBig, eSmall) = (avgErr(big), avgErr(small))
    assert(eSmall < eBig * 8,
      s"small fresh batch must not be drowned out: err(small)=$eSmall vs err(big)=$eBig")
    // search over the compacted index still answers small-batch queries
    val queries = small.take(8).map { case (id, v) => (id, v) }.toDF("qid", "qvec")
    val got = Ann.searchIndex(spark, s"$dir/out", queries, 5, 64, params, rerankK = 40)
    assert(got.groupBy("qid").count().select(min("count")).head().getLong(0) === 5)
    val gotIds = got.select("nid").as[Long].collect()
    assert(gotIds.count(_ >= 4000) >= gotIds.length * 3 / 4,
      "small-batch queries should find small-batch neighbors")
  }

  test("rescore keeps graph topology, re-orders edges and serves the new metric") {
    val dir = tmpDir()
    val emb = Tables.embeddings(spark, sfDir)
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64, segmentRows = 150)
    Ann.buildIndex(emb, s"$dir/cos", params, "vec_id", "embedding")

    Ann.rescore(spark, s"$dir/cos", s"$dir/euc", "EUCLIDEAN", params)

    // topology preserved: per (seg, local_id) the neighbor SET is unchanged
    val before = spark.read.parquet(s"$dir/cos")
      .select(col("seg"), col("local_id"), col("neighbors"))
      .as[(String, Int, Array[Int])].collect()
      .map { case (s, l, nb) => ((s, l), nb.toSet) }.toMap
    val after = spark.read.parquet(s"$dir/euc")
      .select(col("seg"), col("local_id"), col("neighbors"), col("node_id"), col("vec"))
      .as[(String, Int, Array[Int], Long, Array[Float])].collect()
    assert(after.length === before.size)
    after.foreach { case (s, l, nb, _, _) =>
      assert(before((s, l)) === nb.toSet, s"topology changed at ($s, $l)")
    }

    // adjacency re-ordered by the NEW metric: neighbor scores non-increasing
    val bySeg = after.groupBy(_._1)
    bySeg.values.foreach { rows =>
      val vecs = rows.sortBy(_._2).map(_._5)
      def simE(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var i = 0
        while (i < a.length) { val t = a(i).toDouble - b(i).toDouble; d += t * t; i += 1 }
        1.0 / (1.0 + d)
      }
      rows.take(20).foreach { case (_, l, nb, _, _) =>
        val scores = nb.map(j => simE(vecs(l), vecs(j)))
        assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
          s"neighbors of local $l not ordered by EUCLIDEAN score")
      }
    }

    // the rescored index serves the new metric: recall vs the exact
    // EUCLIDEAN oracle clears the same gate as a fresh build
    val queries = emb.filter($"vec_id" < 8).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val eucParams = params.copy(metric = "EUCLIDEAN")
    val got = Ann.searchIndex(spark, s"$dir/euc", queries, 10, 64, eucParams)
    val exact = graft.operators.KnnExact.knn(emb, queries, 10, "EUCLIDEAN", "vec_id", "embedding")
    val rec = graft.operators.Metrics.recallAtK(got, exact, 10).head().getDouble(0)
    assert(rec >= 0.9, s"rescored-index EUCLIDEAN recall $rec < 0.9")
  }

  test("compaction folds many small segments into fewer right-sized ones") {
    val dir = tmpDir()
    val emb = Tables.embeddings(spark, sfDir)
    val params = Ann.Params(metric = "COSINE", maxDegree = 16, beamWidth = 64, segmentRows = 100)
    Ann.buildIndex(emb.repartition(8), s"$dir/small", params, "vec_id", "embedding")
    val nSmall = spark.read.parquet(s"$dir/small").select("seg").distinct().count()
    val big = params.copy(segmentRows = 10000)
    Ann.compact(spark, s"$dir/small", s"$dir/big", big)
    val nBig = spark.read.parquet(s"$dir/big").select("seg").distinct().count()
    assert(nBig < nSmall)
    assert(spark.read.parquet(s"$dir/big").count() === emb.count())
  }

  test("batch-mode sessionize emits the trailing session and matches the batch twin exactly") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "ts", "value")
      .as[StreamingIngest.SessionEvent]
    val got = StreamingIngest.sessionize(ev)
      .select($"user_id", $"session_id", $"n", $"total")
      .as[(Long, Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, math.round(r._4 * 1e6)))
      .toMap
    val want = graft.queries.RelationalQueries.eventsSessions(spark, sfDir)
      .select($"user_id", ($"session_id" - 1).as("session_id"), $"n", $"total")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2.toInt) -> (r._3.toInt, math.round(r._4 * 1e6)))
      .toMap
    // EXACT twin equality including each user's final session — batch mode
    // sees the whole history, so nothing may be lost to discarded state
    assert(got.size === want.size,
      s"session count mismatch: got ${got.size}, want ${want.size}")
    for ((k, v) <- want) assert(got.get(k).contains(v), s"session $k mismatch")
  }
}
