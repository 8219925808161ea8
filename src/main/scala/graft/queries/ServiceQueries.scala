package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

import graft.Tables
import graft.operators.{Dedup, KnnExact}
import graft.service.VectorService
import graft.sources.Fvecs
import graft.streaming.StreamingDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-verifiable gates for the service / source / streaming surfaces
  * that would otherwise be spec-only (invisible to the DuckDB oracle):
  *
  *   - `service_lifecycle` — the [[VectorService]] IPC verb set
  *     (CREATE / WRITE / BULKLOAD / OPTIMIZE / SEARCH / DELETE / MEMORY,
  *     `IPCService.java:85-93`) run end-to-end on the embeddings table.
  *   - `vecs_source` — the fvecs/ivecs DataSource V2 (S1/S2): multi-file
  *     round-trip identity with offset-derived dense ids, planning-time
  *     id-range partition pruning, and the ivecs variant.
  *   - `stream_dedup` — streaming exact + near-dup dedup compared against
  *     the batch operators on the same corpus (bounded multi-micro-batch
  *     replay; the STREAMING result must equal the BATCH oracle-gated one).
  *
  * All three follow the [[Gates]] pattern: the Spark side computes invariant
  * booleans, the DuckDB twin is the constant relation — so the driver's
  * hash-match passes iff every gate held.
  */
object ServiceQueries {

  private val nQueries = 5
  private val k = 10

  private def recallOf(results: DataFrame, exact: DataFrame, kk: Int = k): Double =
    LocalEval.recallAtK(results, exact, kk)

  private def queries0(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  // ---------------------------------------------------------------- service

  /** Deleted ids (none of them query ids). */
  private val delIds: Seq[Long] = (50L until 70L)

  /** One-time lifecycle per scale dir: "live" gets two WRITE+OPTIMIZE
    * batches plus tombstones (merge-on-read state); "packed" gets the same
    * data via BULKLOAD, the same tombstones, then OPTIMIZE(compactNow). */
  private val serviceRoots = new TrieMap[String, String]()

  /** Full-gate memo (the [[streamDedup]] pattern): everything below is
    * deterministic per dir, so the searches/memory probes run once per JVM
    * and repeated sweep calls rebuild the tiny gate relation. */
  private val svcGateMemo = new TrieMap[String, Seq[(String, Double, Boolean)]]()

  private def serviceLifecycle(s: SparkSession, dir: String): DataFrame = {
    val gates = svcGateMemo.getOrElseUpdate(dir, serviceLifecycleGates(s, dir))
    Gates.df(s, gates)
  }

  private def serviceLifecycleGates(s: SparkSession, dir: String): Seq[(String, Double, Boolean)] = {
    val emb = Tables.embeddings(s, dir)
    val n = emb.count()
    val root = serviceRoots.getOrElseUpdate(dir, {
      val r = java.nio.file.Files.createTempDirectory("graft_svc").toString
      val svc = new VectorService(s, r)
      svc.create("live", metric = "COSINE", maxDegree = 32, beamWidth = 100)
      svc.write("live", emb.filter(col("vec_id") < n / 2), "vec_id", "embedding")
      svc.optimize("live")
      svc.write("live", emb.filter(col("vec_id") >= n / 2), "vec_id", "embedding")
      svc.optimize("live") // second immutable batch under gen=0
      svc.delete("live", s.range(delIds.head, delIds.last + 1).toDF("id"))

      svc.create("packed", metric = "COSINE", maxDegree = 32, beamWidth = 100)
      svc.bulkLoad("packed", s"$dir/embeddings.parquet", "vec_id", "embedding")
      svc.optimize("packed")
      svc.delete("packed", s.range(delIds.head, delIds.last + 1).toDF("id"))
      svc.optimize("packed", compactNow = true) // gen=0 -> gen=1, tombstones folded
      r
    })
    val svc = new VectorService(s, root)
    val live = emb.filter(!col("vec_id").isin(delIds: _*))
    val exact = KnnExact.knn(live, queries0(s, dir), k, "COSINE", "vec_id", "embedding")

    def gatesFor(name: String): (Long, Double) = {
      val res = svc.search(name, queries0(s, dir), k).cache()
      (res.filter(col("nid").isin(delIds: _*)).count(), recallOf(res, exact))
    }
    val (liveDel, liveRec) = gatesFor("live")
    val (packDel, packRec) = gatesFor("packed")

    def mem(name: String): Map[String, (Long, Long)] =
      svc.memory(name).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val liveMem = mem("live")
    val packMem = mem("packed")

    Seq(
      ("svc_live_merge_on_read_no_deleted", 0.0, liveDel == 0L),
      ("svc_live_recall_ge_0.9", 0.9, liveRec >= 0.9),
      ("svc_packed_no_resurrection", 0.0, packDel == 0L),
      ("svc_packed_recall_ge_0.9", 0.9, packRec >= 0.9),
      // pending flushed by OPTIMIZE; tombstones still pending on "live",
      // folded (dir dropped) on "packed"; compaction flipped to gen=1
      ("svc_mem_pending_flushed", 0.0,
        liveMem("pending")._2 == 0L && packMem("pending")._2 == 0L),
      ("svc_mem_tombstone_state", 1.0,
        liveMem("deletes")._2 > 0L && packMem("deletes")._2 == 0L),
      ("svc_mem_gen_flipped", 1.0,
        liveMem.contains("gen=0") && liveMem("gen=0")._2 > 0L &&
          packMem.contains("gen=1") && packMem("gen=1")._2 > 0L))
  }

  private val serviceLifecycleSql: String = Gates.sql(Seq(
    ("svc_live_merge_on_read_no_deleted", 0.0),
    ("svc_live_recall_ge_0.9", 0.9),
    ("svc_packed_no_resurrection", 0.0),
    ("svc_packed_recall_ge_0.9", 0.9),
    ("svc_mem_pending_flushed", 0.0),
    ("svc_mem_tombstone_state", 1.0),
    ("svc_mem_gen_flipped", 1.0)))

  // ----------------------------------------------------------- fvecs/ivecs

  /** One-time fixture per scale dir: the embeddings table written as TWO
    * fvecs files (cross-file dense-id contract) plus one deterministic
    * ivecs file. Bounded driver work: <= 2000 rows x 64 floats. */
  private val vecsFixtures = new TrieMap[String, (String, Long)]()

  // ------------------------------------------------------------- IPC wire

  private val ipcGateMemo = new TrieMap[String, Seq[(String, Double, Boolean)]]()

  /** The reference's WIRE protocol (`IPCService.java` — newline-delimited
    * verbs over a unix socket, OK/ERROR/RESULT responses) run end-to-end
    * against [[graft.service.IpcServer]]: a real socket client CREATEs a
    * session index, WRITEs the first 120 embedding vectors as text
    * literals, OPTIMIZEs, SEARCHes the gate queries, and reads MEMORY.
    * Result ids are insertion ordinals (the reference's contract), mapped
    * back to vec_ids driver-side for the exact-twin compare. */
  private def ipcLifecycle(s: SparkSession, dir: String): DataFrame =
    Gates.df(s, ipcGateMemo.getOrElseUpdate(dir, ipcLifecycleGates(s, dir)))

  private def ipcLifecycleGates(s: SparkSession, dir: String): Seq[(String, Double, Boolean)] = {
    import java.net.{StandardProtocolFamily, UnixDomainSocketAddress}
    import java.nio.ByteBuffer
    import java.nio.charset.StandardCharsets
    val emb = Tables.embeddings(s, dir)
    val rows = emb.orderBy("vec_id")
      .select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
      .limit(120)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val ordToId = rows.map(_._1) // insertion ordinal -> vec_id
    val root = java.nio.file.Files.createTempDirectory("graft_ipcg").toString
    val sock = s"/tmp/graft_ipcg_${System.nanoTime() % 1000000}.sock"
    val srv = new graft.service.IpcServer(s, root, sock)
    try {
      val ch = java.nio.channels.SocketChannel.open(StandardProtocolFamily.UNIX)
      ch.connect(UnixDomainSocketAddress.of(sock))
      val pendingIn = new StringBuilder
      val buf = ByteBuffer.allocate(1 << 16)
      def send(line: String): String = {
        val out = ByteBuffer.wrap((line + "\n").getBytes(StandardCharsets.UTF_8))
        while (out.hasRemaining) ch.write(out)
        var nl = pendingIn.indexOf("\n")
        while (nl < 0) {
          // surface a dropped connection as a diagnostic, not a substring OOB
          require(ch.read(buf) != -1, s"IPC server closed the connection during: $line")
          buf.flip(); pendingIn.append(StandardCharsets.UTF_8.decode(buf)); buf.clear()
          nl = pendingIn.indexOf("\n")
        }
        val resp = pendingIn.substring(0, nl)
        pendingIn.delete(0, nl + 1)
        resp
      }
      val dim = rows(0)._2.length
      val createdOk = send(s"CREATE $dim COSINE 32 100") == "OK"
      // Float.toString round-trips exactly through parseFloat
      val writeOk = rows.grouped(16).forall { g =>
        send("WRITE " + g.map(_._2.mkString("[", ",", "]")).mkString(" ")) == "OK"
      }
      val earlySearchErrs = send("SEARCH 64 1 " + rows(0)._2.mkString("[", ",", "]"))
        .startsWith("ERROR")
      val optimizeOk = send("OPTIMIZE") == "OK"
      val qs = queries0(s, dir)
        .select(col("qid").cast("long"), col("qvec").cast("array<float>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val resp = send(s"SEARCH 64 $k " + qs.map(_._2.mkString("[", ",", "]")).mkString(" "))
      val searched = resp.startsWith("RESULT ")
      val got: Map[Long, Set[Long]] =
        if (!searched) Map.empty
        else resp.stripPrefix("RESULT ").split(" ").zipWithIndex.map { case (l, i) =>
          val ids = l.stripPrefix("[").stripSuffix("]").split(",").filter(_.nonEmpty)
            .map(o => ordToId(o.toInt)).toSet
          qs(i)._1 -> ids
        }.toMap
      import s.implicits._
      val subset = rows.map { case (id, v) => (id, v.toSeq) }.toSeq.toDF("vec_id", "embedding")
      val exact = KnnExact.knn(subset, queries0(s, dir), k, "COSINE", "vec_id", "embedding")
        .select("qid", "nid").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
      val hits = exact.map { case (q, want) =>
        got.get(q).map(_.intersect(want).size).getOrElse(0) }.sum
      val rec = hits.toDouble / math.max(1, exact.map(_._2.size).sum)
      // MEMORY is wire-identical to the reference (`RESULT <kb>`, one
      // long); serving-regime stats (segments=/routable=) live on the
      // STATS extension verb. An IPC-built tree is arrival-partitioned:
      // segments >= 1, routable = 0 (exhaustive regime).
      val memOk = send("MEMORY") match {
        case m if m.startsWith("RESULT ") =>
          scala.util.Try(m.stripPrefix("RESULT ").toLong).toOption.exists(_ > 0L)
        case _ => false
      }
      val statsOk = send("STATS") match {
        case m if m.startsWith("RESULT ") =>
          val toks = m.stripPrefix("RESULT ").split(" ")
          toks.exists(t => t.startsWith("kb=") && t.drop(3).toLong > 0L) &&
            toks.exists(t => t.startsWith("segments=") && t.drop(9).toLong >= 1L) &&
            toks.contains("routable=0")
        case _ => false
      }
      val badVerbErrs = send("NOPE x").startsWith("ERROR")
      ch.close()
      Seq(
        ("ipc_lifecycle_verbs_ok", 1.0, createdOk && writeOk && optimizeOk && searched),
        ("ipc_search_before_optimize_errors", 1.0, earlySearchErrs),
        ("ipc_search_recall_ge_0.9", 0.9, rec >= 0.9),
        ("ipc_memory_positive", 1.0, memOk),
        ("ipc_stats_regime_visible", 1.0, statsOk),
        ("ipc_bad_verb_errors_conn_survives", 1.0, badVerbErrs))
    } finally srv.close()
  }

  private val ipcLifecycleSql: String = Gates.sql(Seq(
    ("ipc_lifecycle_verbs_ok", 1.0),
    ("ipc_search_before_optimize_errors", 1.0),
    ("ipc_search_recall_ge_0.9", 0.9),
    ("ipc_memory_positive", 1.0),
    ("ipc_stats_regime_visible", 1.0),
    ("ipc_bad_verb_errors_conn_survives", 1.0)))

  // ------------------------------------------------------------- IPC churn

  private val churnGateMemo = new TrieMap[String, Seq[(String, Double, Boolean)]]()

  /** Streaming-maintenance ECONOMICS through the wire (the driver-visible
    * form of `ChurnSpec`, mirroring the reference's
    * `TestConcurrentReadWriteDeletes` + `docs/compaction.md`): a clean bulk
    * is written over many WRITE batches and flushed, then two
    * WRITE/OPTIMIZE/DELETE/compact cycles must each (a) run in merge mode,
    * (b) CARRY the clean bulk segment untouched (narrow copy, no graph
    * work), (c) pay beam work bounded by the dirty/new rows — a full
    * rebuild visits >= bulkN x beamWidth nodes — and (d) never resurrect a
    * tombstoned id, while the generation chain stays GC-bounded. */
  private def ipcChurn(s: SparkSession, dir: String): DataFrame =
    Gates.df(s, churnGateMemo.getOrElseUpdate(dir, ipcChurnGates(s)))

  private def ipcChurnGates(s: SparkSession): Seq[(String, Double, Boolean)] = {
    import java.net.{StandardProtocolFamily, UnixDomainSocketAddress}
    import java.nio.ByteBuffer
    import java.nio.charset.StandardCharsets
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_churn_gate").toString
    val sock = s"/tmp/graft_churng_${System.nanoTime() % 1000000}.sock"
    val srv = new graft.service.IpcServer(s, root, sock)
    val dim = 8
    val bulkN = 6000
    val freshN = 300
    val delN = 20
    val beamWidth = 64
    val rnd = new java.util.Random(11)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    def vecStr(v: Array[Float]): String = v.mkString("[", ",", "]")
    try {
      val ch = java.nio.channels.SocketChannel.open(StandardProtocolFamily.UNIX)
      ch.connect(UnixDomainSocketAddress.of(sock))
      val pendingIn = new StringBuilder
      val buf = ByteBuffer.allocate(1 << 20)
      def send(line: String): String = {
        val out = ByteBuffer.wrap((line + "\n").getBytes(StandardCharsets.UTF_8))
        while (out.hasRemaining) ch.write(out)
        var nl = pendingIn.indexOf("\n")
        while (nl < 0) {
          require(ch.read(buf) != -1, s"IPC server closed the connection during: ${line.take(40)}")
          buf.flip(); pendingIn.append(StandardCharsets.UTF_8.decode(buf)); buf.clear()
          nl = pendingIn.indexOf("\n")
        }
        val resp = pendingIn.substring(0, nl)
        pendingIn.delete(0, nl + 1)
        resp
      }
      var ok = send(s"CREATE $dim COSINE 16 $beamWidth") == "OK"
      (0 until bulkN).grouped(500).foreach { g =>
        ok &= send("WRITE " + g.map(_ => vecStr(vec())).mkString(" ")) == "OK"
      }
      ok &= send("OPTIMIZE") == "OK"

      val svc = new VectorService(s, root)
      val name = "ipc_session_1"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sessionState.newHadoopConf())
      def genCount: Int =
        Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/$name/gen=*")))
          .map(_.length).getOrElse(0)

      var nextId = bulkN.toLong
      val deleted = scala.collection.mutable.Set.empty[Long]
      var allMerge, allCarried, allBounded, allDidWork = true
      var noResurrection, gensBounded = true
      for (_ <- 1 to 2) {
        val fresh = Array.fill(freshN)(vec())
        val freshIds = (nextId until nextId + freshN).toArray
        ok &= send("WRITE " + fresh.map(vecStr).mkString(" ")) == "OK"
        nextId += freshN
        ok &= send("OPTIMIZE") == "OK"
        val delIds = freshIds.take(delN)
        delIds.foreach(deleted += _)
        svc.delete(name, delIds.toSeq.toDF("id"))
        val stats = svc.optimize(name, compactNow = true)
          .getOrElse(graft.index.Ann.CompactStats("none", -1L, -1L, -1L))
        allMerge &= stats.mode == "merge"
        allCarried &= stats.carriedSegments >= 1
        allDidWork &= stats.visited > 0 && stats.reusedEdges > 0
        allBounded &= stats.visited < bulkN.toLong * beamWidth
        val probes = delIds.take(3).map(id => fresh((id - freshIds.head).toInt))
        val r = send(s"SEARCH $beamWidth 5 " + probes.map(vecStr).mkString(" "))
        val returned =
          if (!r.startsWith("RESULT ")) Array.empty[Long]
          else r.stripPrefix("RESULT ").split(" ")
            .flatMap(_.stripPrefix("[").stripSuffix("]").split(",").filter(_.nonEmpty))
            .map(_.toLong)
        noResurrection &= r.startsWith("RESULT ") && !returned.exists(deleted)
        gensBounded &= genCount <= 2
      }
      ch.close()
      Seq(
        ("ipc_churn_verbs_ok", 1.0, ok),
        ("ipc_churn_mode_merge", 1.0, allMerge),
        ("ipc_churn_carried_ge_1", 1.0, allCarried),
        ("ipc_churn_did_merge_work", 1.0, allDidWork),
        ("ipc_churn_work_bounded_by_dirty", 1.0, allBounded),
        ("ipc_churn_no_resurrection", 1.0, noResurrection),
        ("ipc_churn_generations_gced", 1.0, gensBounded))
    } finally srv.close()
  }

  private val ipcChurnSql: String = Gates.sql(Seq(
    ("ipc_churn_verbs_ok", 1.0),
    ("ipc_churn_mode_merge", 1.0),
    ("ipc_churn_carried_ge_1", 1.0),
    ("ipc_churn_did_merge_work", 1.0),
    ("ipc_churn_work_bounded_by_dirty", 1.0),
    ("ipc_churn_no_resurrection", 1.0),
    ("ipc_churn_generations_gced", 1.0)))

  private val vecsGateMemo = new TrieMap[String, Seq[(String, Double, Boolean)]]()

  private def vecsSource(s: SparkSession, dir: String): DataFrame = {
    val gates = vecsGateMemo.getOrElseUpdate(dir, vecsSourceGates(s, dir))
    Gates.df(s, gates)
  }

  private def vecsSourceGates(s: SparkSession, dir: String): Seq[(String, Double, Boolean)] = {
    val emb = Tables.embeddings(s, dir)
    val (tmp, n) = vecsFixtures.getOrElseUpdate(dir, {
      val t = java.nio.file.Files.createTempDirectory("graft_vecs").toString
      val rows = emb.orderBy("vec_id")
        .select(col("embedding").cast("array<float>"))
        .collect().map(_.getSeq[Float](0).toArray)
      val half = rows.length / 2
      Fvecs.writeFvecs(s"$t/part0.fvecs", rows.iterator.take(half))
      Fvecs.writeFvecs(s"$t/part1.fvecs", rows.iterator.drop(half))
      Fvecs.writeIvecs(s"$t/gt.ivecs",
        rows.indices.iterator.map(i => Array(i, i * 2, (i * 7) % rows.length)))
      (t, rows.length.toLong)
    })
    val half = n / 2

    val fv = s.read.format("fvecs").load(s"$tmp/part0.fvecs", s"$tmp/part1.fvecs")
    // round-trip identity: every id present once, vector bit-equal to the
    // source (same float conversion on both paths)
    val joined = fv.join(
      emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<float>").as("src")), "id")
    val identical = joined.filter(col("vec") === col("src")).count()

    // planning-time id-range pruning: restricting to the first file's id
    // range must plan strictly fewer input slices than the full scan
    val fullParts = fv.rdd.getNumPartitions
    val pruned = s.read.format("fvecs")
      .load(s"$tmp/part0.fvecs", s"$tmp/part1.fvecs").filter(col("id") < half)
    val prunedParts = pruned.rdd.getNumPartitions
    val prunedOk = pruned.count() == half &&
      pruned.agg(max("id")).head().getLong(0) == half - 1 &&
      prunedParts < fullParts

    // ivecs: offset-derived ids line up with the generator's row index
    val iv = s.read.format("ivecs").load(s"$tmp/gt.ivecs")
    val ivOk = iv.count() == n &&
      iv.filter(col("neighbors") ===
        array(col("id").cast("int"), (col("id") * 2).cast("int"),
          pmod(col("id") * 7, lit(n)).cast("int"))).count() == n

    Seq(
      ("vecs_roundtrip_identical", 1.0, fv.count() == n && identical == n),
      ("vecs_id_range_prunes_slices", 1.0, prunedOk),
      ("vecs_ivecs_roundtrip", 1.0, ivOk))
  }

  private val vecsSourceSql: String = Gates.sql(Seq(
    ("vecs_roundtrip_identical", 1.0),
    ("vecs_id_range_prunes_slices", 1.0),
    ("vecs_ivecs_roundtrip", 1.0)))

  // -------------------------------------------------------- streaming dedup

  private val streamGateMemo = new TrieMap[String, Seq[(String, Double, Boolean)]]()
  private val streamNames = new AtomicInteger(0)

  /** Replays the documents table as a 3-file stream (maxFilesPerTrigger=1 ->
    * multiple micro-batches) with event time = doc_id minutes, and checks
    * the STREAMING dedup results against the BATCH operators (which are
    * themselves DuckDB-oracled via `dedup_exact` / `minhash_pairs`):
    * exact dedup keeps exactly one survivor per fingerprint, and the LSH
    * near-dup pair set is IDENTICAL to [[Dedup.minhashLsh]]'s. */
  private def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val gates = streamGateMemo.getOrElseUpdate(dir, {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .withColumn("ts", timestamp_seconds(lit(1767225600L) + col("doc_id") * 60))
      val nDocs = docs.count()
      val tmp = java.nio.file.Files.createTempDirectory("graft_sdq").toString
      // three event-time-ordered files (coalesce(1): ONE part-file each, so
      // maxFilesPerTrigger=1 means exactly 3 micro-batches — every extra
      // part-file would be its own micro-batch paying full state-store
      // overhead); watermark >> corpus span, so no state is evicted
      // mid-replay and batch order cannot change results
      docs.filter(col("doc_id") < nDocs / 3).coalesce(1).write.parquet(s"$tmp/f1")
      docs.filter(col("doc_id") >= nDocs / 3 && col("doc_id") < 2 * nDocs / 3)
        .coalesce(1).write.parquet(s"$tmp/f2")
      docs.filter(col("doc_id") >= 2 * nDocs / 3).coalesce(1).write.parquet(s"$tmp/f3")

      def stream = s.readStream
        .schema("doc_id LONG, text STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$tmp/f*")

      val uniq = streamNames.incrementAndGet()

      val qe = StreamingDedup.dedupExact(stream, "text", "ts", watermark = "720 hours")
        .writeStream.outputMode("append").format("memory").queryName(s"sq_exact_$uniq").start()
      qe.processAllAvailable(); qe.stop()
      val survived = s.table(s"sq_exact_$uniq").cache()
      val fpCounts = survived.groupBy("fp").count()
      val expectedFps = docs
        .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
        .select("fp").distinct().count()

      // SAME banding/threshold as the oracled batch query (minhash_pairs):
      // selective bands matter — permissive banding (e.g. r=2) on this
      // template-heavy corpus matches nearly every doc pair (~n^2 candidates)
      val qp = StreamingDedup.nearDupPairs(stream, "doc_id", "text", "ts",
          numHashes = 32, rowsPerBand = 8, threshold = 0.9,
          watermark = "720 hours", joinLag = "720 hours")
        .writeStream.outputMode("append").format("memory").queryName(s"sq_pairs_$uniq").start()
      qp.processAllAvailable(); qp.stop()
      val sPairs = s.table(s"sq_pairs_$uniq").select("id1", "id2", "jaccard")
      val bPairs = Dedup.minhashLsh(docs, "doc_id", "text",
        numHashes = 32, rowsPerBand = 8, threshold = 0.9)
        .select("id1", "id2", "jaccard")
      val missing = bPairs.exceptAll(sPairs).count()
      val extra = sPairs.exceptAll(bPairs).count()

      Seq(
        ("sdq_one_survivor_per_fp", 1.0,
          survived.count() == expectedFps && fpCounts.filter(col("count") > 1).count() == 0L),
        ("sdq_pairs_eq_batch_lsh", 0.0, missing == 0L && extra == 0L))
    })
    Gates.df(s, gates)
  }

  private val streamDedupSql: String = Gates.sql(Seq(
    ("sdq_one_survivor_per_fp", 1.0),
    ("sdq_pairs_eq_batch_lsh", 0.0)))

  private val clusteredGateMemo = new TrieMap[String, Seq[(String, Double, Boolean)]]()

  private def serviceClustered(s: SparkSession, dir: String): DataFrame =
    Gates.df(s, clusteredGateMemo.getOrElseUpdate(dir, serviceClusteredGates(s)))

  /** OPTIMIZE CLUSTER promotion (the routed-serving regime through the
    * service surface): an incrementally-built generation is NOT routable;
    * a cluster-compaction re-partitions live rows k-means-cell-per-segment,
    * marks the generation `_clustered`, and SEARCH (AutoProbe default)
    * tracks the exhaustive answer on the same tree. A subsequent
    * IN-DISTRIBUTION flush builds a cell-ALIGNED batch and the tree STAYS
    * routable (no regime ping-pong) with routed/exhaustive parity intact;
    * a DRIFTED flush (rows far from every cell, here a shifted
    * all-positive blob) trips the MaxAlignDrift bound and demotes to
    * exhaustive — the honest regime for rows the old cells cannot
    * describe. */
  private def serviceClusteredGates(s: SparkSession): Seq[(String, Double, Boolean)] = {
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_clu_gate").toString
    val svc = new VectorService(s, root)
    // segmentRows=700 => OPTIMIZE CLUSTER targets ~5 cells on 3000 rows:
    // routing/alignment is exercised for real (one giant cell is trivially
    // "aligned" and routes nothing)
    svc.create("cg", metric = "COSINE", maxDegree = 16, beamWidth = 64, segmentRows = 700)
    val rnd = new java.util.Random(13)
    val centers = Array.fill(4)(Array.fill(12)(rnd.nextFloat() * 2 - 1))
    def fromCenters(ids: Range): DataFrame = ids.map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(v => v + (rnd.nextFloat() * 2 - 1) * 0.5f).toSeq)
    }.toDF("id", "vec")
    val rows = fromCenters(0 until 3000)
    svc.write("cg", rows)
    svc.optimize("cg")
    def routable(): Long = svc.memory("cg")
      .filter(col("component") === "routable").select("files").as[Long].head()
    val notRoutableBefore = routable() == 0L
    val queries = rows.filter(col("id") < 8)
      .select(col("id").as("qid"), col("vec").as("qvec")).cache()
    val want = graft.operators.KnnExact.knn(rows, queries, 10, "COSINE")
    val stats = svc.optimize("cg", cluster = true)
    val modeCluster = stats.exists(_.mode == "cluster")
    val routableAfter = routable() == 1L
    val got = svc.search("cg", queries, limit = 10)
    def recallOf(g: DataFrame, w: DataFrame): Double = {
      val gs = g.select("qid", "nid").as[(Long, Long)].collect().toSet
      val ws = w.select("qid", "nid").as[(Long, Long)].collect().toSet
      gs.intersect(ws).size.toDouble / ws.size
    }
    val exactRecall = recallOf(got, want)
    val params = graft.index.Ann.Params(metric = "COSINE", maxDegree = 16,
      beamWidth = 64, segmentRows = 700)
    val exh = graft.index.Ann.searchIndex(s, s"$root/cg/gen=1/*", queries, 10, 64,
      params, probeSegments = 0)
    val parity = recallOf(got, exh)
    // in-distribution flush: cell-aligned batch, tree STAYS routable and
    // the routed search still tracks the exhaustive answer on the (now
    // two-batch) tree
    val flushRows = fromCenters(10000 until 10200)
    svc.write("cg", flushRows)
    svc.optimize("cg")
    val stillRoutable = routable() == 1L
    val got2 = svc.search("cg", queries, limit = 10)
    val exh2 = graft.index.Ann.searchIndex(s, s"$root/cg/gen=1/*", queries, 10, 64,
      params, probeSegments = 0)
    val flushParity = recallOf(got2, exh2)
    // ef is the first-class serving-time QUALITY lever (the reference's
    // `SEARCH <searchEf> ...` — IPCService.java:85-93): a wider beam buys
    // recall at ZERO build cost, and on routed clustered trees ef=256 is
    // the recommended quality setting (4Mx64 frontier: deg32 + ef256 =
    // 0.952 recall_abs, dominating the 2.2x-costlier deg64 BUILD). Gate:
    // SEARCH at ef256 on the routed two-batch tree recalls at least the
    // ef64 arm against exact truth over the full live corpus.
    val want2 = graft.operators.KnnExact.knn(
      rows.unionByName(flushRows), queries, 10, "COSINE")
    val rEf64 = recallOf(got2, want2)
    val rEf256 = recallOf(svc.search("cg", queries, limit = 10, ef = 256), want2)
    // drifted flush: an all-positive shifted blob no old cell describes —
    // MaxAlignDrift trips and the tree demotes to exhaustive serving
    svc.write("cg", (5000 until 5100).map(i =>
      (i.toLong, Seq.fill(12)(5f + rnd.nextFloat()))).toDF("id", "vec"))
    svc.optimize("cg")
    val demoted = routable() == 0L
    Seq(
      ("svc_cluster_not_routable_before", 1.0, notRoutableBefore),
      ("svc_cluster_mode_cluster", 1.0, modeCluster),
      ("svc_cluster_routable_after", 1.0, routableAfter),
      ("svc_cluster_exact_recall_ge_0_9", 0.9, exactRecall >= 0.9),
      ("svc_cluster_parity_ge_0_95", 0.95, parity >= 0.95),
      ("svc_cluster_flush_stays_routable", 1.0, stillRoutable),
      ("svc_cluster_flush_parity_ge_0_95", 0.95, flushParity >= 0.95),
      ("svc_cluster_ef256_recall_ge_ef64", 1.0, rEf256 >= rEf64 && rEf256 >= 0.9),
      ("svc_cluster_drift_demotes", 1.0, demoted))
  }

  private val serviceClusteredSql: String = Gates.sql(Seq(
    ("svc_cluster_not_routable_before", 1.0),
    ("svc_cluster_mode_cluster", 1.0),
    ("svc_cluster_routable_after", 1.0),
    ("svc_cluster_exact_recall_ge_0_9", 0.9),
    ("svc_cluster_parity_ge_0_95", 0.95),
    ("svc_cluster_flush_stays_routable", 1.0),
    ("svc_cluster_flush_parity_ge_0_95", 0.95),
    ("svc_cluster_ef256_recall_ge_ef64", 1.0),
    ("svc_cluster_drift_demotes", 1.0)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "service_lifecycle" -> (serviceLifecycle _),
    "ipc_lifecycle" -> (ipcLifecycle _),
    "ipc_churn" -> (ipcChurn _),
    "service_clustered" -> (serviceClustered _),
    "vecs_source" -> (vecsSource _),
    "stream_dedup" -> (streamDedup _))

  def oracles: Map[String, String] = Map(
    "service_lifecycle" -> serviceLifecycleSql,
    "ipc_lifecycle" -> ipcLifecycleSql,
    "ipc_churn" -> ipcChurnSql,
    "service_clustered" -> serviceClusteredSql,
    "vecs_source" -> vecsSourceSql,
    "stream_dedup" -> streamDedupSql)
}
