package graft

import graft.index.Ann
import graft.service.{IpcServer, VectorService}

import java.net.{StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.SocketChannel
import java.nio.charset.StandardCharsets

/** Sustained WRITE/OPTIMIZE/DELETE churn through the wire protocol +
  * merge-mode compaction — the streaming-maintenance economics the
  * reference documents (`docs/compaction.md`; concurrency shape of
  * `TestConcurrentReadWriteDeletes`): every cycle's compaction must CARRY
  * the clean bulk segment untouched, pay beam work proportional to the
  * dirty/new rows only, never resurrect a tombstoned id, and the
  * generation chain must stay GC-bounded (current + one read-grace
  * predecessor). */
class ChurnSpec extends SparkSpec {

  private final class Client(path: String) {
    private val ch = SocketChannel.open(StandardProtocolFamily.UNIX)
    ch.connect(UnixDomainSocketAddress.of(path))
    private val pending = new StringBuilder
    private val buf = ByteBuffer.allocate(1 << 20)
    def send(line: String): String = {
      val out = ByteBuffer.wrap((line + "\n").getBytes(StandardCharsets.UTF_8))
      while (out.hasRemaining) ch.write(out)
      var nl = pending.indexOf("\n")
      while (nl < 0) {
        assert(ch.read(buf) != -1, "server closed connection")
        buf.flip()
        pending.append(StandardCharsets.UTF_8.decode(buf))
        buf.clear()
        nl = pending.indexOf("\n")
      }
      val resp = pending.substring(0, nl)
      pending.delete(0, nl + 1)
      resp
    }
    def close(): Unit = ch.close()
  }

  private def vecStr(v: Array[Float]): String = v.mkString("[", ",", "]")

  test("IPC churn: merge compaction carries the clean bulk, bounds work by dirty rows, GCs generations") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_churn").toString
    val sock = s"/tmp/graft_churn_${System.nanoTime() % 1000000}.sock"
    val srv = new IpcServer(spark, root, sock)
    val dim = 8
    val rnd = new java.util.Random(5)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    try {
      val c = new Client(sock)
      assert(c.send(s"CREATE $dim COSINE 16 64") === "OK")

      // bulk base: 16000 vectors. The carried-path guarantee is
      // PARTITIONING-INDEPENDENT by construction, not by a lucky bin
      // shape: (1) buildIndex's confetti guard coalesces ANY flush
      // partitioning (32x500 wire batches -> N scan partitions) to the
      // segment-row target, so bulk segments land at >= segmentRows/2;
      // (2) compactMerge carries every CLEAN segment at >= segmentRows/2
      // by utilization floor, before FFD ever sees it. So however the
      // flush scan partitions this bulk, its segments are carried and
      // merge work is bounded by the dirty rows (asserted below).
      val bulkN = 16000
      val all = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
      (0 until bulkN).grouped(500).foreach { chunk =>
        val vs = chunk.map(_ => vec())
        vs.foreach(all += _)
        assert(c.send("WRITE " + vs.map(vecStr).mkString(" ")) === "OK")
      }
      assert(c.send("OPTIMIZE") === "OK") // flush -> gen=0/batch=0

      // the IPC session's index is filesystem-backed: a sibling service
      // handle on the same root drives DELETE + compaction and reads stats
      val svc = new VectorService(spark, root)
      val name = "ipc_session_1"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def genDirs(): Seq[String] =
        Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/$name/gen=*")))
          .getOrElse(Array.empty).map(_.getPath.getName).toSeq.sorted

      var nextId = bulkN.toLong
      val deleted = scala.collection.mutable.Set.empty[Long]
      for (cycle <- 1 to 3) {
        // 400 fresh rows through the wire
        val fresh = Array.fill(400)(vec())
        val freshIds = (nextId until nextId + 400).toArray
        fresh.grouped(200).foreach(g =>
          assert(c.send("WRITE " + g.map(vecStr).mkString(" ")) === "OK"))
        nextId += 400
        assert(c.send("OPTIMIZE") === "OK") // flush the batch

        // tombstone 30 of the JUST-written ids (the bulk segment stays
        // clean) — merge-on-read first, physical removal on compact
        val delIds = freshIds.take(30)
        delIds.foreach(deleted += _)
        svc.delete(name, delIds.toSeq.toDF("id"))

        System.err.println("[churn] segs before compact: " +
          Ann.readIndex(spark, s"$root/$name/${genDirs().last}/*")
            .groupBy("seg").count().collect()
            .map(r => r.getLong(1)).sorted.mkString(","))
        val stats = svc.optimize(name, compactNow = true)
          .getOrElse(fail("compaction did not run"))
        System.err.println(s"[churn] cycle $cycle stats $stats")
        assert(stats.mode === "merge", s"cycle $cycle mode ${stats.mode}")
        // the clean 8000-row bulk must ride the carried path (no graph work)
        assert(stats.carriedSegments >= 1, s"cycle $cycle carried ${stats.carriedSegments}")
        // beam work bounded by the dirty/new rows (~800), never the bulk:
        // a full rebuild visits >= bulkN * beamWidth nodes
        assert(stats.visited > 0, s"cycle $cycle did no merge work")
        assert(stats.visited < bulkN.toLong * 64,
          s"cycle $cycle visited ${stats.visited} — work not bounded by dirty rows")
        // same-source adjacency reuse is the merge mode's point
        assert(stats.reusedEdges > 0, s"cycle $cycle reused no edges")

        // no resurrection through the wire: search directly AT deleted
        // vectors; none of their ids may come back
        val probes = delIds.take(5).map(id => fresh((id - freshIds.head).toInt))
        val r = c.send(s"SEARCH 64 5 " + probes.map(vecStr).mkString(" "))
        assert(r.startsWith("RESULT "), s"cycle $cycle: $r")
        val returned = r.stripPrefix("RESULT ").split(" ")
          .flatMap(_.stripPrefix("[").stripSuffix("]").split(",").filter(_.nonEmpty))
          .map(_.toLong)
        assert(!returned.exists(deleted), s"cycle $cycle resurrected " +
          returned.filter(deleted).mkString(","))

        // generation chain stays bounded: current + one read-grace
        // predecessor; everything older is unreferenced AND reclaimed
        val gens = genDirs()
        assert(gens.length <= 2, s"cycle $cycle generations not GCed: $gens")
        val curN = gens.map(_.stripPrefix("gen=").toInt).max
        assert(!gens.contains(s"gen=${curN - 2}"),
          s"cycle $cycle gen=${curN - 2} still on disk")
      }

      // post-churn sanity through the wire: live rows = writes - deletes
      val mem = c.send("MEMORY")
      assert(mem.startsWith("RESULT "), mem)
      val liveRes = svc.search(name, Seq((0L, all.head.toSeq)).toDF("qid", "qvec"), 3)
      assert(liveRes.count() === 3)
      c.close()
    } finally srv.close()
  }
}
