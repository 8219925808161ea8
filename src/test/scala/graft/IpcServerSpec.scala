package graft

import graft.service.IpcServer

import java.net.{StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.SocketChannel
import java.nio.charset.StandardCharsets

/** Wire-protocol lifecycle over a real Unix-domain socket — mirrors the
  * reference's IPCService verb shapes and response markers
  * (`jvector-examples/.../IPCService.java`). */
class IpcServerSpec extends SparkSpec {

  private final class Client(path: String) {
    private val ch = SocketChannel.open(StandardProtocolFamily.UNIX)
    ch.connect(UnixDomainSocketAddress.of(path))
    private val pending = new StringBuilder
    private val buf = ByteBuffer.allocate(1 << 16)

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

  test("IPC lifecycle: CREATE/WRITE/OPTIMIZE/SEARCH/MEMORY over a unix socket") {
    val root = java.nio.file.Files.createTempDirectory("graft_ipc").toString
    // unix socket paths are length-limited (~104 bytes) — keep it short
    val sock = s"/tmp/graft_ipc_${System.nanoTime() % 1000000}.sock"
    val srv = new IpcServer(spark, root, sock)
    try {
      val c = new Client(sock)
      // 2-d grid: nearest neighbors are unambiguous
      assert(c.send("CREATE 2 COSINE 16 64") === "OK")
      // ids are insertion ordinals: 0:[1,0] 1:[0,1] 2:[1,0.1] 3:[0.1,1]
      assert(c.send("WRITE [1,0] [0,1]") === "OK")
      assert(c.send("WRITE [1,0.1] [0.1,1]") === "OK")
      // SEARCH before OPTIMIZE errors (no generation yet)
      assert(c.send("SEARCH 16 2 [1,0]").startsWith("ERROR"))
      assert(c.send("OPTIMIZE") === "OK")
      val r = c.send("SEARCH 16 2 [1,0.05] [0.05,1]")
      assert(r.startsWith("RESULT "), s"got: $r")
      val lists = r.stripPrefix("RESULT ").split(" ")
      assert(lists.length === 2)
      assert(lists(0) === "[0,2]" || lists(0) === "[2,0]", s"query 1 got ${lists(0)}")
      assert(lists(1) === "[1,3]" || lists(1) === "[3,1]", s"query 2 got ${lists(1)}")
      // MEMORY is wire-identical to the reference: exactly `RESULT <kb>` —
      // a client parsing the remainder as one long must not break
      val mem = c.send("MEMORY")
      assert(mem.startsWith("RESULT "), s"got: $mem")
      assert(mem.stripPrefix("RESULT ").toLong >= 0L, s"MEMORY must be RESULT <kb>: $mem")
      // serving-regime stats live on the STATS extension verb: this tree
      // is IPC-built (arrival-partitioned) -> at least one segment, NOT
      // routable (SEARCH runs the exhaustive regime by design)
      val statToks = c.send("STATS").stripPrefix("RESULT ").split(" ")
      assert(statToks.exists(t => t.startsWith("kb=") && t.drop(3).toLong >= 0L),
        s"STATS must report kb: ${statToks.mkString(" ")}")
      assert(statToks.exists(t => t.startsWith("segments=") && t.drop(9).toLong >= 1L),
        s"STATS must report segments: ${statToks.mkString(" ")}")
      assert(statToks.contains("routable=0"),
        s"STATS must report routability: ${statToks.mkString(" ")}")
      // OPTIMIZE CLUSTER: full re-clustering compaction promotes the tree
      // to the routed regime; results stay correct and STATS flips
      // routable=1
      assert(c.send("OPTIMIZE CLUSTER") === "OK")
      val rc = c.send("SEARCH 16 2 [1,0.05] [0.05,1]")
      val cl = rc.stripPrefix("RESULT ").split(" ")
      assert(cl(0) === "[0,2]" || cl(0) === "[2,0]", s"clustered query 1 got ${cl(0)}")
      assert(cl(1) === "[1,3]" || cl(1) === "[3,1]", s"clustered query 2 got ${cl(1)}")
      val statC = c.send("STATS").stripPrefix("RESULT ").split(" ")
      assert(statC.contains("routable=1"),
        s"STATS must report routable=1 after OPTIMIZE CLUSTER: ${statC.mkString(" ")}")
      // unknown OPTIMIZE argument must ERROR, not silently run a bare flush
      assert(c.send("OPTIMIZE CLUSTERED").startsWith("ERROR"))
      // ... and it must error BEFORE mutating state (parse-before-mutate):
      // buffered WRITEs stay buffered — no pending file lands, so the
      // storage footprint is unchanged
      val kbBefore = c.send("MEMORY").stripPrefix("RESULT ").toLong
      assert(c.send("WRITE [9,9]") === "OK")
      assert(c.send("OPTIMIZE NOPE").startsWith("ERROR"))
      assert(c.send("MEMORY").stripPrefix("RESULT ").toLong === kbBefore,
        "malformed OPTIMIZE must not flush buffered writes")
      // protocol errors report, connection survives
      assert(c.send("NOPE x").startsWith("ERROR"))
      assert(c.send("WRITE [1,2,3]").startsWith("ERROR")) // wrong dimension
      assert(c.send("MEMORY").startsWith("RESULT"))
      c.close()

      // second connection gets a FRESH session (per-connection index, as in
      // the reference's per-connection SessionContext)
      val c2 = new Client(sock)
      assert(c2.send("SEARCH 16 1 [1,0]").startsWith("ERROR"), "new session must be empty")
      assert(c2.send("CREATE 2 EUCLIDEAN 8 32") === "OK")
      c2.close()
    } finally srv.close()
  }

  test("IPC BULKLOAD ingests a raw little-endian float32 file") {
    val root = java.nio.file.Files.createTempDirectory("graft_ipcb").toString
    val sock = s"/tmp/graft_ipcb_${System.nanoTime() % 1000000}.sock"
    val srv = new IpcServer(spark, root, sock)
    try {
      // 8 records x 4 floats, raw LE (the reference's MMap layout, no prefix)
      val raw = java.io.File.createTempFile("graft_raw", ".bin")
      val bb = ByteBuffer.allocate(8 * 4 * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val rnd = new scala.util.Random(5)
      val vecs = Array.fill(8)(Array.fill(4)(rnd.nextFloat()))
      vecs.foreach(_.foreach(bb.putFloat))
      java.nio.file.Files.write(raw.toPath, bb.array())

      val c = new Client(sock)
      assert(c.send("CREATE 4 COSINE 8 32") === "OK")
      assert(c.send(s"BULKLOAD ${raw.getAbsolutePath}") === "OK")
      assert(c.send("OPTIMIZE") === "OK")
      // each stored vector's own nearest neighbor is itself (ordinal id)
      val q = vecs(3).mkString("[", ",", "]")
      val r = c.send(s"SEARCH 8 1 $q")
      assert(r === "RESULT [3]", s"got: $r")
      assert(c.send("BULKLOAD /nonexistent/file").startsWith("ERROR"))
      c.close()
    } finally srv.close()
  }
}
