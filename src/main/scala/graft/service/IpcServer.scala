package graft.service

import org.apache.spark.sql.SparkSession

import java.net.{StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.{ServerSocketChannel, SocketChannel}
import java.nio.charset.StandardCharsets

/** Wire-protocol front end for [[VectorService]] — the reference's
  * `IPCService` re-expressed (`jvector-examples/.../IPCService.java:58-93`,
  * protocol loop `:297-330`): a Unix-domain socket (JDK 17 native
  * `StandardProtocolFamily.UNIX`, where the reference uses junixsocket)
  * speaking newline-delimited text verbs with `OK` / `ERROR <msg>` /
  * `RESULT ...` responses, one connection served at a time, one anonymous
  * index per connection session.
  *
  * Verbs (same shapes as `IPCService.Command`):
  *  - `CREATE dim SIMILARITY M efConstruction` — new per-session index
  *  - `WRITE [f,f,...] [f,f,...]` — append vectors; ids are insertion
  *    ordinals (the reference's `ravv.size() - 1` contract)
  *  - `BULKLOAD /path` — raw little-endian float32 file, `dim` floats per
  *    record (the reference's MMap layout; NOT fvecs — no length prefix)
  *  - `OPTIMIZE` — flush + build (delegates to `VectorService.optimize`)
  *  - `SEARCH searchEf topK [f,...] [f,...]` — per query vector a
  *    bracketed id list, best-first: `RESULT [3,9] [1,2]`
  *  - `MEMORY` — `RESULT <kb>` (index storage footprint, wire-identical
  *    to the reference `IPCService.java:225`)
  *  - `STATS` — `RESULT kb=<kb> segments=<n> routable=<0|1>` (extension
  *    verb, not in the reference protocol: serving-regime visibility)
  *
  * The Spark translation: vectors accumulate into the service's pending
  * parquet on WRITE/BULKLOAD, OPTIMIZE builds the segment graphs, SEARCH
  * runs the distributed index search — the socket is a thin driver-side
  * protocol shim, exactly as the reference's service is a shim over its
  * in-process index. */
final class IpcServer(spark: SparkSession, root: String, socketPath: String) {

  private val svc = new VectorService(spark, root)
  private val addr = UnixDomainSocketAddress.of(socketPath)
  private val server = ServerSocketChannel.open(StandardProtocolFamily.UNIX)
  server.bind(addr)

  @volatile private var running = true
  @volatile private var sessionSeq = 0

  private final class Session {
    sessionSeq += 1
    val name = s"ipc_session_$sessionSeq"
    var dim: Int = -1
    var created = false
    var nextId: Long = 0L
    // WRITE batches buffer driver-side and flush on OPTIMIZE — one pending
    // parquet append per lifecycle instead of one per WRITE line
    val buffered = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
  }

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[IpcServer])

  private val thread = new Thread(() => {
    // consecutive ACCEPT failures (connection-level errors reset it):
    // a persistent server.accept() failure — deleted socket file, FD
    // exhaustion — must back off, not busy-spin at 100% CPU
    var acceptFailures = 0
    while (running) {
      var conn: SocketChannel = null
      val accepted =
        try { conn = server.accept(); acceptFailures = 0; true }
        catch {
          case _: Throwable if !running => false // closed during shutdown
          case e: java.nio.channels.ClosedChannelException =>
            // unplanned channel close: the loop can never accept again
            log.error("IPC server channel closed unexpectedly; stopping", e)
            running = false; false
          case e: Throwable =>
            acceptFailures += 1
            log.warn(s"IPC accept failed ($acceptFailures consecutive)", e)
            if (acceptFailures >= 3)
              try Thread.sleep(math.min(1000L << math.min(acceptFailures - 3, 4), 5000L))
              catch { case _: InterruptedException => running = false }
            false
        }
      if (accepted) {
        try serveConnection(conn)
        catch {
          case _: Throwable if !running => // closed during shutdown
          case e: Throwable =>
            log.warn("IPC connection terminated with error; continuing to serve", e)
        } finally if (conn != null) conn.close()
      }
    }
  }, "graft-ipc-accept")
  thread.setDaemon(true)
  thread.start()

  def close(): Unit = {
    running = false
    server.close()
    java.nio.file.Files.deleteIfExists(java.nio.file.Path.of(socketPath))
  }

  private def serveConnection(conn: SocketChannel): Unit = {
    val ctx = new Session
    val buf = ByteBuffer.allocate(1 << 20)
    val pending = new StringBuilder
    var open = true
    while (open && conn.read(buf) != -1) {
      buf.flip()
      pending.append(StandardCharsets.UTF_8.decode(buf))
      buf.clear()
      var nl = pending.indexOf("\n")
      while (nl >= 0 && open) {
        val line = pending.substring(0, nl).trim
        pending.delete(0, nl + 1)
        if (line.nonEmpty) {
          val resp =
            try process(line, ctx)
            catch { case e: Throwable => s"ERROR ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}" }
          val out = ByteBuffer.wrap((resp + "\n").getBytes(StandardCharsets.UTF_8))
          while (out.hasRemaining) conn.write(out)
        }
        nl = pending.indexOf("\n")
      }
    }
  }

  private def parseVec(s: String, dim: Int): Array[Float] = {
    require(s.startsWith("[") && s.endsWith("]"), s"invalid vector literal: $s")
    val vals = s.substring(1, s.length - 1).split(",")
    require(vals.length == dim, s"invalid vector dimension: ${vals.length} != $dim")
    vals.map(_.toFloat)
  }

  private def process(line: String, ctx: Session): String = {
    val sp = line.indexOf(' ')
    val verb = if (sp < 1) line else line.substring(0, sp)
    val args = if (sp < 1) "" else line.substring(sp + 1)
    verb match {
      case "CREATE" =>
        val a = args.trim.split("\\s+")
        require(a.length >= 4,
          "Illegal CREATE statement. Expecting 'CREATE [DIMENSIONS] [SIMILARITY_TYPE] [M] [EF]'")
        ctx.dim = a(0).toInt
        svc.create(ctx.name, metric = a(1), maxDegree = a(2).toInt, beamWidth = a(3).toInt)
        ctx.created = true
        "OK"
      case "WRITE" =>
        require(ctx.created, "CREATE first")
        // parse the WHOLE line before mutating session state: a malformed
        // vector mid-line must leave buffered/nextId untouched, or the
        // insertion-ordinal id contract SEARCH results rely on silently
        // shifts under the earlier vectors of the rejected line
        val parsed = args.trim.split("\\s+").filter(_.nonEmpty).map(parseVec(_, ctx.dim))
        parsed.foreach { v =>
          ctx.buffered += ((ctx.nextId, v))
          ctx.nextId += 1
        }
        "OK"
      case "BULKLOAD" =>
        require(ctx.created, "CREATE first")
        val f = new java.io.File(args.trim)
        require(f.exists, s"No file at: $f")
        val recBytes = ctx.dim.toLong * 4
        require(f.length % recBytes == 0, "File is not encoded correctly")
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(new java.io.FileInputStream(f)))
        try {
          val bytes = new Array[Byte](recBytes.toInt)
          var remaining = f.length / recBytes
          while (remaining > 0) {
            in.readFully(bytes)
            val bb = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val v = new Array[Float](ctx.dim)
            var i = 0
            while (i < ctx.dim) { v(i) = bb.getFloat(); i += 1 }
            ctx.buffered += ((ctx.nextId, v))
            ctx.nextId += 1
            remaining -= 1
          }
        } finally in.close()
        "OK"
      case "OPTIMIZE" =>
        require(ctx.created, "CREATE first")
        // `OPTIMIZE CLUSTER`: full re-clustering compaction — the new
        // generation is routable (STATS reports routable=1) and SEARCH
        // flips from exhaustive to AutoProbe centroid routing. Bare
        // OPTIMIZE stays the wire-compatible incremental flush; any OTHER
        // argument errors rather than silently running a bare flush the
        // client did not ask for — and it errors BEFORE the buffered
        // WRITEs flush (parse-before-mutate, the same principle the WRITE
        // handler documents): a malformed line leaves session and pending
        // state untouched.
        val optArg = args.trim
        require(optArg.isEmpty || optArg.equalsIgnoreCase("CLUSTER"),
          s"unknown OPTIMIZE argument '$optArg' (expected nothing or CLUSTER)")
        if (ctx.buffered.nonEmpty) {
          import spark.implicits._
          svc.write(ctx.name, ctx.buffered.toSeq.toDF("id", "vec"))
          ctx.buffered.clear()
        }
        svc.optimize(ctx.name, cluster = optArg.equalsIgnoreCase("CLUSTER"))
        "OK"
      case "SEARCH" =>
        require(ctx.created, "CREATE first")
        val a = args.trim.split("\\s+")
        require(a.length >= 3, "Invalid arguments search-ef top-k [vector1] [vector2]...")
        val ef = a(0).toInt
        val topK = a(1).toInt
        import spark.implicits._
        val qs = a.drop(2).zipWithIndex.map { case (v, i) => (i.toLong, parseVec(v, ctx.dim).toSeq) }
        val res = svc.search(ctx.name, qs.toSeq.toDF("qid", "qvec"), topK, ef = math.max(ef, topK))
          .select("qid", "rank", "nid")
          .collect()
          .groupBy(_.getLong(0))
        val parts = qs.indices.map { i =>
          res.getOrElse(i.toLong, Array.empty)
            .sortBy(_.getInt(1))
            .map(_.getLong(2))
            .mkString("[", ",", "]")
        }
        "RESULT " + parts.mkString(" ")
      case "MEMORY" =>
        require(ctx.created, "CREATE first")
        // wire-identical to the reference (`IPCService.java:225` emits
        // exactly `RESULT <kb>`): a client that parses the whole remainder
        // as a long must not break. Serving-regime stats moved to STATS.
        val kb = svc.memory(ctx.name).collect().map(_.getLong(2)).sum / 1024
        s"RESULT $kb"
      case "STATS" =>
        require(ctx.created, "CREATE first")
        // serving-regime visibility (our extension verb, absent from the
        // reference wire protocol): k=v tokens — storage footprint,
        // segment count, and routability of the serving generation (0 on
        // arrival-partitioned trees -> SEARCH runs exhaustive; 1 after
        // OPTIMIZE CLUSTER -> AutoProbe centroid routing).
        val rows = svc.memory(ctx.name).collect()
        val kb = rows.map(_.getLong(2)).sum / 1024
        val stat = rows.collect {
          case r if r.getString(0) == "segments" => s"segments=${r.getLong(1)}"
          case r if r.getString(0) == "routable" => s"routable=${r.getLong(1)}"
        }
        (s"RESULT kb=$kb" +: stat).mkString(" ")
      case other =>
        throw new UnsupportedOperationException(s"No support for: '$other'")
    }
  }
}
