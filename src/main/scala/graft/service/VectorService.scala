package graft.service

import graft.index.Ann
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's service lifecycle (`jvector-examples/.../IPCService.java:
  * 85-93`: `CREATE <dim> <sim> <M> <ef>`, `WRITE [vec]…`, `BULKLOAD path`,
  * `OPTIMIZE`, `SEARCH <ef> <limit> [vec]…`, `MEMORY`) re-expressed as a
  * catalog of named vector indexes over parquet storage — the public API a
  * reference user would reach for first.
  *
  * Storage layout per index (everything under `root/<name>/`):
  * {{{
  *   _meta            params (metric/M/beam/pq/nvq), written at CREATE
  *   _current         pointer to the serving generation ("gen=K")
  *   pending/         WRITE/BULKLOAD appends, not yet searchable
  *   deletes/         tombstoned ids (merge-on-read at SEARCH)
  *   gen=K/batch=N/   immutable index segments (Ann.buildIndex output)
  * }}}
  *
  * OPTIMIZE flushes `pending/` as a new batch under the serving generation
  * (incremental build, B9) and — with `compactNow` — folds all batches and
  * tombstones into a fresh generation (B10 compaction; PQ retrain included
  * via [[Ann.compact]]). Generations are immutable: a new one is written
  * COMPLETELY before `_current` flips, so concurrent readers never observe
  * a half-built index, and stale-cache invalidation rides on the `_build_id`
  * token `Ann.buildIndex` already writes.
  */
class VectorService(spark: SparkSession, root: String) {

  import VectorService.Meta

  private def dir(name: String, part: String = "") =
    s"$root/$name${if (part.isEmpty) "" else s"/$part"}"

  private def fs: FileSystem =
    new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def writeSmall(path: String, content: String): Unit = {
    val out = fs.create(new HPath(path), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def readSmall(path: String): Option[String] = {
    val p = new HPath(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](512)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        Some(new String(buf.toByteArray, "UTF-8").trim)
      } finally in.close()
    }
  }

  private def meta(name: String): Meta = {
    val s = readSmall(dir(name, "_meta"))
      .getOrElse(throw new IllegalStateException(s"index '$name' does not exist (CREATE first)"))
    Meta.parse(s)
  }

  private def currentGen(name: String): Option[String] = readSmall(dir(name, "_current"))

  private def hasData(path: String): Boolean = {
    val p = new HPath(path)
    fs.exists(p) && fs.globStatus(new HPath(s"$path/*.parquet")).nonEmpty
  }

  /** CREATE: register an index with its build/search parameters. */
  def create(
      name: String,
      metric: String = "COSINE",
      maxDegree: Int = 32,
      beamWidth: Int = 100,
      pqM: Int = 0,
      nvqBits: Int = 0): Unit = {
    require(!fs.exists(new HPath(dir(name, "_meta"))), s"index '$name' already exists")
    writeSmall(dir(name, "_meta"), Meta(metric, maxDegree, beamWidth, pqM, nvqBits).render)
  }

  /** WRITE: append (id, vec) rows; searchable after the next OPTIMIZE. */
  def write(name: String, rows: DataFrame, idCol: String = "id", vecCol: String = "vec"): Unit = {
    meta(name) // existence check
    rows.select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<float>").as("vec"))
      .write.mode("append").parquet(dir(name, "pending"))
  }

  /** BULKLOAD: ingest a parquet or fvecs file (by extension). */
  def bulkLoad(name: String, path: String, idCol: String = "id", vecCol: String = "vec"): Unit = {
    val df =
      if (path.endsWith(".fvecs")) spark.read.format("fvecs").load(path)
      else spark.read.parquet(path)
    write(name, df, idCol, vecCol)
  }

  /** DELETE: tombstone ids — excluded from SEARCH immediately
    * (merge-on-read), physically removed by OPTIMIZE(compactNow). */
  def delete(name: String, ids: DataFrame, idCol: String = "id"): Unit = {
    meta(name)
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .write.mode("append").parquet(dir(name, "deletes"))
  }

  /** Content token of the current `pending/` payload (file names + sizes):
    * a flushed batch records the token it ingested, making the flush
    * idempotent — a crash between batch commit and pending/ cleanup must
    * NOT re-ingest the same rows as a second batch (duplicate ids). */
  private def pendingToken(name: String): Option[String] = {
    val files = Option(fs.globStatus(new HPath(s"${dir(name, "pending")}/*.parquet")))
      .getOrElse(Array.empty)
    if (files.isEmpty) None
    else Some(java.util.UUID.nameUUIDFromBytes(
      files.map(f => s"${f.getPath.getName}:${f.getLen}").sorted
        .mkString("|").getBytes("UTF-8")).toString)
  }

  /** Exclusive OPTIMIZE lease via atomic create-if-absent of a lock file.
    * A crashed writer's lock is broken once older than `leaseMs`. This is
    * a best-effort single-writer guard (the strongest available on a bare
    * filesystem without a coordination service): concurrent OPTIMIZEs on
    * the same index fail fast instead of both building the same batch or
    * generation. */
  private def acquireOptimizeLock(name: String, leaseMs: Long): HPath = {
    val lock = new HPath(dir(name, "_optimize_lock"))
    def tryCreate(): Boolean =
      try {
        val out = fs.create(lock, false) // atomic create-if-absent
        try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      val stale =
        try readSmall(lock.toString).map(_.toLong)
          .forall(ts => System.currentTimeMillis() - ts > leaseMs)
        catch { case _: Exception => true }
      if (!stale)
        throw new IllegalStateException(
          s"another OPTIMIZE is running on '$name' (lock ${lock}; " +
            s"stale after ${leaseMs / 1000}s)")
      fs.delete(lock, false)
      if (!tryCreate())
        throw new IllegalStateException(
          s"another OPTIMIZE is running on '$name' (lost the lock race after lease break)")
    }
    lock
  }

  /** OPTIMIZE: make pending writes searchable (new immutable batch under
    * the serving generation); with `compactNow`, fold all batches and
    * tombstones into a fresh generation and flip the pointer.
    *
    * Crash-safety: the batch is built in a `_staging/` dir and committed
    * with one atomic rename; the staged batch records the pending token it
    * ingested, so a crash anywhere between commit and `pending/` cleanup
    * re-runs as a no-op flush instead of duplicating ids. Compaction's
    * commit point is the `_current` flip — un-flipped next-generation
    * leftovers from a crash are deleted and rebuilt. Single-writer via
    * [[acquireOptimizeLock]]. */
  def optimize(name: String, compactNow: Boolean = false,
      lockLeaseMs: Long = 10 * 60 * 1000L): Unit = {
    val m = meta(name)
    val params = m.params
    val lock = acquireOptimizeLock(name, lockLeaseMs)
    try {
      val gen = currentGen(name).getOrElse("gen=0")
      val genDir = dir(name, gen)
      // orphaned staging dirs from a crashed writer are garbage (their
      // batch never got renamed in) — safe to GC under the lock
      fs.delete(new HPath(dir(name, "_staging")), true)

      pendingToken(name).foreach { tok =>
        val alreadyLanded = Option(fs.globStatus(new HPath(s"$genDir/batch=*/_flushed_token")))
          .getOrElse(Array.empty)
          .exists(st => readSmall(st.getPath.toString).contains(tok))
        if (!alreadyLanded) {
          val staging = dir(name, s"_staging/${java.util.UUID.randomUUID()}")
          Ann.buildIndex(spark.read.parquet(dir(name, "pending")), staging,
            params, "id", "vec")
          writeSmall(s"$staging/_flushed_token", tok)
          val nextBatch = Option(fs.globStatus(new HPath(s"$genDir/batch=*")))
            .map(_.length).getOrElse(0)
          fs.mkdirs(new HPath(genDir))
          val target = new HPath(s"$genDir/batch=$nextBatch")
          if (!fs.rename(new HPath(staging), target))
            throw new IllegalStateException(s"batch commit failed: $staging -> $target")
        }
        fs.delete(new HPath(dir(name, "pending")), true)
        if (currentGen(name).isEmpty) writeSmall(dir(name, "_current"), gen)
        Ann.invalidateSegmentCounts(s"$genDir/*")
      }

      if (compactNow && currentGen(name).isDefined) {
        val cur = currentGen(name).get
        val curN = cur.stripPrefix("gen=").toInt
        val nextGen = s"gen=${curN + 1}"
        val deletes =
          if (hasData(dir(name, "deletes"))) Some(spark.read.parquet(dir(name, "deletes")))
          else None
        // a crashed compaction's un-flipped generation is garbage: the
        // pointer never moved, so rebuild it from scratch
        fs.delete(new HPath(dir(name, nextGen)), true)
        Ann.compact(spark, s"${dir(name, cur)}/*", s"${dir(name, nextGen)}/batch=0",
          params, deletes)
        writeSmall(dir(name, "_current"), nextGen) // readers flip atomically
        fs.delete(new HPath(dir(name, "deletes")), true)
        // read-grace GC: a reader that resolved `_current` just before the
        // flip may still be scanning gen=K, so K survives one compaction and
        // is reclaimed at the K+1 -> K+2 flip (generations are immutable, so
        // the stale read is consistent, just pre-compaction)
        if (curN > 0) fs.delete(new HPath(dir(name, s"gen=${curN - 1}")), true)
        Ann.invalidateSegmentCounts(s"${dir(name, nextGen)}/*")
      }
    } finally fs.delete(lock, false)
  }

  /** SEARCH: top-`limit` over the serving generation; tombstones are
    * excluded merge-on-read. Queries: (qid, qvec). */
  def search(name: String, queries: DataFrame, limit: Int, ef: Int = 64): DataFrame = {
    val m = meta(name)
    val gen = currentGen(name)
      .getOrElse(throw new IllegalStateException(s"index '$name' has no data (OPTIMIZE first)"))
    val deletes =
      if (hasData(dir(name, "deletes"))) Some(spark.read.parquet(dir(name, "deletes")))
      else None
    Ann.searchIndex(spark, s"${dir(name, gen)}/*", queries, limit, ef, m.params,
      deletes = deletes, rerankK = if (m.pqM > 0) math.max(4 * limit, limit) else 0)
  }

  /** MEMORY: storage accounting per component (the reference reports
    * `ramBytesUsed`; segments live in storage here, so bytes are file
    * sizes — metadata-only, no data scan). */
  def memory(name: String): DataFrame = {
    import spark.implicits._
    meta(name)
    def usage(part: String): (String, Long, Long) = {
      val p = new HPath(dir(name, part))
      if (!fs.exists(p)) (part, 0L, 0L)
      else {
        val it = fs.listFiles(p, true) // recursive
        var files = 0L; var bytes = 0L
        while (it.hasNext) { val f = it.next(); files += 1; bytes += f.getLen }
        (part, files, bytes)
      }
    }
    val gen = currentGen(name).toSeq.map(usage)
    (gen ++ Seq(usage("pending"), usage("deletes")))
      .toDF("component", "files", "bytes")
  }
}

object VectorService {

  private[service] case class Meta(
      metric: String, maxDegree: Int, beamWidth: Int, pqM: Int, nvqBits: Int) {
    def render: String = s"$metric,$maxDegree,$beamWidth,$pqM,$nvqBits"
    def params: Ann.Params = Ann.Params(metric = metric, maxDegree = maxDegree,
      beamWidth = beamWidth, pqM = pqM, nvqBits = nvqBits)
  }

  private[service] object Meta {
    def parse(s: String): Meta = {
      val a = s.split(",")
      Meta(a(0), a(1).toInt, a(2).toInt, a(3).toInt, a(4).toInt)
    }
  }
}
