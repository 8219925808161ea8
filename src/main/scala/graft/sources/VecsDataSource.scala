package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{And => SAnd, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 for the reference's fvecs/ivecs vector-file format
  * (little-endian `[dim:int32][elem32*dim]` fixed-length records —
  * `jvector-examples/.../util/SiftLoader.java:38-84`).
  *
  * `spark.read.format("fvecs").load(path)` -> (id LONG, vec ARRAY<FLOAT>);
  * `format("ivecs")` -> (id LONG, neighbors ARRAY<INT>).
  *
  * Why a V2 source instead of `binaryRecords` + `zipWithIndex`:
  *   - ids derive from BYTE OFFSETS (`offset / recLen`, plus the cumulative
  *     record count of preceding files), so there is no extra counting job —
  *     `zipWithIndex` runs a whole pass over the data just to number rows.
  *     This is the reference's dense-ordinal `RandomAccessVectorValues`
  *     contract: ordinal == file position.
  *   - files split on record boundaries into `spark.sql.files.
  *     maxPartitionBytes`-sized slices — a single 100 GB fvecs file scans
  *     with full cluster parallelism.
  *   - column pruning reaches the byte level: an id-only projection (or a
  *     bare count(*)) never reads vector bytes at all — the reader just
  *     enumerates offsets, so `SELECT count(*)` over 100 TB is metadata-only.
  *   - id-range predicates (`id >= a AND id < b`) prune record slices at
  *     PLANNING time (the file is an array; an id range is a byte range) —
  *     the reference's random-access-by-ordinal, as partition pruning.
  */
abstract class VecsDataSource(elemType: DataType, vecColName: String)
    extends TableProvider {

  override def supportsExternalMetadata(): Boolean = false

  private def schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField(vecColName, ArrayType(elemType, containsNull = false), nullable = false)))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = schema

  override def getTable(
      s: StructType, partitioning: Array[Transform], properties: util.Map[String, String]): Table =
    new VecsTable(schema, vecColName, elemType == FloatType, properties.asScala.toMap)
}

/** `spark.read.format("fvecs")` — (id LONG, vec ARRAY<FLOAT>). */
class FvecsDataSource extends VecsDataSource(FloatType, "vec")
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "fvecs"
}

/** `spark.read.format("ivecs")` — (id LONG, neighbors ARRAY<INT>). */
class IvecsDataSource extends VecsDataSource(IntegerType, "neighbors")
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "ivecs"
}

private[sources] class VecsTable(
    tableSchema: StructType,
    vecColName: String,
    isFloat: Boolean,
    options: Map[String, String]) extends Table with SupportsRead {

  override def name(): String = if (isFloat) "fvecs" else "ivecs"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new VecsScanBuilder(tableSchema, vecColName, isFloat,
      options ++ opts.asScala)
}

private[sources] class VecsScanBuilder(
    fullSchema: StructType,
    vecColName: String,
    isFloat: Boolean,
    options: Map[String, String])
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var idLo: Long = Long.MinValue
  private var idHi: Long = Long.MaxValue // inclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Tighten [idLo, idHi] from a filter tree; returns true iff the filter is
    * FULLY enforced by the range (safe to not re-evaluate — but we always
    * report nothing as pushed, so Spark re-applies every filter; the range
    * is a pure planning-time prune and can only be conservative). */
  private def absorb(f: Filter): Boolean = f match {
    case EqualTo("id", v: Long) => idLo = math.max(idLo, v); idHi = math.min(idHi, v); true
    case EqualTo("id", v: Int) => absorb(EqualTo("id", v.toLong))
    case GreaterThan("id", v: Long) => idLo = math.max(idLo, v + 1); true
    case GreaterThan("id", v: Int) => absorb(GreaterThan("id", v.toLong))
    case GreaterThanOrEqual("id", v: Long) => idLo = math.max(idLo, v); true
    case GreaterThanOrEqual("id", v: Int) => absorb(GreaterThanOrEqual("id", v.toLong))
    case LessThan("id", v: Long) => idHi = math.min(idHi, v - 1); true
    case LessThan("id", v: Int) => absorb(LessThan("id", v.toLong))
    case LessThanOrEqual("id", v: Long) => idHi = math.min(idHi, v); true
    case LessThanOrEqual("id", v: Int) => absorb(LessThanOrEqual("id", v.toLong))
    case SAnd(l, r) =>
      // order matters: absorb both sides even if the first returns false
      val a = absorb(l); val b = absorb(r); a && b
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach(absorb)
    pushed = filters.filter(absorb) // the fully-range-expressible ones, for explain()
    filters // Spark re-evaluates everything; the range prune is advisory
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new VecsScan(required, vecColName, isFloat, options, idLo, idHi)
}

private[sources] class VecsScan(
    readSchema: StructType,
    vecColName: String,
    isFloat: Boolean,
    options: Map[String, String],
    idLo: Long,
    idHi: Long) extends Scan with Batch {

  override def toBatch: Batch = this

  override def description(): String = {
    val rng = if (idLo == Long.MinValue && idHi == Long.MaxValue) ""
              else s", ids=[$idLo,$idHi]"
    s"${if (isFloat) "fvecs" else "ivecs"} cols=${readSchema.fieldNames.mkString(",")}$rng"
  }

  private def paths: Seq[String] = {
    val single = options.get("path").toSeq
    val multi = options.get("paths").toSeq.flatMap { js =>
      // "paths" arrives as a JSON string array from load(paths*)
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      m.readValue(js, classOf[Array[String]]).toSeq
    }
    val all = single ++ multi
    require(all.nonEmpty, "fvecs/ivecs source requires a path")
    all
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val hconf = spark.sessionState.newHadoopConf()
    val maxBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))

    // expand globs, stable order -> deterministic dense ids across files
    val statuses: Seq[FileStatus] = paths.flatMap { p =>
      val hp = new HPath(p)
      val fs = hp.getFileSystem(hconf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      val expanded = if (matched.nonEmpty) matched else Seq(fs.getFileStatus(hp))
      expanded.flatMap {
        case d if d.isDirectory =>
          val fs2 = d.getPath.getFileSystem(hconf)
          fs2.listStatus(d.getPath).filter(_.isFile).toSeq.sortBy(_.getPath.toString)
        case f => Seq(f)
      }
    }.sortBy(_.getPath.toString)
    require(statuses.nonEmpty, s"no files matched: ${paths.mkString(",")}")
    val nonEmpty = statuses.filter(_.getLen > 0) // empty files = zero records
    if (nonEmpty.isEmpty) return Array.empty

    // dim from the first 4 bytes of EVERY file (one header read per file at
    // planning, no data pass): a mixed-dim glob must fail HERE — file
    // lengths can happen to divide evenly by the wrong record size, and
    // id-only/count scans never reach the per-record dim check, so a
    // first-file-only read would silently mis-assign ids and counts
    def headerDim(f: FileStatus): Int = {
      val in = f.getPath.getFileSystem(hconf).open(f.getPath)
      try {
        val b = new Array[Byte](4)
        in.readFully(0L, b)
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
      } finally in.close()
    }
    val dim: Int = headerDim(nonEmpty.head)
    require(dim > 0, s"bad fvecs/ivecs dim: $dim")
    nonEmpty.drop(1).foreach { f =>
      val d = headerDim(f)
      require(d == dim,
        s"${f.getPath}: dim $d differs from ${nonEmpty.head.getPath}'s dim $dim — " +
          "all files of one fvecs/ivecs load must share a dimension")
    }
    val recLen = 4L + 4L * dim

    val wantVec = readSchema.fieldNames.contains(vecColName)
    val wantId = readSchema.fieldNames.contains("id")

    val parts = Array.newBuilder[InputPartition]
    var baseId = 0L
    for (st <- nonEmpty) {
      require(st.getLen % recLen == 0,
        s"${st.getPath}: length ${st.getLen} not a multiple of record size $recLen (dim=$dim)")
      val nRecs = st.getLen / recLen
      // id-range prune: this file covers ids [baseId, baseId + nRecs)
      val lo = math.max(baseId, idLo)
      val hi = math.min(baseId + nRecs - 1, idHi)
      if (lo <= hi) {
        val recsPerSlice = math.max(1L, maxBytes / recLen)
        var sliceLo = lo
        while (sliceLo <= hi) {
          val sliceHi = math.min(sliceLo + recsPerSlice - 1, hi)
          parts += VecsInputPartition(
            st.getPath.toString,
            startOffset = (sliceLo - baseId) * recLen,
            startId = sliceLo,
            numRecs = sliceHi - sliceLo + 1,
            dim = dim, isFloat = isFloat, wantId = wantId, wantVec = wantVec)
          sliceLo = sliceHi + 1
        }
      }
      baseId += nRecs
    }
    parts.result()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VecsReaderFactory(new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf()))
  override def readSchema(): StructType = readSchema
}

/** Java-serializable Hadoop conf (via its Writable form): the SESSION conf
  * — `spark.hadoop.*` overrides, object-store credentials/endpoints — must
  * reach executor-side file opens; a bare `new Configuration()` there
  * silently drops them (parquet reads in the same session would work,
  * making the failure look path-specific). */
private[sources] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = value.write(out)
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[sources] case class VecsInputPartition(
    path: String,
    startOffset: Long,
    startId: Long,
    numRecs: Long,
    dim: Int,
    isFloat: Boolean,
    wantId: Boolean,
    wantVec: Boolean) extends InputPartition

private[sources] class VecsReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new VecsPartitionReader(partition.asInstanceOf[VecsInputPartition], conf)
}

private[sources] class VecsPartitionReader(p: VecsInputPartition, conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val recLen = 4 + 4 * p.dim
  // executor-side open uses the propagated SESSION Hadoop conf (see
  // SerializableHadoopConf) — never a bare new Configuration()
  private lazy val in = {
    val hp = new HPath(p.path)
    val stream = hp.getFileSystem(conf.value).open(hp)
    if (p.wantVec) stream.seek(p.startOffset)
    stream
  }
  private val buf = new Array[Byte](recLen)
  private var i = 0L
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (i >= p.numRecs) return false
    val nCols = (if (p.wantId) 1 else 0) + (if (p.wantVec) 1 else 0)
    val values = new Array[Any](nCols)
    var c = 0
    if (p.wantId) { values(c) = p.startId + i; c += 1 }
    if (p.wantVec) {
      in.readFully(buf, 0, recLen)
      val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      val d = bb.getInt
      if (d != p.dim) throw new java.io.IOException(
        s"${p.path}: record ${p.startId + i} has dim $d, expected ${p.dim}")
      if (p.isFloat) {
        val v = new Array[Float](p.dim)
        var j = 0
        while (j < p.dim) { v(j) = bb.getFloat; j += 1 }
        values(c) = ArrayData.toArrayData(v)
      } else {
        val v = new Array[Int](p.dim)
        var j = 0
        while (j < p.dim) { v(j) = bb.getInt; j += 1 }
        values(c) = ArrayData.toArrayData(v)
      }
    }
    row = new GenericInternalRow(values)
    i += 1
    true
  }

  override def get(): InternalRow = row

  override def close(): Unit =
    if (p.wantVec) in.close() // `in` is lazy: never opened on id-only scans
}
