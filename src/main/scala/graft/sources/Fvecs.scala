package graft.sources

import java.io.DataInputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** fvecs/ivecs readers (the reference's external vector format:
  * little-endian `[dim:int32][float32*dim]` records,
  * `jvector-examples/.../util/SiftLoader.java:38-84`) re-expressed as a
  * Spark source: records are fixed-length once dim is known, so the file
  * splits cleanly with `binaryRecords` — each executor decodes its own
  * slice, ids are assigned by global position (dense ordinals, matching
  * RandomAccessVectorValues semantics). One-shot convert to parquet for
  * anything bigger than a benchmark fixture.
  */
object Fvecs {

  private def readDim(path: String): Int = {
    val in = new DataInputStream(Files.newInputStream(Paths.get(path)))
    try {
      val b = new Array[Byte](4)
      in.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
    } finally in.close()
  }

  /** (id LONG, vec ARRAY<FLOAT>) with ids 0..n-1 in file order. */
  def readFvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val dim = readDim(path)
    val recLen = 4 + 4 * dim
    spark.sparkContext.binaryRecords(path, recLen)
      .zipWithIndex()
      .map { case (bytes, idx) =>
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val d = buf.getInt
        require(d == dim, s"inconsistent dim $d != $dim at record $idx")
        val v = new Array[Float](dim)
        var i = 0
        while (i < dim) { v(i) = buf.getFloat; i += 1 }
        (idx, v)
      }
      .toDF("id", "vec")
  }

  /** (id LONG, neighbors ARRAY<INT>) ground-truth lists. */
  def readIvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val dim = readDim(path)
    val recLen = 4 + 4 * dim
    spark.sparkContext.binaryRecords(path, recLen)
      .zipWithIndex()
      .map { case (bytes, idx) =>
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val d = buf.getInt
        require(d == dim, s"inconsistent dim $d != $dim at record $idx")
        val v = new Array[Int](dim)
        var i = 0
        while (i < dim) { v(i) = buf.getInt; i += 1 }
        (idx, v)
      }
      .toDF("id", "neighbors")
  }

  /** Writer (test fixtures / interop). Local filesystem, driver-side. */
  def writeFvecs(path: String, vectors: Iterator[Array[Float]]): Unit = {
    val out = Files.newOutputStream(Paths.get(path))
    try {
      for (v <- vectors) {
        val buf = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
        buf.putInt(v.length)
        v.foreach(buf.putFloat)
        out.write(buf.array())
      }
    } finally out.close()
  }
}
