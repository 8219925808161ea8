package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** fvecs/ivecs readers (the reference's external vector format:
  * little-endian `[dim:int32][float32*dim]` records,
  * `jvector-examples/.../util/SiftLoader.java:38-84`). The read path is the
  * V2 source in [[VecsDataSource]] (`spark.read.format("fvecs")`); these are
  * the convenience wrappers plus a driver-side fixture writer.
  */
object Fvecs {

  /** (id LONG, vec ARRAY<FLOAT>) with ids 0..n-1 in file order.
    * Delegates to the V2 source ([[FvecsDataSource]]): ids derive from byte
    * offsets (no counting pass), files split on record boundaries. */
  def readFvecs(spark: SparkSession, path: String): DataFrame =
    spark.read.format("fvecs").load(path)

  /** (id LONG, neighbors ARRAY<INT>) ground-truth lists. */
  def readIvecs(spark: SparkSession, path: String): DataFrame =
    spark.read.format("ivecs").load(path)

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

  /** ivecs writer (same record layout, int32 elements). */
  def writeIvecs(path: String, lists: Iterator[Array[Int]]): Unit = {
    val out = Files.newOutputStream(Paths.get(path))
    try {
      for (v <- lists) {
        val buf = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
        buf.putInt(v.length)
        v.foreach(buf.putInt)
        out.write(buf.array())
      }
    } finally out.close()
  }
}
