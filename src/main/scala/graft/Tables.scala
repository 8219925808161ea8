package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * All tables are plain parquet; Catalyst handles column pruning and
  * predicate pushdown into the scan, so every query should `select`
  * only what it needs and filter as early as possible.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The events table's ts column has shipped in two physical forms across
    // driver generations; normalize both to a session-tz TimestampType so
    // every downstream query (unix_micros, windows, as-of) sees one type:
    //  - TIMESTAMP(NANOS): Spark reads it as a nanos-since-epoch long
    //    (spark.sql.legacy.parquet.nanosAsLong=true — set in Session.build).
    //    Convert truncated to micros, matching DuckDB's nanos->micros
    //    truncation.
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    //    TIMESTAMP_NTZ, which time-zone-aware functions reject. Cast to
    //    TimestampType — the session tz is pinned to UTC everywhere, so the
    //    wall-clock values (and the DuckDB-compared strings) are unchanged.
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast(
          org.apache.spark.sql.types.TimestampType))
    else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
