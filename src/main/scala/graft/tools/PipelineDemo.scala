package graft.tools

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{CorpusPrep, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation demo: the composition a 100 TB
  * pretraining pipeline runs, stage for stage, over the synthetic
  * documents table — language ID -> quality filter -> exact dedup ->
  * MinHash-LSH near-dup clustering -> repetition flagging -> eval-set
  * decontamination -> token accounting. Every stage is one of the
  * engine's oracled operators; this tool measures the composition
  * (rows in/out + wall per stage) rather than re-testing semantics.
  *
  * All stages are narrow or single-shuffle (see each operator's scaladoc);
  * nothing here collects a corpus-sized structure to the driver, so the
  * same code runs at cluster scale with only partition-count tuning.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.PipelineDemo"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage wall = build + MATERIALIZE (count on the cached frame):
    // DataFrame transforms are lazy, so timing the construction alone
    // would measure plan building, not the stage
    def stage(name: String)(body: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val df = body
      val c = df.count()
      System.err.println(
        f"[pipeline] $name%-28s rows=$c%-7d ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      df
    }

    val docs = Tables.documents(spark, sfDir).cache()
    val total = docs.count()

    // 1. language ID + quality gate (codegen scalar columns; narrow).
    // The en stopword list scores quality, so the language gate keeps the
    // score meaningful for what survives.
    val scored = stage("langid+quality") {
      docs.select(col("doc_id"), col("text"),
          TextFunctions.langId(col("text")).as("lang_pred"),
          TextFunctions.qualityScore(col("text"),
            TextFunctions.stopwordsByLang.toMap.apply("en")).as("q"),
          TextFunctions.tokenCount(col("text")).as("n_tok"))
        .filter(col("lang_pred") === "en" && col("n_tok") >= 5 && col("q") >= 0.2)
        .cache()
    }

    // 2. exact dedup (fingerprint groupBy, one shuffle)
    val exact = stage("exact dedup") {
      val e = Dedup.exact(scored, "doc_id", "text")
      scored.join(e.filter(!col("is_dup")).select(col("id").as("doc_id")), "doc_id").cache()
    }

    // 3. MinHash-LSH near-dup pairs (banded join, hub-capped) ->
    //    connected components -> keep canonical per duplicate group
    val nearDeduped = stage("lsh near-dup + grouping") {
      val pairs = Dedup.minhashLsh(exact, "doc_id", "text",
        numHashes = 16, rowsPerBand = 4, threshold = 0.7, hubCap = 64)
      val groups = Dedup.duplicateGroups(exact.select("doc_id"), "doc_id",
        pairs.select("id1", "id2"))
      exact.join(groups.filter(col("is_canonical")).select(col("id").as("doc_id")),
        "doc_id").cache()
    }

    // 4. repetition flagging (Gopher-style ratios; narrow)
    val unflagged = stage("repetition filter") {
      val rep = CorpusPrep.repetitionStats(nearDeduped, "doc_id", "text")
      nearDeduped.join(rep.filter(!col("flagged")).select("doc_id"), "doc_id").cache()
    }

    // 5. decontamination vs a held-out "benchmark" slice (inverted-index
    //    shingle join, eval side broadcast)
    val clean = stage("decontamination") {
      val evalSet = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"), col("text"))
      val hits = CorpusPrep.decontaminate(unflagged, evalSet, "doc_id", "text")
        .filter(col("n_shared") >= 8)
        .select(col("doc_id")).distinct()
      unflagged.join(hits, Seq("doc_id"), "left_anti").cache()
    }

    // 6. token accounting on the emitted corpus
    val toks = clean.agg(sum("n_tok").cast("long")).head().getLong(0)
    System.err.println(s"[pipeline] docs $total -> ${clean.count()} surviving, $toks tokens")
    spark.stop()
  }
}
