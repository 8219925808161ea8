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

    // stage wall = build + MATERIALIZE (eager localCheckpoint + count):
    // DataFrame transforms are lazy, so timing the construction alone
    // would measure plan building, not the stage. Checkpoint (not cache)
    // between stages: cache keeps the full logical lineage, so by stage 7
    // every count re-optimizes a 7-stage plan tree and Catalyst time
    // swamps the work (measured: mixture stage 14.5s cached vs ~1s
    // checkpointed on 569 docs). At 100 TB the same move is writing
    // intermediate corpora to parquet between stages.
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
        .localCheckpoint()
    }

    // 2. exact dedup (fingerprint groupBy, one shuffle)
    val exact = stage("exact dedup") {
      val e = Dedup.exact(scored, "doc_id", "text")
      scored.join(e.filter(!col("is_dup")).select(col("id").as("doc_id")), "doc_id").localCheckpoint()
    }

    // 3. cross-doc shared-span dedup (Lee et al. exact-substring pass,
    //    FIRST of the two near-dup stages: it excises partial verbatim
    //    overlap that whole-doc LSH cannot see, keeping one canonical copy)
    var spanCleaned0: DataFrame = null
    val spanDeduped = stage("shared-span dedup") {
      val spans = CorpusPrep.sharedSpans(exact, "doc_id", "text", n = 8)
      spanCleaned0 = CorpusPrep.removeSpans(exact, spans, "doc_id", "text")
        .select(col("doc_id"), col("clean_text").as("text"),
          TextFunctions.tokenCount(col("clean_text")).as("n_tok"),
          col("n_removed_tokens"))
        .localCheckpoint()
      // spans can gut a doc below the quality floor — drop the husks
      spanCleaned0.filter(col("n_tok") >= 5).localCheckpoint()
    }
    // excised-token accounting BEFORE the floor filter (whole-doc-shaped
    // duplication removes the doc entirely; its tokens still count as excised)
    val removedToks = spanCleaned0.agg(sum("n_removed_tokens").cast("long"))
      .head().getLong(0)

    // 4. MinHash-LSH near-dup pairs on the span-cleaned text (banded join,
    //    hub-capped) -> connected components -> keep canonical per group
    val nearDeduped = stage("lsh near-dup + grouping") {
      val pairs = Dedup.minhashLsh(spanDeduped, "doc_id", "text",
        numHashes = 16, rowsPerBand = 4, threshold = 0.7, hubCap = 64)
      val groups = Dedup.duplicateGroups(spanDeduped.select("doc_id"), "doc_id",
        pairs.select("id1", "id2"))
      spanDeduped.join(groups.filter(col("is_canonical")).select(col("id").as("doc_id")),
        "doc_id").localCheckpoint()
    }

    // 5. repetition flagging (Gopher-style ratios; narrow)
    val unflagged = stage("repetition filter") {
      val rep = CorpusPrep.repetitionStats(nearDeduped, "doc_id", "text")
      nearDeduped.join(rep.filter(!col("flagged")).select("doc_id"), "doc_id").localCheckpoint()
    }

    // 6. decontamination vs a held-out "benchmark" slice (inverted-index
    //    shingle join, eval side broadcast)
    val clean = stage("decontamination") {
      val evalSet = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"), col("text"))
      val hits = CorpusPrep.decontaminate(unflagged, evalSet, "doc_id", "text")
        .filter(col("n_shared") >= 8)
        .select(col("doc_id")).distinct()
      unflagged.join(hits, Seq("doc_id"), "left_anti").localCheckpoint()
    }
    val toks = clean.agg(sum("n_tok").cast("long")).head().getLong(0)

    // 7. domain-mixture sampling to a token budget (deterministic
    //    hash-rate selection; sources src0-3 upweighted 2x)
    val mixed = stage("mixture sample") {
      val withSrc = clean.join(docs.select("doc_id", "source"), "doc_id")
      CorpusPrep.mixtureSample(withSrc, "doc_id", "text", "source",
        weights = (0 until 20).map(i => s"src$i" -> (if (i < 4) 2.0 else 1.0)).toMap,
        totalTokens = toks / 2).localCheckpoint()
    }
    val mixToks = mixed.agg(sum("n_toks").cast("long")).head().getLong(0)

    // 8. LM-quality tail cut: score the mix against a bigram model trained
    //    on the full cleaned corpus, drop the worst-perplexity 10%
    //    (CCNet-shaped: keep what looks like the reference distribution)
    val mixedText = mixed.join(clean.select("doc_id", "text"), "doc_id")
    val lmKept = stage("lm perplexity filter") {
      val xent = CorpusPrep.lmCrossEntropy(mixedText, clean, "doc_id", "text")
      val cut = xent.stat.approxQuantile("xent", Array(0.9), 0.001)(0)
      mixedText.join(xent.filter(col("xent") <= cut).select("doc_id"), "doc_id")
        .localCheckpoint()
    }

    // 9. train/val/test split (hash-deterministic, growth-stable) + pack
    //    the train split into 512-token examples + shard the EXAMPLES for
    //    write-out (sharding by doc would scatter a bin's members across
    //    shards and discard the packing)
    val split = stage("split+pack+shard") {
      val s3 = CorpusPrep.hashSplit(lmKept, "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      val train = lmKept.join(s3.filter(col("split") === "train").select("doc_id"), "doc_id")
      val packed = CorpusPrep.packSequences(train, "doc_id", "text", capacity = 512)
      val shards = CorpusPrep
        .shuffleShards(packed.select("bin_id").distinct(), "bin_id", nShards = 8)
        .withColumnRenamed("doc_id", "bin_id")
      packed.join(shards, "bin_id").localCheckpoint()
    }
    val nBins = split.select("bin_id").distinct().count()

    System.err.println(
      s"[pipeline] docs $total -> ${clean.count()} surviving " +
        s"($toks tokens, $removedToks span-excised); " +
        s"mix ${mixed.count()} docs / $mixToks tokens (budget ${toks / 2}); " +
        s"lm-kept ${lmKept.count()}; train ${split.count()} docs -> " +
        s"$nBins packed bins across 8 shards")
    spark.stop()
  }
}
