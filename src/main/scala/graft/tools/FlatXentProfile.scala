package graft.tools

import graft.operators.CorpusPrep
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase decomposition of lmCrossEntropy's default route — the residual
  * from round 9's task list ("flat ≤ 30s or show the floor is
  * shuffle-bound with numbers"). Corpus is `flat` (uniform 4k vocab —
  * the model-size pathology: ~60M tokens over 16M possible bigrams means
  * the bigram model is corpus-scale, ~15.6M distinct), `flatgib` (the
  * CorpusScaleBench fixture: flat + planted gibberish), or `zipf` (rank
  * ~ floor(V·u^6), head-concentrated model like real text).
  *
  * EVERY timed action forces all output columns through a hash-sum —
  * count() is NOT a valid forcing action here: Catalyst prunes the
  * entire scoring arithmetic (the lpFixed projection, the model-side
  * columns) under count(), and the "measurement" then times a plan the
  * caller never runs.
  *
  * Phases, in one JVM:
  *   floor xx (cold/hot) — tokenize + bigram explode + xxhash64 +
  *     distinct-count: the corpus pass any route pays per side.
  *   floor md5 (hot)     — same pass with the md5-based 60-bit keys the
  *     real route uses (oracle-mirrorable in DuckDB): isolates the
  *     hashing convention's cost.
  *   train+score         — first forced action on the scoring plan:
  *     materializes the persisted count model AND runs the scoring join.
  *   score (hot)         — second forced action: the model comes from
  *     cache, isolating the corpus-scale join + per-doc aggregate.
  *
  * Run: sbt "runMain graft.tools.FlatXentProfile [flat|flatgib|zipf] [nDocs] [threads]"
  */
object FlatXentProfile {
  def main(args: Array[String]): Unit = {
    val corpus = if (args.length > 0) args(0) else "flat"
    val nDocs = if (args.length > 1) args(1).toInt else 1000000
    val threads = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-xent-profile")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocab = 4000
    val tokensPerDoc = 60
    val text =
      if (corpus == "flatgib")
        // CorpusScaleBench's exact flat fixture: every 1000th doc is
        // gibberish (60 globally-unique tokens -> unseen bigrams)
        when(col("id") % 1000 === 0,
          concat_ws(" ", transform(sequence(lit(0), lit(tokensPerDoc - 1)),
            i => concat(lit("zz"), col("id"), lit("_"), i))))
          .otherwise(concat_ws(" ", transform(sequence(lit(0), lit(tokensPerDoc - 1)),
            i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(vocab.toLong))))))
      else if (corpus == "zipf")
        concat_ws(" ", transform(sequence(lit(0), lit(tokensPerDoc - 1)),
          i => concat(lit("z"), floor(lit(vocab.toDouble) * pow(
            pmod(xxhash64(col("id"), i, lit(7)), lit(1L << 40)).cast("double")
              / lit((1L << 40).toDouble), lit(6.0))).cast("long"))))
      else
        concat_ws(" ", transform(sequence(lit(0), lit(tokensPerDoc - 1)),
          i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(vocab.toLong)))))
    val docs = spark.range(nDocs)
      .withColumn("text", text)
      .select(col("id").as("doc_id"), col("text"))
      .localCheckpoint()

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      System.err.println(
        f"[xent-$corpus] $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2fs  (out=$n)")
    }

    // forcing action: hash every output column into a sum — nothing can
    // be pruned above or below it
    def force(df: DataFrame): Long = {
      val h = xxhash64(df.columns.map(col).toSeq: _*)
      df.agg(bit_xor(h)).head().getLong(0)
    }

    def bigramPass(key: Column => Column): Long = docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(explode(transform(sequence(lit(0), size(col("toks")) - 2),
        i => concat_ws(" ", element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2)))).as("bg"))
      .select(key(col("bg")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .agg(bit_xor(xxhash64(col("h"), col("c")))).head().getLong(0)
    val xxKey = (c: Column) => xxhash64(c)
    // the real route's convention: 60-bit slice of md5 (DuckDB-mirrorable)
    val md5Key = (c: Column) =>
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    timed("floor xx (cold)")(bigramPass(xxKey))
    timed("floor xx (hot)")(bigramPass(xxKey))
    timed("floor md5 (hot)")(bigramPass(md5Key))

    val scored = CorpusPrep.lmCrossEntropy(docs, docs, "doc_id", "text")
    timed("train+score")(force(scored))
    timed("score (hot)")(force(scored))
    spark.stop()
  }
}
