package graft.tools

import graft.operators.CorpusPrep
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale demo for cross-document shared-span dedup
  * ([[CorpusPrep.sharedSpans]]): plant known verbatim passages into a
  * large synthetic corpus of otherwise-unique text, run the operator, and
  * verify it recovers EXACTLY the planted occurrences (minus one canonical
  * copy per passage) at a wall-clock that scales with corpus tokens.
  *
  * Corpus shape: `nDocs` docs x ~60 unique filler tokens (`u<id>_<i>` —
  * no accidental 8-gram collisions). Docs with id % plantEvery == 0 get a
  * 16-token passage (one of `nPassages` variants, chosen by id) spliced
  * after 20 filler tokens. Expected spans = planted docs - nPassages
  * (the lexicographically first occurrence of each passage is exempt), and
  * every span must cover the full 16-token passage (window n=8 islands
  * merge back to the passage extent: 9 windows, positions 20..35).
  *
  * Run: sbt "runMain graft.tools.SpanScaleBench [nDocs] [threads]"
  * (defaults 200000 16)
  */
object SpanScaleBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 200000
    val threads = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-span-scale")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nPassages = 32
    val plantEvery = 20 // 5% of docs carry a passage
    val passageLen = 16
    val fillerLen = 60

    // text = 20 unique tokens, [passage], 40 more unique tokens
    val filler = (start: Int, end: Int) =>
      concat_ws(" ", transform(sequence(lit(start), lit(end - 1)),
        i => concat(lit("u"), col("id"), lit("_"), i)))
    val passage = concat_ws(" ", transform(sequence(lit(0), lit(passageLen - 1)),
      i => concat(lit("p"), pmod(col("id") / plantEvery, lit(nPassages)).cast("int"),
        lit("_"), i)))
    val docs = spark.range(nDocs)
      .withColumn("text",
        when(col("id") % plantEvery === 0,
          concat_ws(" ", filler(0, 20), passage, filler(20, fillerLen - passageLen + 20)))
          .otherwise(filler(0, fillerLen)))
      .select(col("id").as("doc_id"), col("text"))
      .localCheckpoint() // generation cost out of the measured wall

    val planted = nDocs / plantEvery + (if (nDocs % plantEvery > 0) 1 else 0)
    val expectSpans = planted - math.min(nPassages, planted)

    val t0 = System.nanoTime()
    val spans = CorpusPrep.sharedSpans(docs, "doc_id", "text", n = 8).cache()
    val got = spans.count()
    val wall = (System.nanoTime() - t0) / 1e9

    // every recovered span must be exactly the planted passage extent
    val badExtent = spans.filter(col("span_start") =!= 20 ||
      col("span_end") =!= (20 + passageLen - 1)).count()
    // and only planted docs may carry spans
    val badDoc = spans.filter(col("doc_id") % plantEvery =!= 0).count()

    System.err.println(
      f"[span-scale] nDocs=$nDocs (${nDocs.toLong * fillerLen / 1000000.0}%.1fM tokens) " +
        f"planted=$planted passages=$nPassages -> spans=$got " +
        f"(expect $expectSpans) badExtent=$badExtent badDoc=$badDoc wall=$wall%.1fs")
    assert(got == expectSpans, s"span count $got != expected $expectSpans")
    assert(badExtent == 0 && badDoc == 0, "span extent/doc contract violated")
    spark.stop()
  }
}
