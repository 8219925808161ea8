package graft.tools

import graft.operators.Bm25
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the persisted BM25 inverted index buys at serving time
  * vs the scan route, on a synthetic corpus big enough for the contrast
  * to mean something: per-query wall and bytes actually read
  * (/proc/self/io rchar deltas, the same basis as IvfPqMicro).
  *
  * Corpus: n docs of ~60 tokens drawn deterministically from a vocab of
  * `vocab` words with a Zipf-ish skew (word w appears with weight
  * 1/(1+w%97)), so term df varies across queries like real text.
  *
  * Run: sbt "runMain graft.tools.Bm25Micro [nDocs] [vocab] [nQueries]"
  */
object Bm25Micro {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val vocab = if (args.length > 1) args(1).toInt else 20000
    val nq = if (args.length > 2) args(2).toInt else 30
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("bm25-micro")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def fsBytesRead(): Long =
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/self/io"))
        .stream().filter(_.startsWith("rchar:")).findFirst()
        .map[Long](l => l.split("\\s+")(1).toLong).orElse(0L)
    def measure(label: String)(body: => Long): Unit = {
      val b0 = fsBytesRead(); val t0 = System.nanoTime()
      val rows = body
      val mb = (fsBytesRead() - b0) / 1e6
      println(f"### $label%-34s rows=$rows%7d read=${mb}%9.1f MB  ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }

    val tmp = java.nio.file.Files.createTempDirectory("bm25micro").toString

    // deterministic synthetic corpus: even token slots draw uniformly from
    // the full vocab (rare terms), odd slots from a 100-word hot set
    // (frequent terms) — so query df varies like real text
    val docs = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 60).map(k =>
          concat(lit("w"), pmod(hash(col("id") * 61 + lit(k)),
            lit(if (k % 2 == 0) vocab else 100)))): _*)
          .as("text"))
      .repartition(16)
    docs.write.mode("overwrite").parquet(s"$tmp/docs")
    val corpus = spark.read.parquet(s"$tmp/docs")

    val t0 = System.nanoTime()
    Bm25.buildIndex(corpus, "doc_id", "text", s"$tmp/idx", nBuckets = 64)
    println(f"### index build (one corpus pass)   ${(System.nanoTime() - t0) / 1e9}%6.2fs")

    // nq 3-term queries: two rare terms + one hot term each
    val queries = (0 until nq).map(q => (q.toLong,
      Seq(s"w${(q * 7919 + 13) % vocab}", s"w${(q * 104729 + 57) % vocab}",
        s"w${q % 100}")))

    // warm both routes once (plan/codegen)
    Bm25.search(corpus, "doc_id", "text", queries.head._2, topN = 20).count()
    Bm25.searchIndex(spark, s"$tmp/idx", queries.head._2, topN = 20).count()

    measure(s"scan route, $nq queries") {
      queries.map { case (_, terms) =>
        Bm25.search(corpus, "doc_id", "text", terms, topN = 20).count()
      }.sum
    }
    measure(s"index route, $nq queries") {
      queries.map { case (_, terms) =>
        Bm25.searchIndex(spark, s"$tmp/idx", terms, topN = 20).count()
      }.sum
    }
    measure(s"index batch route, $nq queries") {
      Bm25.searchIndexBatch(spark, s"$tmp/idx",
        queries.toDF("qid", "terms"), topN = 20).count()
    }
    spark.stop()
  }
}
