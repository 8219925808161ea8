package graft

import graft.operators.CorpusPrep
import org.apache.spark.sql.functions._

class CorpusPrepSpec extends SparkSpec {

  test("chunk: windows advance by stride, short tail kept, empty doc represented") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),
      (3L, "")).toDF("doc_id", "text")
    val got = CorpusPrep.chunk(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: starts 0,3,6 -> 3 chunks (a start at 9 would emit "t10",
    // a strict subset of chunk 2 — the no-subset-tail rule stops it)
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq === Seq(0, 1, 2))
    assert(d1.map(_._3).toSeq === Seq(4, 4, 4))
    assert(d1.head._4 === "t1 t2 t3 t4")
    assert(d1(1)._4 === "t4 t5 t6 t7") // overlap of 1 token
    assert(d1.last._4 === "t7 t8 t9 t10")
    // every chunk ends strictly later than its predecessor: no subsets
    val ends = d1.map(t => t._2 * 3 + t._3)
    assert(ends.sliding(2).forall(p => p.length < 2 || p(1) > p(0)))
    // doc 2: single chunk of 2; doc 3: one empty chunk
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0, 2, "a b")))
    assert(got.filter(_._1 == 3L).toSeq === Seq((3L, 0, 0, "")))
  }

  test("repetitionStats: repeated content flags, varied content passes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),          // one token repeated
      (2L, "one two three four five six seven eight"), // all distinct
      (3L, "")).toDF("doc_id", "text")
    val got = CorpusPrep.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val d1 = got.head
    assert(d1._2 === 0.75) // 4 trigrams, 1 distinct
    assert(d1._3 === 1.0)
    assert(d1._4)
    val d2 = got(1)
    assert(d2._2 === 0.0 && d2._3 === 0.125 && !d2._4)
    val d3 = got(2)
    assert(d3._2 === 0.0 && d3._3 === 0.0 && !d3._4)
  }

  test("sharedSpans: cross-doc passage detected, canonical copy exempt, islands merge") {
    import spark.implicits._
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10" // 10-token shared passage
    val docs = Seq(
      (1L, s"u1 u2 $shared u3 u4"),      // canonical occurrence (lowest doc_id, pos)
      (2L, s"v1 v2 v3 $shared v4"),      // duplicate occurrence -> one span
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8"),   // unique content -> no spans
      (4L, "x y z"),                     // shorter than n -> no windows
      (5L, "r1 r2 r3 r4 r1 r2 r3 r4 r1 r2 r3 r4") // within-doc repeat only -> no spans
    ).toDF("doc_id", "text")
    val n = 4
    val got = CorpusPrep.sharedSpans(docs, "doc_id", "text", n = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    // only doc 2 has removable windows: the shared run sits at positions 3..12,
    // windows 3..9 (7 windows of 4 tokens) merge into one island
    assert(got === Seq((2L, 3, 12, 7)))

    // keepFirst=false: every occurrence flagged — doc 1's copy (positions 2..11) too
    val all = CorpusPrep.sharedSpans(docs, "doc_id", "text", n = n, keepFirst = false)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(all === Seq((1L, 2, 11, 7), (2L, 3, 12, 7)))
  }

  test("sharedSpans: far-apart duplicated windows stay separate islands") {
    import spark.implicits._
    // two disjoint shared 4-grams separated by > n unique tokens in doc 2
    val docs = Seq(
      (1L, "p1 p2 p3 p4 zzz q1 q2 q3 q4"),
      (2L, "p1 p2 p3 p4 m1 m2 m3 m4 m5 m6 q1 q2 q3 q4")).toDF("doc_id", "text")
    val got = CorpusPrep.sharedSpans(docs, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(t => (t._1, t._2)).toSeq
    // doc 1 is canonical for both 4-grams; doc 2 gets two separate spans
    assert(got === Seq((2L, 0, 3), (2L, 10, 13)))
  }

  test("removeSpans: spans excised positionally, unspanned docs unchanged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "k l m n o"),
      (3L, "")).toDF("doc_id", "text")
    val spans = Seq((1L, 2, 4), (1L, 6, 6)).toDF("doc_id", "span_start", "span_end")
    val got = CorpusPrep.removeSpans(docs, spans, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(got === Seq((1L, "a b f h", 4), (2L, "k l m n o", 0), (3L, "", 0)))
  }

  test("sharedSpans + removeSpans: end-to-end leaves exactly one copy of the passage") {
    import spark.implicits._
    val shared = "d1 d2 d3 d4 d5 d6"
    val docs = Seq(
      (1L, s"$shared tail1 tail2"),
      (2L, s"head1 $shared"),
      (3L, s"head2 head3 $shared tail3")).toDF("doc_id", "text")
    val spans = CorpusPrep.sharedSpans(docs, "doc_id", "text", n = 4)
    val cleaned = CorpusPrep.removeSpans(docs, spans, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    // doc 1 keeps the canonical copy; docs 2 and 3 lose theirs
    assert(cleaned === Seq(
      (1L, s"$shared tail1 tail2"), (2L, "head1"), (3L, "head2 head3 tail3")))
  }

  test("sharedSpans: matches a from-scratch oracle on random small-vocab corpora") {
    import spark.implicits._
    val n = 3
    val rnd = new scala.util.Random(20260814)
    // 12 cases, each with its own token vocabulary (prefixed, so cases can
    // never share windows) -> one global Spark run equals per-case runs
    val docs = (0 until 12).flatMap { c =>
      val nDocs = 6 + rnd.nextInt(7)
      (0 until nDocs).map { i =>
        val len = rnd.nextInt(26)
        val toks = Seq.fill(len)(s"c${c}t${rnd.nextInt(8)}")
        (c * 1000L + i, toks.mkString(" "))
      }
    }
    val df = docs.toDF("doc_id", "text")

    // brute-force oracle: exact token-sequence keys instead of hashes,
    // otherwise the definition verbatim
    def oracle(keepFirst: Boolean): Set[(Long, Int, Int, Int)] = {
      val wins = docs.flatMap { case (id, text) =>
        val t = text.trim.toLowerCase
        val toks = if (t.isEmpty) Array.empty[String] else t.split("\\s+")
        (0 to toks.length - n).map(p => (toks.slice(p, p + n).mkString(" "), id, p))
      }
      val removable = wins.groupBy(_._1).values.flatMap { occ =>
        val docsIn = occ.map(_._2).distinct
        if (docsIn.size < 2) Nil
        else {
          val sorted = occ.map(o => (o._2, o._3)).sortBy(identity)
          if (keepFirst) sorted.tail else sorted
        }
      }.toSeq.distinct
      removable.groupBy(_._1).flatMap { case (id, ps) =>
        val sorted = ps.map(_._2).distinct.sorted
        // islands: split where the start gap exceeds n
        val islands = sorted.foldLeft(List.empty[List[Int]]) {
          case (acc, p) if acc.nonEmpty && p - acc.head.head <= n =>
            (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }
        islands.map(isl => (id, isl.min, isl.max + n - 1, isl.size))
      }.toSet
    }

    for (keepFirst <- Seq(true, false)) {
      val got = CorpusPrep.sharedSpans(df, "doc_id", "text", n = n,
          keepFirst = keepFirst)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
      assert(got === oracle(keepFirst), s"keepFirst=$keepFirst mismatch")
      assert(got.nonEmpty, "vacuous oracle case — widen the generator")
    }
  }

  test("mixtureSample: deterministic, weight-proportional, exclusions honored") {
    import spark.implicits._
    // two identical domains of 200 x 10-token docs + one unweighted domain
    val docs = (0 until 200).flatMap { i =>
      Seq((i.toLong, "A", (1 to 10).mkString(" ")),
        (1000L + i, "B", (1 to 10).mkString(" ")),
        (2000L + i, "C", (1 to 10).mkString(" ")))
    }.toDF("doc_id", "source", "text")
    val sel = CorpusPrep.mixtureSample(docs, "doc_id", "text", "source",
      Map("A" -> 3.0, "B" -> 1.0), totalTokens = 2000L)
    val byDom = sel.groupBy("domain").agg(sum("n_toks").as("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // rates: A = (3/4)*2000/2000 = 0.75, B = 0.25, C excluded (defaultWeight 0)
    assert(!byDom.contains("C"))
    assert(byDom("A") > byDom("B"))
    assert(math.abs(byDom("A") - 1500L) < 400, s"A tokens ${byDom("A")} far from 1500")
    assert(math.abs(byDom("B") - 500L) < 400, s"B tokens ${byDom("B")} far from 500")
    // deterministic: second run bit-identical
    val again = CorpusPrep.mixtureSample(docs, "doc_id", "text", "source",
      Map("A" -> 3.0, "B" -> 1.0), totalTokens = 2000L)
      .collect().map(_.toSeq).toSet
    assert(again === sel.collect().map(_.toSeq).toSet)
  }

  test("mixtureSample: domain smaller than its budget is taken whole (rate caps at 1)") {
    import spark.implicits._
    val docs = ((0 until 5).map(i => (i.toLong, "tiny", "a b c")) ++
      (100 until 300).map(i => (i.toLong, "big", (1 to 20).mkString(" "))))
      .toDF("doc_id", "source", "text")
    val sel = CorpusPrep.mixtureSample(docs, "doc_id", "text", "source",
      Map("tiny" -> 1.0, "big" -> 1.0), totalTokens = 2000L)
    val tiny = sel.filter(col("domain") === "tiny").count()
    assert(tiny === 5L) // budget 1000 tokens >> 15 available -> all 5 docs
  }

  test("decontaminate: shared shingles counted, clean docs absent") {
    import spark.implicits._
    val evalSet = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "we saw the quick brown fox yesterday"), // shares 3-grams
      (2L, "completely unrelated content here")).toDF("doc_id", "text")
    val got = CorpusPrep.decontaminate(train, evalSet, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 shares "the quick brown" and "quick brown fox"
    assert(got.toSeq === Seq((1L, 100L, 2L)))
  }

  test("hashSplit: partition of ids, deterministic, proportions near fractions") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val fr = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val got = CorpusPrep.hashSplit(docs, "doc_id", fr).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.length === 2000)
    assert(got.map(_._1).distinct.length === 2000) // every id exactly once
    val byS = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byS.keySet === Set("train", "val", "test"))
    // expectation 1500/250/250; allow ~4 sigma (~39 for train)
    assert(math.abs(byS("train") - 1500) < 80, s"train=${byS("train")}")
    assert(math.abs(byS("val") - 250) < 60)
    // deterministic: re-running yields the identical assignment
    val again = CorpusPrep.hashSplit(docs, "doc_id", fr).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // growth stability: the same ids in a larger corpus keep their split
    val grown = (0L until 4000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val g2 = CorpusPrep.hashSplit(grown, "doc_id", fr).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.forall { case (id, s) => g2(id) == s })
  }

  test("redactPii: emails/IPs/phones replaced and counted; clean text untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "host 192.168.001.5 and 10.0.0.1 up"),
      (3L, "call 555-123-4567 today"),
      (4L, "nothing sensitive here at all"),
      (5L, "combo a@b.io 1.2.3.4 555-000-1111")).toDF("doc_id", "text")
    val got = CorpusPrep.redactPii(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .sortBy(_._1).toSeq
    assert(got(0) === ((1L, "mail <EMAIL> now", 1, 0, 0)))
    assert(got(1) === ((2L, "host <IP> and <IP> up", 0, 2, 0)))
    assert(got(2) === ((3L, "call <PHONE> today", 0, 0, 1)))
    assert(got(3) === ((4L, "nothing sensitive here at all", 0, 0, 0)))
    assert(got(4) === ((5L, "combo <EMAIL> <IP> <PHONE>", 1, 1, 1)))
  }

  test("shuffleShards: reproducible permutation, dense positions, salt varies order") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = CorpusPrep.shuffleShards(docs, "doc_id", nShards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.length === 500)
    assert(got.map(_._1).distinct.length === 500)
    assert(got.forall(t => t._2 >= 0 && t._2 < 8))
    // positions dense 1..n within each shard
    got.groupBy(_._2).values.foreach { ms =>
      assert(ms.map(_._3).sorted.toSeq === (1 to ms.length).toSeq)
    }
    // deterministic across runs
    val again = CorpusPrep.shuffleShards(docs, "doc_id", nShards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // a different salt yields a different permutation
    val other = CorpusPrep.shuffleShards(docs, "doc_id", nShards = 8, salt = "epoch2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(other.sortBy(_._1).toSeq !== got.sortBy(_._1).toSeq)
    // not the identity order: doc ids within a shard are scrambled vs pos
    val shard0 = got.filter(_._2 == got.head._2).sortBy(_._3).map(_._1)
    assert(shard0.toSeq !== shard0.sorted.toSeq)
  }

  test("lmCrossEntropy: matches hand-computed bigram model; short docs score 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "z")).toDF("doc_id", "text")
    val got = CorpusPrep.lmCrossEntropy(docs, docs, "doc_id", "text", addK = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    // counts: cb(a,b)=3 cb(b,a)=1 cb(b,c)=1; cu(a)=3 cu(b)=2; V=4 (a b c z)
    val pAB = 3.5 / 5.0 // (3+0.5)/(3+0.5*4)
    val pBA = 1.5 / 4.0 // (1+0.5)/(2+0.5*4)
    val pBC = 1.5 / 4.0
    val want1 = -(math.log(pAB) + math.log(pBA) + math.log(pAB)) / 3
    val want2 = -(math.log(pAB) + math.log(pBC)) / 2
    assert(got.map(t => (t._1, t._2)) === Seq((1L, 3), (2L, 2), (3L, 0)))
    assert(math.abs(got(0)._3 - want1) < 1e-6)
    assert(math.abs(got(1)._3 - want2) < 1e-6)
    assert(got(2)._3 === 0.0)
    // outlier detection: a doc full of unseen bigrams scores higher than
    // one assembled from common ones
    val ref = (0L until 50L).map(i => (i, "the cat sat on the mat")).toDF("doc_id", "text")
    val probe = Seq((100L, "the cat sat"), (101L, "qq ww ee rr")).toDF("doc_id", "text")
    val x = CorpusPrep.lmCrossEntropy(probe, ref, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(x(101L) > x(100L))
  }

  test("lmTrain/lmScore: pre-trained model scores bit-identical to the inline route") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val words = Array("the", "cat", "sat", "on", "mat", "dog", "ran", "far", "qq", "ww")
    val ref = (0L until 300L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(10))(words(rnd.nextInt(words.length))).mkString(" ")))
      .toDF("doc_id", "text")
    val docs = (1000L until 1100L).map(i =>
      (i, Seq.fill(2 + rnd.nextInt(8))(words(rnd.nextInt(words.length))).mkString(" ") +
        (if (i % 7 == 0) " unseen_token_" + i else "")))
      .toDF("doc_id", "text")
    val inline = CorpusPrep.lmCrossEntropy(docs, ref, "doc_id", "text", addK = 0.5)
    val model = CorpusPrep.lmTrain(ref, "doc_id", "text", addK = 0.5)
    val pre = CorpusPrep.lmScore(model, docs, "doc_id", "text")
    assert(pre.count() === inline.count())
    assert(pre.join(inline, Seq("doc_id", "n_bigrams", "xent"), "left_anti").count() === 0L,
      "pre-trained route must be bit-identical to the inline route")
    // head-split routing over the pre-trained model is exact too
    val preSplit = CorpusPrep.lmScore(model, docs, "doc_id", "text",
      headBigrams = 16, headCoverage = Some(0.7), headMinCount = Some(2L))
    assert(preSplit.join(inline, Seq("doc_id", "n_bigrams", "xent"), "left_anti").count() === 0L,
      "pre-trained head-split route must be bit-identical")
  }

  test("lmCrossEntropy: head-broadcast split is exact vs the unsplit join on Zipfian text") {
    import spark.implicits._
    // Zipf-ish: token w_k drawn with weight ~ 1/(k+1); a small head of
    // bigrams carries most of the occurrence mass, so the split activates
    val rnd = new scala.util.Random(11)
    def tok(): String = "w" + math.min((1.0 / math.max(rnd.nextDouble(), 1e-6) - 1).toInt, 40)
    val docs = (0L until 300L)
      .map(i => (i, Seq.fill(30)(tok()).mkString(" "))).toDF("doc_id", "text")
    def run(split: Boolean) =
      CorpusPrep.lmCrossEntropy(docs, docs, "doc_id", "text", headBigrams = 1024,
        headCoverage = if (split) Some(0.9) else None)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
    // head smaller than the distinct-bigram count but covering most mass:
    // the opt-in split engages AND the miss branch carries real tail traffic
    val split = run(true)
    val plain = run(false)
    assert(split === plain, "head/tail routing must not change any score")
  }

  test("bpeishTokens: letter/digit/punct runs split; whitespace dropped") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val got = Seq(("3.14 isn't x2 hello-world", 0))
      .toDF("text", "z")
      .select(TextFunctions.bpeishTokens(col("text")).as("t"),
        TextFunctions.bpeishTokenCount(col("text")).as("n"))
      .head()
    assert(got.getSeq[String](0) ===
      Seq("3", ".", "14", "isn", "'", "t", "x", "2", "hello", "-", "world"))
    assert(got.getInt(1) === 11)
    // pure lowercase words: agrees with whitespace tokenization
    val plain = Seq(("the quick brown fox", 0)).toDF("text", "z")
      .select(TextFunctions.bpeishTokenCount(col("text")).as("n"),
        TextFunctions.tokenCount(col("text")).as("w")).head()
    assert(plain.getInt(0) === plain.getInt(1))
  }

  test("packSequences: invariants hold on random lengths; oversize isolated") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cap = 100
    for (trial <- 0 until 5) {
      val n = 200 + rnd.nextInt(200)
      val docs = (0 until n).map { i =>
        // mix of blank, tiny, mid, and some oversize docs
        val len = rnd.nextInt(4) match {
          case 0 => rnd.nextInt(2) * (1 + rnd.nextInt(19)) // ~half blank
          case 1 => 20 + rnd.nextInt(60)
          case 2 => if (rnd.nextInt(10) == 0) cap + 1 + rnd.nextInt(50) else 40 + rnd.nextInt(55)
          case 3 => 1 + rnd.nextInt(cap)
        }
        (i.toLong, (1 to len).map(j => s"t$j").mkString(" "))
      }.toDF("doc_id", "text")
      val parts = 3
      // tiny open window on some trials to exercise the bin-closing path
      val window = if (trial % 2 == 0) 4 else 256
      val res = CorpusPrep.packSequences(docs, "doc_id", "text", cap,
        partitions = parts, openWindow = window)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      assert(res.length === n)
      assert(res.map(_._1).distinct.length === n)
      // oversize flag iff n_toks > cap; oversize bins are singletons
      res.foreach { case (_, nt, _, ov) => assert(ov === (nt > cap)) }
      val byBin = res.groupBy(_._3)
      byBin.values.foreach { members =>
        if (members.exists(_._4)) assert(members.length === 1)
        else assert(members.map(_._2).sum <= cap)
      }
      // first-fit bound: at most one under-half bin per partition
      val underHalf = byBin.values.filter(ms => !ms.exists(_._4) && ms.map(_._2).sum < cap / 2)
      assert(underHalf.size <= parts, s"trial $trial: ${underHalf.size} under-half bins")
    }
  }
}
