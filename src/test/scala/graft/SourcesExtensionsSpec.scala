package graft

import graft.operators.Multimodal
import graft.sources.Fvecs
import org.apache.spark.sql.functions._

class SourcesExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("fvecs round-trip: write -> read preserves vectors and dense ids") {
    val tmp = java.nio.file.Files.createTempDirectory("fvecs").toString
    val rnd = new scala.util.Random(5)
    val vecs = Array.fill(100)(Array.fill(12)(rnd.nextFloat()))
    Fvecs.writeFvecs(s"$tmp/x.fvecs", vecs.iterator)
    val df = Fvecs.readFvecs(spark, s"$tmp/x.fvecs")
    assert(df.count() === 100)
    val got = df.orderBy("id").as[(Long, Seq[Float])].collect()
    assert(got.map(_._1).toSeq === (0L until 100L))
    assert(got(7)._2 === vecs(7).toSeq)
  }

  test("fvecs V2: multi-file glob assigns dense ids in path order, split-invariant") {
    val tmp = java.nio.file.Files.createTempDirectory("fvecs_multi").toString
    val rnd = new scala.util.Random(11)
    val a = Array.fill(40)(Array.fill(8)(rnd.nextFloat()))
    val b = Array.fill(25)(Array.fill(8)(rnd.nextFloat()))
    Fvecs.writeFvecs(s"$tmp/part-0.fvecs", a.iterator)
    Fvecs.writeFvecs(s"$tmp/part-1.fvecs", b.iterator)
    val df = spark.read.format("fvecs").load(s"$tmp/*.fvecs")
    val got = df.orderBy("id").as[(Long, Seq[Float])].collect()
    assert(got.length === 65)
    assert(got.map(_._1).toSeq === (0L until 65L))
    assert(got(39)._2 === a(39).toSeq)
    assert(got(40)._2 === b(0).toSeq) // file boundary: ids continue densely
    // force many tiny slices: same result regardless of split geometry
    withSQLConf("spark.sql.files.maxPartitionBytes" -> "128") {
      val split = spark.read.format("fvecs").load(s"$tmp/*.fvecs")
      assert(split.rdd.getNumPartitions > 4)
      val g2 = split.orderBy("id").as[(Long, Seq[Float])].collect()
      assert(g2.toSeq === got.toSeq)
    }
  }

  test("fvecs V2: mixed-dim glob fails at planning, not silently") {
    val tmp = java.nio.file.Files.createTempDirectory("fvecs_mixdim").toString
    Fvecs.writeFvecs(s"$tmp/part-0.fvecs",
      Seq(Array(1f, 2f, 3f, 4f), Array(5f, 6f, 7f, 8f)).iterator) // dim 4
    Fvecs.writeFvecs(s"$tmp/part-1.fvecs",
      Seq(Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f, 10f)).iterator) // dim 10: 44 bytes, NOT a multiple of 20
    Fvecs.writeFvecs(s"$tmp/part-2.fvecs",
      Seq(Array(1f, 2f, 3f), Array(4f, 5f, 6f), Array(7f, 8f, 9f),
        Array(1f, 1f, 1f), Array(2f, 2f, 2f)).iterator) // dim 3: 80 bytes = 4 dim-4 records — divides evenly!
    val e = intercept[Exception] {
      // id-only scan: the per-record dim check never runs, so without the
      // per-file header validation this would return WRONG counts/ids
      spark.read.format("fvecs").load(s"$tmp/*.fvecs").select("id").count()
    }
    assert(e.getMessage.contains("dim"), s"expected a dim-mismatch planning error, got: ${e.getMessage}")
  }

  test("fvecs V2: id-range filters prune slices at planning time") {
    val tmp = java.nio.file.Files.createTempDirectory("fvecs_prune").toString
    val vecs = Array.tabulate(100)(i => Array.fill(4)(i.toFloat))
    Fvecs.writeFvecs(s"$tmp/x.fvecs", vecs.iterator)
    withSQLConf("spark.sql.files.maxPartitionBytes" -> "100") { // 5 recs/slice
      val df = spark.read.format("fvecs").load(s"$tmp/x.fvecs")
        .filter(col("id") >= 90 && col("id") < 95)
      // planning-time prune: only the covering slice(s) survive
      assert(df.rdd.getNumPartitions <= 2)
      val got = df.orderBy("id").as[(Long, Seq[Float])].collect()
      assert(got.map(_._1).toSeq === (90L until 95L))
      assert(got.head._2 === vecs(90).toSeq)
    }
  }

  test("fvecs V2: id-only projection and count(*) never decode vectors") {
    val tmp = java.nio.file.Files.createTempDirectory("fvecs_prj").toString
    Fvecs.writeFvecs(s"$tmp/x.fvecs",
      Array.fill(30)(Array.fill(6)(1.0f)).iterator)
    val df = spark.read.format("fvecs").load(s"$tmp/x.fvecs")
    assert(df.count() === 30)
    assert(df.select("id").as[Long].collect().toSeq === (0L until 30L))
    // the scan's read schema is pruned to id only
    val plan = df.select("id").queryExecution.executedPlan.toString
    assert(!plan.contains("vec,") || plan.contains("cols=id"))
  }

  test("ivecs reader decodes int lists") {
    val tmp = java.nio.file.Files.createTempDirectory("ivecs").toString
    // ivecs = same layout with ints; reuse writer via float bits
    val lists = Array.tabulate(10)(i => Array(i, i + 1, i + 2))
    Fvecs.writeFvecs(s"$tmp/gt.ivecs",
      lists.iterator.map(_.map(x => java.lang.Float.intBitsToFloat(x))))
    val df = Fvecs.readIvecs(spark, s"$tmp/gt.ivecs")
    val got = df.orderBy("id").as[(Long, Seq[Int])].collect()
    assert(got(3)._2 === Seq(3, 4, 5))
  }

  test("fvecs/ivecs V2 parse externally-produced files (siftsmall fixture)") {
    // the reference repo ships the public SIFT small query/ground-truth
    // files — files we did NOT write, so this checks format interop, not
    // writer/reader symmetry. Guarded: skipped if the fixture is absent.
    val q = "/root/reference/siftsmall/siftsmall_query.fvecs"
    val gt = "/root/reference/siftsmall/siftsmall_groundtruth.ivecs"
    assume(new java.io.File(q).exists() && new java.io.File(gt).exists())
    val queries = spark.read.format("fvecs").load(q)
    val truth = spark.read.format("ivecs").load(gt)
    assert(queries.count() === 100) // 100 queries x 128d: 100*(4+512)=51600 bytes
    assert(truth.count() === 100) // 100 lists x 100 neighbors: 100*(4+400)=40400
    val q0 = queries.orderBy("id").head()
    assert(q0.getSeq[Float](1).length === 128)
    val t0 = truth.orderBy("id").head()
    val nbrs = t0.getSeq[Int](1)
    assert(nbrs.length === 100)
    assert(nbrs.forall(n => n >= 0 && n < 10000), "neighbor ordinals index the 10k base set")
  }

  test("graft_* SQL functions evaluate through the registry") {
    GraftFunctions.register(spark)
    Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b").createOrReplaceTempView("v")
    val r = spark.sql(
      "SELECT graft_cosine(a, b) c, graft_cosine_sim(a, b) cs, graft_dot(a, b) d FROM v").head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 1.0)
    val sh = spark.sql("SELECT graft_simhash('a b c') s").head().getString(0)
    assert(sh.length === 64)
    val j = spark.sql(
      "SELECT graft_jaccard(array('a','b'), array('b','c')) j").head().getDouble(0)
    assert(j === 1.0 / 3.0)
    // n-gram kernels take a literal n; values match the Column surface
    val sg = spark.sql("SELECT graft_shingles('a b c d', 2) s").head().getSeq[Long](0)
    val sgCol = Seq(("a b c d", 0)).toDF("t", "z")
      .select(graft.functions.HashExpressions.ngramShingles(col("t"), 2))
      .head().getSeq[Long](0)
    assert(sg === sgCol)
    val wh = spark.sql("SELECT graft_window_hashes('a b c d', 2) w").head().getSeq[Long](0)
    assert(wh.length === 3) // positioned: one per window start
    intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b', length('xx')) s").collect()
    }
  }

  test("multimodal: batched feature extraction emits normalized histograms") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "aaaa".getBytes("UTF-8"), Some(2), Some(2), None),
      Multimodal.MediaRow(2L, "audio", Array[Byte](0, 0, 0, -1), None, None, Some(16000)))
      .toDS()
    val feats = Multimodal.extractFeatures(media, batchSize = 1).collect()
      .map(f => f.media_id -> f.feature).toMap
    assert(feats(1L).sum === 1.0 +- 1e-9)
    assert(feats(1L)(6) === 1.0) // 'a' = 0x61 -> high nibble 6
    assert(feats(2L)(0) === 0.75) // three 0x00 bytes
    assert(feats(2L)(15) === 0.25) // one 0xff byte
    // batch shape must not leak into results (real decoders amortize init
    // per batch; outputs are per-row)
    val feats64 = Multimodal.extractFeatures(media, batchSize = 64).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(feats.map { case (k, v) => k -> v.toSeq } === feats64)
  }

  test("frame sampling emits strided block fingerprints") {
    val bytes = Array.fill[Byte](5000)(7)
    val media = Seq((1L, "video", bytes)).toDF("media_id", "kind", "bytes")
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    // 5 blocks of 1KiB -> strided to blocks 0, 2, 4
    assert(frames.length === 3)
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
  }

  implicit class DoubleOps(d: Double) {
    def +-(eps: Double): org.scalactic.TripleEqualsSupport.Spread[Double] =
      org.scalactic.TripleEqualsSupport.Spread(d, eps)
  }
}
