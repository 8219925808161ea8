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
