package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def refDot(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
  private def refNormSq(a: Seq[Float]): Double =
    a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
  private def refL2Sq(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      val d = x.toDouble - y.toDouble; acc + d * d
    }

  private val rnd = new scala.util.Random(42)
  private def randVec(dim: Int): Seq[Float] =
    Seq.fill(dim)(rnd.nextFloat() * 10f - 5f)

  test("dot / normSq / l2Sq match sequential scalar reference bit-exactly") {
    val cases = Seq.fill(25)((randVec(8), randVec(8)))
    val rows = cases.toDF("a", "b")
      .select(dot($"a", $"b"), normSq($"a"), l2Sq($"a", $"b"))
      .collect()
    for (((a, b), row) <- cases.zip(rows)) {
      assert(row.getDouble(0) === refDot(a, b))
      assert(row.getDouble(1) === refNormSq(a))
      assert(row.getDouble(2) === refL2Sq(a, b))
    }
  }

  test("similarity normalization formulas match the reference engine") {
    // jvector VectorSimilarityFunction.java:37-69:
    // EUCLIDEAN 1/(1+d2), DOT (1+dot)/2, COSINE (1+cos)/2
    val a = Seq(1.0f, 0.0f, 0.0f)
    val b = Seq(0.0f, 1.0f, 0.0f)
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(
      euclideanSim($"a", $"b"), dotSim($"a", $"b"), cosineSim($"a", $"b"),
      cosineSim($"a", $"a")).head()
    assert(r.getDouble(0) === 1.0 / 3.0) // l2sq = 2
    assert(r.getDouble(1) === 0.5) // dot = 0
    assert(r.getDouble(2) === 0.5) // cos = 0
    assert(r.getDouble(3) === 1.0) // self-cosine
  }

  test("l2Normalize produces unit vectors") {
    val cases = Seq.fill(10)(randVec(16)).filter(v => refNormSq(v) > 1e-6)
    val rows = cases.map(Tuple1(_)).toDF("a")
      .select(normSq(l2Normalize($"a"))).collect()
    for (row <- rows) assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
  }

  test("hammingDistance counts differing bits in packed longs") {
    val df = Seq((Array(0xFFL, 0x0FL), Array(0x0FL, 0x0FL))).toDF("a", "b")
    assert(df.select(hammingDistance($"a", $"b")).head().getLong(0) === 4L)
  }

  test("subVector slices 0-based") {
    val df = Seq(Tuple1(Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("a")
    assert(df.select(subVector($"a", 1, 2)).head().getSeq[Float](0) === Seq(2.0f, 3.0f))
  }

  test("NearestCentroidExpr matches driver-side assignOne and stays codegen") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(4)
    val model = graft.index.Ivf.IvfModel("COSINE",
      Array.fill(8)(Array.fill(6)(rnd.nextDouble() * 2 - 1)))
    val vecs = Seq.fill(200)(Array.fill(6)(rnd.nextDouble() * 2 - 1))
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toDF("id", "v")
    val res = df.select(col("id"),
        graft.functions.VectorExpressions.nearestCentroid(col("v"), model).as("c"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      assert(res(i) === model.assignOne(v), s"row $i")
    }
    // the whole assignment must ride whole-stage codegen (no UDF node) —
    // over a real scan (a LocalTableScan collapses the projection and
    // shows no codegen span regardless of the expression)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ncexpr").toString
    df.write.mode("overwrite").parquet(tmp)
    val plan = spark.read.parquet(tmp)
      .select(graft.functions.VectorExpressions.nearestCentroid(col("v"), model))
      .queryExecution.executedPlan.toString
    // "*(N) Project" is the whole-stage-codegen marker in the simple string
    assert(plan.contains("*(1) Project [nearestcentroidexpr"),
      s"assignment not inside a codegen span:\n$plan")
    assert(!plan.contains("UDF"), s"UDF node in plan:\n$plan")
  }

  test("centroidAt matches the element_at(typedLit) route bit-exactly and stays codegen") {
    import org.apache.spark.sql.functions.{col, element_at, typedLit}
    val rnd = new scala.util.Random(9)
    val model = graft.index.Ivf.IvfModel("EUCLIDEAN",
      Array.fill(7)(Array.fill(5)(rnd.nextDouble() * 2 - 1)))
    val df = (0 until 50).map(i => (i.toLong, i % 7)).toDF("id", "cluster_id")
    val centLit = typedLit(model.centroids.map(_.toSeq).toSeq)
    val both = df.select(col("id"),
        graft.functions.VectorExpressions.centroidAt(col("cluster_id"), model).as("a"),
        element_at(centLit, col("cluster_id") + 1).as("b"))
      .collect()
    both.foreach { r =>
      // the residual paths (v - centroid[cell]) swapped the plan-embedded
      // literal for this broadcast lookup — arithmetic must be bit-identical
      assert(r.getSeq[Double](1) === r.getSeq[Double](2), s"row ${r.getLong(0)}")
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_centat").toString
    df.write.mode("overwrite").parquet(tmp)
    val plan = spark.read.parquet(tmp)
      .select(graft.functions.VectorExpressions.centroidAt(col("cluster_id"), model))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [centroidatexpr"),
      s"centroid lookup not inside a codegen span:\n$plan")
  }
}
