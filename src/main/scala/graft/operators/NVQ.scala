package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NVQ: non-uniform (logistic) scalar quantization, the reference's default
  * rerank encoding (jvector `quantization/NVQuantization.java`; paper cited
  * in its README, arXiv 2509.18471).
  *
  * Semantics carried over (`NVQuantization.java:487-560`):
  *   - the global mean vector is subtracted before quantization
  *     (`NVQuantization.java:150-158`);
  *   - each vector splits into nSubVectors subvectors (2, or 1 when dim <= 2,
  *     `Grid.java:509`) with PQ's size/offset rule;
  *   - per ROW and subvector: min/max plus a learned logistic growth rate;
  *     midpoint fixed at 0; codes are 8-bit logistic-CDF buckets
  *     (`DefaultVectorUtilSupport.nvqQuantize8bit:487-502`);
  *   - the growth rate maximizes uniformLoss/nvqLoss over the reference's
  *     grid: coarse 1e-6 then +1.0 steps below 20, fine +-1 in 0.1 steps
  *     (`NVQuantization.java:530-558`).
  *
  * Documented deviation: the reference evaluates the logistic via an
  * `NQT` power-of-two bit trick (`DefaultVectorUtilSupport.java:456-484`)
  * — a SIMD-era fast-math approximation. We use the exact logistic/logit;
  * the quality contract (reconstruction error <= the uniform grid's, which
  * holds by construction since the grid includes a ~uniform growth rate)
  * is gated in QuantizationSpec.
  */
object NVQ {

  case class Model(mean: Array[Double], nSubs: Int, sizes: Array[Int], offsets: Array[Int])
      extends Serializable

  /** Global mean + subvector layout. One aggregation job; the model is tiny
    * (dim doubles) and rides to executors inside closures. */
  def train(df: DataFrame, vecCol: String, nSubs: Int = 2): Model = {
    val mean = df.select(posexplode(col(vecCol).cast("array<double>")))
      .groupBy("pos").agg(avg("col").as("m")).orderBy("pos")
      .collect().map(_.getDouble(1))
    val ns = if (mean.length <= 2) 1 else nSubs
    val (sizes, offsets) = PQ.subvectorSizes(mean.length, ns)
    Model(mean, ns, sizes, offsets)
  }

  // x0 (midpoint) is fixed at 0 as in the reference
  private def sigma(x: Double, a: Double): Double = 1.0 / (1.0 + math.exp(-a * x))
  private def logit(y: Double, a: Double): Double = math.log(y / (1.0 - y)) / a

  /** 8-bit (255 levels) or 4-bit (15 levels) — the reference's two widths
    * (`NVQuantization.BitsPerDimension`, `NVQuantization.java:44-79`). */
  private def maxLevel(bits: Int): Int = {
    require(bits == 8 || bits == 4, s"NVQ supports 8 or 4 bits, got $bits")
    (1 << bits) - 1
  }

  /** Quantize one mean-centered subvector: logistic CDF rescaled to
    * 0..(2^bits - 1). */
  private[graft] def quantizeSub(v: Array[Double], gr: Double, bits: Int = 8): Array[Int] = {
    val lv = maxLevel(bits)
    val mn = v.min; val mx = v.max; val delta = mx - mn
    if (delta <= 0) return Array.fill(v.length)(0)
    val a = gr / delta
    val bias = sigma(mn, a)
    val scale = (sigma(mx, a) - bias) / lv
    v.map { x =>
      val q = math.round((sigma(x, a) - bias) / scale).toInt
      math.min(lv, math.max(0, q))
    }
  }

  private[graft] def dequantizeSub(
      codes: Array[Int], gr: Double, mn: Double, mx: Double, bits: Int = 8): Array[Double] = {
    val lv = maxLevel(bits)
    val delta = mx - mn
    if (delta <= 0) return Array.fill(codes.length)(mn)
    val a = gr / delta
    val bias = sigma(mn, a)
    val scale = (sigma(mx, a) - bias) / lv
    codes.map(q => logit(q * scale + bias, a))
  }

  private def roundtripLoss(v: Array[Double], gr: Double, bits: Int): Double = {
    val dec = dequantizeSub(quantizeSub(v, gr, bits), gr, v.min, v.max, bits)
    var s = 0.0; var i = 0
    while (i < v.length) { val t = v(i) - dec(i); s += t * t; i += 1 }
    s
  }

  /** Squared error of the plain uniform grid at the same width — the
    * learned rate must beat this ratio-wise (jvector `nvqUniformLoss`). */
  private[graft] def uniformLoss(v: Array[Double], bits: Int = 8): Double = {
    val lv = maxLevel(bits)
    val mn = v.min; val mx = v.max; val delta = mx - mn
    if (delta <= 0) return 0.0
    var s = 0.0; var i = 0
    while (i < v.length) {
      val q = math.round((v(i) - mn) / delta * lv)
      val dec = mn + q * delta / lv
      val t = v(i) - dec; s += t * t
      i += 1
    }
    s
  }

  /** The reference's coarse+fine grid over the uniform/nvq loss ratio. */
  private[graft] def learnGrowthRate(v: Array[Double], bits: Int = 8): Double = {
    val base = uniformLoss(v, bits)
    if (base <= 0) return 1e-2
    var bestGr = 1e-6
    var bestRatio = -1.0
    def tryGr(gr: Double): Unit = if (gr > 0) {
      val l = roundtripLoss(v, gr, bits)
      val ratio = if (l <= 0) Double.MaxValue else base / l
      if (ratio > bestRatio) { bestRatio = ratio; bestGr = gr }
    }
    var gr = 1e-6
    while (gr < 20.0) { tryGr(gr); gr += 1.0 }
    val coarse = bestGr
    var g2 = coarse - 1.0
    while (g2 < coarse + 1.0) { tryGr(g2); g2 += 0.1 }
    bestGr
  }

  /** Per-row squared error of the plain per-subvector uniform 8-bit grid
    * (same mean-centering and subvector split as the NVQ encode) — the
    * baseline the learned logistic rate must beat on average, used by the
    * nvq_recon_error quality gate. */
  def uniformErrCol(df: DataFrame, vecCol: String, model: Model, bits: Int = 8): DataFrame = {
    val m = model
    val b = bits
    val f = udf { v: Seq[Double] =>
      var total = 0.0
      var s = 0
      while (s < m.nSubs) {
        val sub = new Array[Double](m.sizes(s))
        var i = 0
        while (i < sub.length) {
          sub(i) = v(m.offsets(s) + i) - m.mean(m.offsets(s) + i); i += 1
        }
        total += uniformLoss(sub, b)
        s += 1
      }
      total
    }
    df.withColumn("uniform_err", f(col(vecCol).cast("array<double>")))
  }

  /** Self-contained per-row NVQ encode for the compressed-index mode
    * ([[graft.index.Ann]] `Params.nvqBits`): NO global-mean centering, so a
    * row's (codes, [growthRate, min, max] per subvector) decode without any
    * sidecar — segments stay independent under multi-batch globs, delete
    * repair and compaction. Deviation from the reference's global centering
    * is deliberate (distributed self-containment); the logistic quantizer
    * still adapts per subvector via the learned rate and range. */
  def encodeSelfContained(v: Array[Double], nSubs: Int, bits: Int): (Array[Int], Array[Array[Double]]) = {
    val ns = if (v.length <= 2) 1 else nSubs
    val (sizes, offsets) = PQ.subvectorSizes(v.length, ns)
    val codes = new Array[Int](v.length)
    val params = new Array[Array[Double]](ns)
    var s = 0
    while (s < ns) {
      val sub = java.util.Arrays.copyOfRange(v, offsets(s), offsets(s) + sizes(s))
      val gr = learnGrowthRate(sub, bits)
      val q = quantizeSub(sub, gr, bits)
      var i = 0
      while (i < q.length) { codes(offsets(s) + i) = q(i); i += 1 }
      params(s) = Array(gr, sub.min, sub.max)
      s += 1
    }
    (codes, params)
  }

  /** ArrayData adapter for [[graft.functions.NvqDecodeExpr]]: same
    * arithmetic as the Seq-based UDF it replaces, minus the boxed
    * conversions — this runs once per row at NVQ segment assembly (the
    * cold-start read path). Returns the float32 vector the index serves. */
  def decodeRow(codes: org.apache.spark.sql.catalyst.util.ArrayData,
      params: org.apache.spark.sql.catalyst.util.ArrayData,
      bits: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val ps = Array.tabulate(params.numElements())(i => params.getArray(i).toDoubleArray())
    val out = decodeSelfContained(codes.toIntArray(), ps, bits)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.map(_.toFloat))
  }

  /** Inverse of [[encodeSelfContained]] — layout re-derived from the code
    * length and the number of parameter triples. */
  def decodeSelfContained(codes: Array[Int], params: Array[Array[Double]], bits: Int): Array[Double] = {
    val ns = params.length
    val (sizes, offsets) = PQ.subvectorSizes(codes.length, ns)
    val out = new Array[Double](codes.length)
    var s = 0
    while (s < ns) {
      val q = java.util.Arrays.copyOfRange(codes, offsets(s), offsets(s) + sizes(s))
      val d = dequantizeSub(q, params(s)(0), params(s)(1), params(s)(2), bits)
      var i = 0
      while (i < d.length) { out(offsets(s) + i) = d(i); i += 1 }
      s += 1
    }
    out
  }

  /** Adds `nvq_code` (array<int>, full dim, 0..(2^bits - 1)) and
    * `nvq_params` (array<array<double>> of [growthRate, min, max] per
    * subvector). `bits` = 8 (default) or 4. */
  def encode(df: DataFrame, vecCol: String, model: Model, bits: Int = 8): DataFrame = {
    val m = model
    val b = bits
    val enc = udf { v: Seq[Double] =>
      val codes = new Array[Int](v.length)
      val params = new Array[Seq[Double]](m.nSubs)
      var s = 0
      while (s < m.nSubs) {
        val sub = new Array[Double](m.sizes(s))
        var i = 0
        while (i < sub.length) {
          sub(i) = v(m.offsets(s) + i) - m.mean(m.offsets(s) + i); i += 1
        }
        val gr = learnGrowthRate(sub, b)
        val q = quantizeSub(sub, gr, b)
        i = 0
        while (i < q.length) { codes(m.offsets(s) + i) = q(i); i += 1 }
        params(s) = Seq(gr, sub.min, sub.max)
        s += 1
      }
      (codes.toSeq, params.toSeq)
    }
    df.withColumn("__nvq", enc(col(vecCol).cast("array<double>")))
      .withColumn("nvq_code", col("__nvq._1"))
      .withColumn("nvq_params", col("__nvq._2"))
      .drop("__nvq")
  }

  /** Reconstruct (mean added back) — jvector's scorers dequantize on the
    * fly (`DefaultVectorUtilSupport.nvqDotProduct8bit:391-403`); batch
    * reconstruction is the DataFrame-shaped equivalent. */
  def decode(df: DataFrame, model: Model, outCol: String = "nvq_decoded",
      bits: Int = 8): DataFrame = {
    val m = model
    val b = bits
    val dec = udf { (codes: Seq[Int], params: Seq[Seq[Double]]) =>
      val out = new Array[Double](codes.length)
      var s = 0
      while (s < m.nSubs) {
        val q = new Array[Int](m.sizes(s))
        var i = 0
        while (i < q.length) { q(i) = codes(m.offsets(s) + i); i += 1 }
        val p = params(s)
        val d = dequantizeSub(q, p(0), p(1), p(2), b)
        i = 0
        while (i < d.length) { out(m.offsets(s) + i) = d(i) + m.mean(m.offsets(s) + i); i += 1 }
        s += 1
      }
      out.toSeq
    }
    df.withColumn(outCol, dec(col("nvq_code"), col("nvq_params")))
  }

  /** Two-phase k-NN with NVQ as the approximate scorer (the reference's
    * default rerank configuration): phase 1 scores reconstructions, phase 2
    * reranks survivors on full-res vectors. Same partial/final shape as
    * PQ.knn. Returns (qid, rank, nid, score). */
  def knn(
      baseEncoded: DataFrame,
      queries: DataFrame,
      model: Model,
      topK: Int,
      rerankK: Int,
      metric: String,
      baseId: String = "id",
      baseVec: String = "vec"): DataFrame = {

    val approx = decode(baseEncoded, model, "__dec")
      .select(col(baseId).cast("long").as("__nid"), col("__dec"))
      .crossJoin(broadcast(queries.select(col("qid"), col("qvec"))))
      .withColumn("__approx", VectorFunctions.similarity(metric)(col("__dec"), col("qvec")))
    val topkAgg = TopK.udf(rerankK)
    val candidates = approx.groupBy("qid")
      .agg(topkAgg(col("__nid"), col("__approx")).as("t"))
      .select(col("qid"), explode(col("t._1")).as("__nid"))

    val exact = candidates
      .join(baseEncoded.select(col(baseId).cast("long").as("__nid"), col(baseVec).as("__vec")), "__nid")
      .join(broadcast(queries.select(col("qid"), col("qvec"))), "qid")
      .withColumn("__score", VectorFunctions.similarity(metric)(col("__vec"), col("qvec")))
    val finalAgg = TopK.udf(topK)
    exact.groupBy("qid")
      .agg(finalAgg(col("__nid"), col("__score")).as("t"))
      .select(col("qid"), posexplode(col("t")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as("nid"), col("col._2").as("score"))
  }
}
