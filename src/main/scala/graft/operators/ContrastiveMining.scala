package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive training-pair mining over an embedding corpus: for each
  * anchor, emit its top positives (similarity at or above `posT` — the
  * paraphrase/duplicate band) and its top HARD negatives (the most
  * similar items strictly below `negT`) — the standard batch-mining step
  * for training embedding models with a contrastive or triplet loss
  * (hard negatives carry the gradient signal; easy ones are wasted
  * compute). The band [negT, posT) is the ambiguity margin and is
  * excluded from both sides.
  *
  * Scale shape: identical to the exact k-NN join — per-(anchor, item)
  * scoring with bounded per-anchor top-k heaps aggregating map-side, so
  * the shuffle carries O(anchors · k) rows, never the scored matrix. At
  * corpus scale the caller swaps the scored input for an ANN/IVF
  * candidate set ([[graft.index.Ivf.knnJoin]]) and mines from candidates;
  * the thresholds and heap logic are unchanged.
  *
  * Output: (qid, kind, rank, nid, score) — kind 'pos' | 'neg', rank
  * 1-based by (score desc, nid asc) within its kind. Anchors with no
  * items in a band simply emit no rows of that kind.
  *
  * `excludeSelf` (default true) drops nid == qid pairs and therefore
  * PRESUPPOSES anchors are drawn from the base id space (an anchor is its
  * own perfect positive). Anchors numbered independently of the corpus
  * must pass excludeSelf = false, or an unrelated base item that happens
  * to share the anchor's id is silently lost.
  */
object ContrastiveMining {

  def minePairs(
      base: DataFrame,
      anchors: DataFrame,
      kPos: Int,
      kNeg: Int,
      posT: Double,
      negT: Double,
      baseId: String = "vec_id",
      baseVec: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    require(negT <= posT, s"negT $negT must be <= posT $posT")
    val b = KnnExact.spreadSmall(
      base.select(col(baseId).cast("long").as("nid"), col(baseVec).as("v")))
    val paired = b
      .crossJoin(broadcast(anchors.select(col("qid").cast("long").as("qid"),
        col("qvec"))))
    val scored = (if (excludeSelf) paired.filter(col("nid") =!= col("qid")) else paired)
      .withColumn("s", VectorFunctions.cosineSim(col("v"), col("qvec")))
    // ONE corpus pass: tag the band inline and heap per (qid, kind) — a
    // per-band union would score and scan the base twice
    val top = TopK.udf(math.max(kPos, kNeg))
    scored
      .withColumn("kind",
        when(col("s") >= posT, "pos").when(col("s") < negT, "neg"))
      .filter(col("kind").isNotNull)
      .groupBy(col("qid"), col("kind"))
      .agg(top(col("nid"), col("s")).as("t"))
      .select(col("qid"), col("kind"), posexplode(col("t")))
      .select(col("qid"), col("kind"), (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as("nid"), round(col("col._2"), 6).as("score"))
      .filter(col("rank") <= when(col("kind") === "pos", kPos).otherwise(kNeg))
  }
}
