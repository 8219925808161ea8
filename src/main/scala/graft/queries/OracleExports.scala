package graft.queries

import graft.operators.PQModel
import org.apache.spark.sql.SparkSession

/** Deterministic trained artifacts exported for the driver's DuckDB oracle.
  *
  * PQ codebooks are a pure function of (data, params, seed) — the reference
  * pins the same seeds for reproducibility (`ProductQuantization.java:64,149`,
  * `GraphIndexBuilder.java:337`). Exporting the codebook lets the oracle
  * recompute encode/decode from first principles in SQL instead of trusting
  * the engine's own assignment. The export lands under the repo (fixed
  * absolute path — the oracle SQL strings must embed it at authoring time);
  * it is runtime output, gitignored. */
object OracleExports {

  val dir = "/root/repo/.oracle"

  /** One row per (subspace, centroid): (subspace, centroid_id, off, centroid).
    * `off` is the subspace's 0-based start offset in the full vector. */
  def saveCodebook(s: SparkSession, m: PQModel): Unit = {
    import s.implicits._
    val rows = for {
      sub <- 0 until m.m
      c <- m.codebooks(sub).indices
    } yield (sub, c, m.subOffsets(sub), m.codebooks(sub)(c).toSeq)
    rows.toDF("subspace", "centroid_id", "off", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/pq_codebook")
  }
}
