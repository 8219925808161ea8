package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQ8: per-vector uniform 8-bit scalar quantization.
  *
  * Fills the reference's scalar-quantized-rerank slot (jvector's default
  * rerank feature is NVQ, `quantization/NVQuantization.java`). Deviation
  * from the reference, on purpose: NVQ learns a logistic non-uniform grid
  * per subvector; SQ8 uses a uniform per-vector grid, which makes encode,
  * decode and scoring pure closed-form arithmetic — fully DuckDB-oracle-able
  * (the learned-parameter variant can't be SQL-verified). Compression is
  * the same 4x (8 bits/dim + 2 floats of per-vector metadata).
  *
  *   code_i = floor((v_i - lo) / (hi - lo) * 255 + 0.5),  lo/hi = min/max(v)
  *   dec_i  = lo + code_i * (hi - lo) / 255
  */
object SQ8 {

  def lo(vec: Column): Column = array_min(vec.cast("array<double>"))
  def hi(vec: Column): Column = array_max(vec.cast("array<double>"))

  /** array<int> of 0..255 codes; all-zero when the vector is constant. */
  def encode(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val l = array_min(v)
    val h = array_max(v)
    transform(v, x =>
      when(h === l, lit(0))
        .otherwise(floor((x - l) / (h - l) * 255.0 + 0.5).cast("int")))
  }

  /** Decode codes back to doubles given per-vector lo/hi columns. */
  def decode(code: Column, lo: Column, hi: Column): Column =
    transform(code, b => lo + b.cast("double") * (hi - lo) / 255.0)
}
