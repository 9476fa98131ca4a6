package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding columns.
  *
  * `scale = max|x| / 127`, `q_i = round(127 · x_i / max|x|) ∈ [-127, 127]`
  * stored as TINYINT — 4× smaller than float32 at rest and, more important
  * at 100 TB, 4× fewer shuffle bytes for every embedding exchange (LSH
  * table replication, block-pair dedup joins, ANN candidate joins).
  *
  * Cosine is scale-invariant, so quantized similarity search needs NO
  * dequantization: cos(q_a, q_b) approximates cos(a, b) with both scales
  * cancelling — only consumers of magnitudes (not angles) dequantize.
  *
  * Zero vectors quantize to all-zero with scale 0 (guarded — the unguarded
  * division would produce NaN components that ANSI mode rejects at the
  * tinyint cast).
  */
object Quantize {

  /** (idCol, qvec: array<tinyint>, scale: float). The 127·x/max ordering
    * of operations is part of the contract — the DuckDB oracle replays the
    * identical IEEE expression. Computed by the fused codegen'd
    * [[graft.functions.expressions.Int8Quantize]] (one pass, no
    * interpreted lambdas); [[toInt8Reference]] keeps the higher-order-
    * function spelling of the same contract and QuantizeSpec proves them
    * bit-identical. */
  def toInt8(df: DataFrame, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val q = graft.functions.expressions.VectorExpressions
      .int8QuantizeNative(col(vecCol))
    df.select(col(idCol),
      q.getField("qvec").as("qvec"),
      q.getField("scale").as("scale"))
  }

  /** The oracle form of [[toInt8]]: three HOF passes spelling out the
    * contract arithmetic. Kept for verification, not for bulk use. The
    * scale guard is null-propagating (`otherwise` only when mab = 0, not
    * when the VECTOR is null) so a null embedding row yields (null, null)
    * here exactly as the null-propagating native expression does. */
  def toInt8Reference(df: DataFrame, idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val mab = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.select(col(idCol),
      when(mab > 0,
        transform(col(vecCol), x =>
          round(lit(127.0) * x.cast("double") / mab).cast("tinyint")))
        .otherwise(transform(col(vecCol), _ => lit(0).cast("tinyint")))
        .as("qvec"),
      when(mab > 0, mab / 127.0)
        .when(col(vecCol).isNotNull, lit(0.0))
        .cast("float").as("scale"))
  }

  /** The int8 vector as array<float>, the input type of the codegen'd
    * cosine scorer ([[Similarity.cosineFast]]); values ≤ 127 are exact in
    * float, so no precision is lost re-widening. An array-typed `cast`
    * (codegen'd), not a per-element transform lambda (interpreted). */
  def asFloats(qv: Column): Column = qv.cast("array<float>")

  /** Dequantized vector, for consumers that need magnitudes. */
  def dequantize(qv: Column, scale: Column): Column =
    transform(qv, x => x.cast("float") * scale)
}
