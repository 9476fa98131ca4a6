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

  /** Deterministic ±1 JL sign matrix: `s_ji = +1` iff the first 8 hex
    * digits of `md5("rp:<seed>:<j>:<i>")` parse to an EVEN integer. md5
    * (not a JVM hash) so the DuckDB oracle rebuilds the identical matrix
    * in SQL; the matrix is model-sized (outDim×inDim bytes) and rides in
    * the serialized plan — nothing is broadcast or stored. */
  def jlSignMatrix(outDim: Int, inDim: Int, seed: Int): Array[Array[Byte]] = {
    require(outDim >= 1 && inDim >= 1, "dims must be >= 1")
    Array.tabulate(outDim, inDim) { (j, i) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp:$seed:$j:$i".getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.toByte else (-1).toByte
    }
  }

  /** Johnson-Lindenstrauss random projection of an `array<float>`
    * embedding column to `outDim` dims — the compress-before-ANN step (at
    * 100 TB, project 64→8/16 before indexing and re-rank survivors on the
    * full vectors). One fused codegen'd pass per row
    * ([[graft.functions.expressions.RandomProject]]); deterministic in
    * `seed`; vectors whose length is not `inDim` project to NULL
    * (corruption surfaces, never silently mis-projects). */
  def randomProject(vec: Column, outDim: Int, inDim: Int,
                    seed: Int = 0): Column =
    graft.functions.expressions.VectorExpressions
      .randomProjectNative(vec, jlSignMatrix(outDim, inDim, seed))
}
