package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for product quantization (Jégou et al. 2011,
  * "Product Quantization for Nearest Neighbor Search" — public paper): the
  * memory-compression tier of the ANN stack. A 64-dim float32 embedding is
  * 256 bytes; its PQ code is `m` bytes (m subspace codes of ≤256 entries
  * each) — 16-32× smaller, which at 100 TB is the difference between an
  * index that streams from memory and one that thrashes disk. Search runs
  * asymmetric distance computation (ADC): the QUERY stays exact, each
  * corpus vector is scored through per-subspace lookup tables in `m` adds —
  * no multiply, no decode.
  *
  * All three kernels are fused codegen'd expressions for the same reason as
  * [[CosineSimilarity]]: encode is a corpus-wide narrow pass and ADC is the
  * |corpus|·|queries| inner loop — interpreted higher-order functions there
  * dominate the plan.
  *
  * Shared normalization contract (cosine ANN wants angles): both encode and
  * LUT L2-NORMALIZE their input in double precision before touching the
  * codebooks, so `Σ_s lut[s][code_s] ≈ cos(q, x)` directly. Zero vectors
  * stay zero (their ADC score is the dot against centroids of the zero
  * vector — harmless, and re-ranking on true cosine makes the final answer
  * exact for whatever survives). A vector whose length differs from the
  * codebooks' `m·subDim` yields NULL — corruption surfaces, never silently
  * mis-encodes (the [[RandomProject]] convention).
  */
private[expressions] object PqModel {
  /** Flatten m×k×subDim codebooks to one float[] (s-major, then code, then
    * dim) — a single reference object the generated code indexes with
    * arithmetic, no nested array dereferences in the inner loop. */
  def flatten(cb: Array[Array[Array[Float]]]): Array[Float] = {
    val m = cb.length
    val k = cb(0).length
    val sub = cb(0)(0).length
    val out = new Array[Float](m * k * sub)
    var s = 0
    while (s < m) {
      require(cb(s).length == k, "ragged codebook: unequal k across subspaces")
      var c = 0
      while (c < k) {
        require(cb(s)(c).length == sub, "ragged codebook: unequal subDim")
        System.arraycopy(cb(s)(c), 0, out, (s * k + c) * sub, sub)
        c += 1
      }
      s += 1
    }
    out
  }
}

/** PQ-encode one `array<float>` vector: L2-normalize, then per subspace the
  * argmin-L2 codebook entry (ties to the SMALLER code — deterministic).
  * Output `array<tinyint>` of length m; k ≤ 256 (codes are unsigned bytes,
  * read back with `& 0xFF`). */
final case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
  extends UnaryExpression with ExpectsInputTypes {

  private val m: Int = codebooks.length
  private val k: Int = codebooks(0).length
  private val subDim: Int = codebooks(0)(0).length
  require(m >= 1 && k >= 1 && k <= 256 && subDim >= 1,
    s"PQ shape out of range: m=$m k=$k subDim=$subDim (k must be <= 256)")
  private val flat: Array[Float] = PqModel.flatten(codebooks)

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true // dim mismatch yields null
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != m * subDim) return null
    // L2 norm in double over the full vector
    var nx = 0.0
    var i = 0
    while (i < m * subDim) { val a = x.getFloat(i).toDouble; nx += a * a; i += 1 }
    val inv = if (nx > 0.0) 1.0 / math.sqrt(nx) else 0.0
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val diff = x.getFloat(s * subDim + j).toDouble * inv -
            flat((s * k + c) * subDim + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cb = ctx.addReferenceObj("pqFlat", flat, "float[]")
      val nx = ctx.freshName("nx")
      val inv = ctx.freshName("inv")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val a = ctx.freshName("a")
      s"""
         |if ($x.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $nx = 0.0;
         |  for (int $i = 0; $i < ${m * subDim}; $i++) {
         |    double $a = (double) $x.getFloat($i); $nx += $a * $a;
         |  }
         |  double $inv = ($nx > 0.0) ? (1.0 / java.lang.Math.sqrt($nx)) : 0.0;
         |  byte[] $out = new byte[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $best = 0; double $bestD = java.lang.Double.MAX_VALUE;
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $d = 0.0;
         |      for (int $j = 0; $j < $subDim; $j++) {
         |        double $diff = ((double) $x.getFloat($s * $subDim + $j)) * $inv
         |          - $cb[($s * $k + $c) * $subDim + $j];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    $out[$s] = (byte) $best;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query ADC lookup table: L2-normalize the query, then
  * `lut[s·k + c] = Σ_j q_norm[s·subDim + j] · cb[s][c][j]` — the inner
  * product of each codebook entry with the query's subvector, as one flat
  * `array<float>` of length m·k. Built once per QUERY (the small side);
  * every corpus code then scores in m adds via [[PqAdcScore]]. */
final case class PqLookupTable(child: Expression, codebooks: Array[Array[Array[Float]]])
  extends UnaryExpression with ExpectsInputTypes {

  private val m: Int = codebooks.length
  private val k: Int = codebooks(0).length
  private val subDim: Int = codebooks(0)(0).length
  private val flat: Array[Float] = PqModel.flatten(codebooks)

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lookup_table"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != m * subDim) return null
    var nx = 0.0
    var i = 0
    while (i < m * subDim) { val a = x.getFloat(i).toDouble; nx += a * a; i += 1 }
    val inv = if (nx > 0.0) 1.0 / math.sqrt(nx) else 0.0
    val out = new Array[Float](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        var dot = 0.0
        var j = 0
        while (j < subDim) {
          dot += x.getFloat(s * subDim + j).toDouble * inv *
            flat((s * k + c) * subDim + j)
          j += 1
        }
        out(s * k + c) = dot.toFloat
        c += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cb = ctx.addReferenceObj("pqFlat", flat, "float[]")
      val nx = ctx.freshName("nx")
      val inv = ctx.freshName("inv")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val a = ctx.freshName("a")
      s"""
         |if ($x.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $nx = 0.0;
         |  for (int $i = 0; $i < ${m * subDim}; $i++) {
         |    double $a = (double) $x.getFloat($i); $nx += $a * $a;
         |  }
         |  double $inv = ($nx > 0.0) ? (1.0 / java.lang.Math.sqrt($nx)) : 0.0;
         |  float[] $out = new float[${m * k}];
         |  for (int $s = 0; $s < $m; $s++) {
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $dot = 0.0;
         |      for (int $j = 0; $j < $subDim; $j++) {
         |        $dot += ((double) $x.getFloat($s * $subDim + $j)) * $inv
         |          * $cb[($s * $k + $c) * $subDim + $j];
         |      }
         |      $out[$s * $k + $c] = (float) $dot;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLookupTable =
    copy(child = newChild)
}

/** ADC score of one corpus code array against one query LUT:
  * `Σ_s lut[s·k + (codes[s] & 0xFF)]` with `k = |lut| / |codes|` — the
  * approximate cosine, in m float adds per candidate pair. Model-free (the
  * shape is carried by the arrays), so persisted codes and LUTs from any
  * codebook pair correctly. NULL when |lut| is not a multiple of |codes| or
  * either is empty — mismatched artifacts surface instead of scoring
  * garbage. */
final case class PqAdcScore(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(ByteType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val n = lut.numElements()
    if (m == 0 || n == 0 || n % m != 0) return null
    val k = n / m
    var sum = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getByte(s) & 0xFF
      if (c >= k) return null // code outside this LUT's codebook
      sum += lut.getFloat(s * k + c)
      s += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $a.numElements();
         |int $n = $b.numElements();
         |if ($m == 0 || $n == 0 || $n % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = $n / $m;
         |  double $sum = 0.0;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $c = $a.getByte($s) & 0xFF;
         |    if ($c >= $k) { $bad = true; break; }
         |    $sum += (double) $b.getFloat($s * $k + $c);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqExpressions {
  /** Codegen'd PQ encode: array<tinyint> codes (length m). */
  def encodeNative(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), codebooks))

  /** Codegen'd per-query ADC lookup table: flat array<float> of m·k. */
  def lookupTableNative(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqLookupTable(GraftBridge.expression(vec), codebooks))

  /** Codegen'd ADC score: Σ_s lut[s·k + codes[s]]. */
  def adcScoreNative(codes: Column, lut: Column): Column =
    GraftBridge.column(PqAdcScore(
      GraftBridge.expression(codes), GraftBridge.expression(lut)))
}
