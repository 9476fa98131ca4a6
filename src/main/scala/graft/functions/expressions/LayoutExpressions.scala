package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types._

/** Hilbert curve index of two `order`-bit coordinates — the codegen'd
  * kernel behind [[graft.sources.ZOrder.hilbert2]]. The first cut built
  * the standard quadrant-rotate recurrence as an unrolled Column ladder;
  * because each level's (x, y) references BOTH prior coordinates the
  * expression tree grows ~3^order nodes, and at order 8 the serialized
  * plan hit a 200 MiB task binary with multi-minute analysis. The
  * transform is a 10-line integer LOOP — exactly the shape a native
  * expression keeps as a loop and whole-stage codegen inlines as one. */
final case class HilbertIndex(left: Expression, right: Expression,
                              order: Int)
  extends BinaryExpression with ExpectsInputTypes {
  require(order >= 1 && order <= 31, s"order must be in [1,31] (got $order)")

  // (return type inferred — Seq[AbstractDataType] is private[sql])
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.HilbertIndex.compute($a, $b, $order)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Standard xy→d (quadrant accumulate + rotate); coordinates are
    * masked to `order` bits. Called from generated code. */
  def compute(aIn: Long, bIn: Long, order: Int): Long = {
    val mask = (1L << order) - 1L
    var x = aIn & mask
    var y = bIn & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertNative(a: Column, b: Column, order: Int): Column =
    GraftBridge.column(HilbertIndex(
      GraftBridge.expression(a.cast("long")),
      GraftBridge.expression(b.cast("long")), order))
}
