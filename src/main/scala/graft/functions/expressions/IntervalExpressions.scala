package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Runtime kernel for interval lookup — binary search over a sorted,
  * non-overlapping interval table riding the plan as reference arrays.
  * The classic "point-in-interval dimension join" (IP range → geo,
  * value → price band, timestamp → release window) WITHOUT a join
  * operator: the interval table is model-sized, so the lookup belongs
  * inside the fact scan as an O(log n) expression — zero fact-side
  * movement, zero per-task build-side hashing, and the fact stream stays
  * in whole-stage codegen. A BroadcastHashJoin cannot express a range
  * predicate (it hashes equi-keys); Spark's generic fallback is a
  * BroadcastNestedLoopJoin — O(intervals) per row and a codegen break —
  * which is exactly what this kernel replaces. */
object IntervalRuntime {

  /** Index of the interval containing `v` under [lo, hi) semantics, or
    * -1. `los` sorted ascending, intervals non-overlapping. */
  def find(v: Double, los: Array[Double], his: Array[Double]): Int = {
    var lo = 0
    var hi = los.length - 1
    var best = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (los(mid) <= v) { best = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (best >= 0 && v < his(best)) best else -1
  }
}

/** Index of the [lo, hi) interval containing the value (-1 when none) —
  * the join-free core; callers compose labels/payloads with built-in
  * `element_at` over a literal array, which keeps everything inside
  * whole-stage codegen. */
final case class IntervalIndex(child: Expression, los: Array[Double],
                               his: Array[Double])
  extends UnaryExpression with ExpectsInputTypes {

  require(los.length == his.length, "interval bound arrays must align")

  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "interval_index"

  override def nullSafeEval(v: Any): Any =
    IntervalRuntime.find(v.asInstanceOf[Double], los, his)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val lo = ctx.addReferenceObj("ivLos", los, "double[]")
      val hi = ctx.addReferenceObj("ivHis", his, "double[]")
      s"${ev.value} = graft.functions.expressions.IntervalRuntime" +
        s".find($x, $lo, $hi);"
    })

  override protected def withNewChildInternal(newChild: Expression): IntervalIndex =
    copy(child = newChild)
}

object IntervalExpressions {

  /** 0-based interval index of `value` (-1 miss), after validating the
    * binary-search invariants (sorted by lo, non-overlapping, lo < hi).
    * Returns the index column and the lo-sorted interval order. */
  def indexFor[P](value: Column, intervals: Seq[(Double, Double, P)])
      : (Column, Seq[(Double, Double, P)]) = {
    require(intervals.nonEmpty, "empty interval table")
    val sorted = intervals.sortBy(_._1)
    sorted.foreach { case (lo, hi, _) =>
      require(lo < hi, s"inverted interval [$lo, $hi)") }
    sorted.sliding(2).foreach {
      case Seq((_, h1, _), (l2, _, _)) =>
        require(h1 <= l2, s"overlapping intervals at $h1 > $l2")
      case _ => ()
    }
    val col = GraftBridge.column(IntervalIndex(GraftBridge.expression(value),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray))
    (col, sorted)
  }

  /** Label of the [lo, hi) interval containing `value`, NULL when none —
    * the left-join semantics of a point-in-interval dimension join, as
    * one scan-local codegen'd expression. */
  def labelFor(value: Column, intervals: Seq[(Double, Double, String)]): Column = {
    val (idx, sorted) = indexFor(value, intervals)
    when(idx >= 0,
      element_at(array(sorted.map(t => lit(t._3)): _*), idx + 1))
  }
}
