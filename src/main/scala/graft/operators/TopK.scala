package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
import org.apache.spark.sql.functions._

/** Grouped top-k as a bounded-heap AGGREGATE instead of a window sort.
  *
  * The idiomatic formulation — `row_number() over (partition by g order by
  * v desc) <= k` — shuffles every row of every group and sorts each
  * partition (Spark 4's `WindowGroupLimit` trims rows below rank k before
  * the exchange, but only after a full LOCAL sort of each map partition).
  * Both shapes shuffle the same trimmed volume (≤ k rows per group per
  * map partition); what the aggregate removes is the SORTS — each map
  * task keeps one k-bounded priority queue per group (O(n log k) scan
  * with no local sort, where the window plan sorts every map partition
  * AND every reduce partition), and the reduce side merges heaps. At
  * sf0.1 the sorts are cheap and the window form actually measures
  * slightly faster (see BENCH_NOTES); the heap form's O(n log k) vs
  * O(n log n) gap is a fact-table-scale property, and the aggregate
  * additionally composes where windows cannot (inside other
  * aggregations, `collect_top_k` from SQL).
  *
  * Implementation is Spark-first composition: the engine already ships the
  * exact aggregate this needs — `CollectTopK`, a `TypedImperativeAggregate`
  * over a `BoundedPriorityQueue` (catalyst `collect.scala`; the kernel
  * under pandas-on-Spark's `nlargest`). It is public but has no SQL or
  * Column surface, so this operator (and the `collect_top_k` SQL function
  * in [[graft.GraftExtensions]]) is the missing front-end, not a re-built
  * kernel. Runs under `ObjectHashAggregate` with map-side partial
  * aggregation; with more than
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * groups per task it degrades to sort-based aggregation — still partial,
  * still k-bounded per group, so the scale contract survives skew in the
  * group count.
  *
  * Ordering contract: items are compared as structs, field by field, and
  * the LARGEST k under that ordering are kept, emitted rank 1 = largest.
  * Callers make the order total by putting a unique id after the ranking
  * value (ties then break toward the larger id); negate a field to rank
  * ascending. `payload` columns ride BEHIND the ordering fields in the
  * struct, so they never influence comparisons once the tiebreak id has
  * decided.
  */
object TopK {

  /** One output row per kept item: `groupCols ++ [rank] ++ ordCols ++
    * payload`, rank 1..k descending in the struct ordering of
    * `ordCols ++ payload`. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   ordCols: Seq[Column], payload: Seq[Column] = Nil,
                   k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(ordCols.nonEmpty, "need at least one ordering column")
    // the output adds a synthesized `rank`; reject group keys or struct
    // fields with that name up front — the alternative is two ambiguous
    // `rank` columns that only explode downstream at analysis time
    def named(c: Column): Option[String] =
      GraftBridge.expression(c) match {
        case ne: org.apache.spark.sql.catalyst.expressions.NamedExpression =>
          Some(ne.name)
        case _ => None
      }
    val fieldNames = (ordCols ++ payload).flatMap(named)
    require(!(groupCols ++ fieldNames).contains("rank"),
      "no group column or ordering/payload field may be named 'rank' " +
        "(the operator synthesizes that column)")
    val item = struct(ordCols ++ payload: _*)
    // `new`, not apply: the companion carrying `apply` is
    // `private[aggregate]` in Spark 4.1; the class itself is public
    val topk = GraftBridge.column(
      new CollectTopK(GraftBridge.expression(item), k, false, 0, 0)
        .toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(topk.as("__graft_top"))
      // collision-proof internal names: posexplode's default `pos`/`col`
      // output names would shadow same-named user columns
      .select(groupCols.map(col) :+
        posexplode(col("__graft_top")).as(Seq("__graft_pos", "__graft_item")): _*)
      .withColumn("rank", (col("__graft_pos") + 1).cast("int"))
      .select(groupCols.map(col) ++ Seq(col("rank")) :+ col("__graft_item.*"): _*)
  }
}
