package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-static enrichment joins (SURVEY §2.5).
  *
  * The reference performs no joins (the closest thing is Mongo's server-side
  * UpdateLookup, stream.rs:583-586); enrichment of a CDC stream against
  * dimension tables is the natural extension the build plan includes. The
  * dimension side is small by construction, so we broadcast it explicitly —
  * on a 1000-executor cluster that turns a shuffle join of the 100 TB fact
  * stream into a map-side hash join with zero fact-side movement.
  */
object Enrichment {

  /** events ⋈ dimension on an equi-key, dimension broadcast. */
  def enrich(events: DataFrame, dim: DataFrame, joinExpr: Column,
             joinType: String = "inner"): DataFrame =
    events.join(broadcast(dim), joinExpr, joinType)

  /** Keyed enrichment where both sides share the column name. */
  def enrichOn(events: DataFrame, dim: DataFrame, key: String,
               joinType: String = "inner"): DataFrame =
    events.join(broadcast(dim), Seq(key), joinType)

  /** Point-in-interval enrichment WITHOUT a join operator — the IP→geo /
    * value→band / time→release-window pattern: the (model-sized) interval
    * table rides the plan as reference arrays and each fact row pays one
    * O(log n) binary search INSIDE the scan's codegen. The join-operator
    * alternative for a range predicate is a BroadcastNestedLoopJoin —
    * O(intervals) per row, breaks whole-stage codegen, and shows up in
    * every plan audit as the thing to avoid. Left-join semantics: rows
    * outside every interval get a NULL label. Intervals are [lo, hi),
    * validated sorted and non-overlapping. */
  def enrichByInterval(events: DataFrame, valueCol: String,
                       intervals: Seq[(Double, Double, String)],
                       outCol: String = "band"): DataFrame =
    events.withColumn(outCol,
      graft.functions.expressions.IntervalExpressions
        .labelFor(col(valueCol).cast("double"), intervals))
}
