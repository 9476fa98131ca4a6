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
}
