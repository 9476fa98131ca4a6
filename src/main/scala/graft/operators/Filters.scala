package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-pushed filters (SURVEY §2.2).
  *
  * The reference pushes a MongoDB `$match` aggregation pipeline into the
  * change stream so predicates run server-side
  * (rigatoni-core/src/stream.rs:909-917). The Spark-native equivalent is a
  * plain `filter` on the declarative plan: Catalyst's PushDownPredicates
  * moves it into the parquet scan (visible as PushedFilters in explain), so
  * the same "filter at the source" property holds without custom code.
  */
object Filters {

  /** F1 — operation-type `$in` match (change_stream_listener.rs:154-171). */
  def byOperations(df: DataFrame, ops: Seq[String],
                   opCol: String = "operation"): DataFrame =
    df.filter(col(opCol).isin(ops: _*))

  /** F1 — field predicate against the schemaless JSON document body
    * (`fullDocument.priority >= 5` style). `get_json_object` stays inside
    * whole-stage codegen; for hot paths parse once with `from_json`.
    */
  def byJsonField(df: DataFrame, docCol: String, jsonPath: String,
                  pred: Column => Column): DataFrame =
    df.filter(pred(get_json_object(col(docCol), jsonPath)))

  /** F3 — invalidate handling (stream.rs:1211-1220): the reference tears the
    * stream down on `invalidate`; in batch/bounded form that is a split of
    * the flow into (live events, invalidation markers). An EXACT partition:
    * a NULL operation is not an invalidate op, so it goes to the live side
    * (a bare `!isin` would evaluate to NULL and drop the row from BOTH
    * halves — rows would vanish from the flow).
    */
  def splitInvalidate(df: DataFrame, invalidateOps: Seq[String],
                      opCol: String = "operation"): (DataFrame, DataFrame) = {
    val isInvalidate = coalesce(col(opCol).isin(invalidateOps: _*), lit(false))
    (df.filter(!isInvalidate), df.filter(isInvalidate))
  }
}
