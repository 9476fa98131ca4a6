package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-assembly / grouping operators (SURVEY §2.4).
  *
  * The reference has no value aggregations; its "aggregation layer" is batch
  * assembly: flush every N events (pipeline.rs:1247-1264) or every T seconds
  * (pipeline.rs:1200-1219), group the flushed batch by collection
  * (s3/destination.rs:537-546), count per operation type for metrics
  * (pipeline.rs:1765-1772), and optionally dedup within a batch
  * (rigatoni-benches batch_deduplication). In Spark, count/time batching is
  * trigger sizing on the micro-batch engine; expressed over a bounded table
  * they become window/group aggregates, which is how the oracle verifies
  * them.
  */
object Batching {

  /** Deterministic sum of a double column: route the accumulation through
    * DECIMAL(38,s) so result is independent of partition/merge order, then
    * one cast back. Shared by every catalog aggregate (oracle hash-compare
    * needs bit-stable sums). */
  def dsum(c: org.apache.spark.sql.Column, scale: Int = 4): org.apache.spark.sql.Column =
    sum(c.cast(s"decimal(38,$scale)")).cast("double")

  /** A2 — time-window batching: tumbling event-time windows over
    * cluster_time. In streaming form this is exactly
    * `groupBy(window($"cluster_time", size))`; bounded form is identical
    * (Structured Streaming batch/stream unification). */
  def timeWindows(df: DataFrame, windowSize: String = "1 hour",
                  tsCol: String = "cluster_time"): DataFrame =
    df.groupBy(window(col(tsCol), windowSize).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("n_events"), col("sum_value"))

  /** A1 — count-based batching: assign batch ids of at most `batchSize`
    * events in (cluster_time, tie) order. In streaming this is trigger
    * admission (maxFilesPerTrigger — see streaming.CdcPipeline); the
    * bounded form here computes the SAME global ordinal scalably in two
    * phases instead of one single-partition window:
    *
    *   1. row_number keyed by a coarse time bucket (day) — a keyed window,
    *      parallel across buckets;
    *   2. cumulative offsets of per-bucket counts — a bucket-cardinality
    *      aggregate (days, not events) whose prefix sum is itself a tiny
    *      window, broadcast-joined back.
    *
    * global ordinal = bucket offset + within-bucket row number. The only
    * single-partition step scales with the NUMBER OF DAYS, so the plan
    * survives 100 TB of events; results are identical to the naive global
    * `row_number` (the DuckDB oracle for cdc_batch_count IS the naive
    * form). */
  def countBatches(df: DataFrame, batchSize: Int,
                   tsCol: String = "cluster_time",
                   tieCol: String = "event_id"): DataFrame = {
    // NULL timestamps sort first under the naive global row_number (nulls
    // first ascending), so give them their own FIRST bucket instead of
    // letting a null bucket key vanish through the offset equi-join (NULL
    // never equals NULL — the rows would silently drop from the output)
    val bucket = coalesce(date_trunc("day", col(tsCol)),
      lit("0001-01-01 00:00:00").cast("timestamp"))
    val wInBucket = Window.partitionBy(bucket).orderBy(
      col(tsCol).asc_nulls_first, col(tieCol))
    val numbered = df.withColumn("__bucket", bucket)
      .withColumn("__rn", row_number().over(wInBucket))
    val wBuckets = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = df.groupBy(bucket.as("__bucket"))
      .agg(count(lit(1)).as("__n"))
      .select(col("__bucket"),
        coalesce(sum(col("__n")).over(wBuckets), lit(0L)).as("__offset"))
    numbered
      .join(broadcast(offsets), "__bucket")
      .withColumn("batch_id",
        ((col("__offset") + col("__rn") - 1) / batchSize).cast("long"))
      .drop("__bucket", "__rn", "__offset")
  }

  /** A4 — group-by-collection (one output group per collection per flush). */
  def groupByCollection(df: DataFrame): DataFrame =
    df.groupBy(col("collection"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("cluster_time")).as("first_time"),
        max(col("cluster_time")).as("last_time"),
        dsum(col("value")).as("sum_value"))

  /** A5 — per-operation-type counts (the flush metrics aggregate). */
  def perOpCounts(df: DataFrame): DataFrame =
    df.groupBy(col("operation")).agg(count(lit(1)).as("n_events"))

  /** A6 — deterministic within-batch dedup: keep the LATEST event per
    * document key (ties broken by event_id), the exactly-once mitigation the
    * reference benchmarks. Uses a keyed window, so it shuffles once on the
    * dedup key and scales out; no global ordering needed. */
  def dedupLatestByKey(df: DataFrame, keyCols: Seq[String],
                       tsCol: String = "cluster_time",
                       tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
