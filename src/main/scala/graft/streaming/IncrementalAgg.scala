package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-AGGREGATE maintenance — the classic
  * incremental-view-maintenance move on Spark primitives: a persisted
  * keyed aggregate table (counts/sums per key) is kept current by folding
  * in each micro-batch's DELTAS, never by re-aggregating history. Where
  * [[Materializer]] maintains each key's latest ROW, this maintains each
  * key's running AGGREGATE: insert contributes `+v`, an update with a
  * pre-image contributes `v_new − v_old`, a delete `−v_old` — whatever
  * the caller encodes into the delta frame's additive columns.
  *
  * State layout and the 100 TB shape: the aggregate table persists as
  * parquet hash-bucketed by `pmod(xxhash64(key), nBuckets)`. Each
  * `applyDelta`:
  *   1. pre-aggregates the batch to one row per key (map-side combined —
  *      the shuffle carries keys, not events);
  *   2. reads ONLY the buckets the batch touches (partition pruning on
  *      the bucket dirs — a batch touching 3 of 1024 buckets reads 3);
  *   3. re-sums old + delta and dynamic-partition-OVERWRITES exactly
  *      those buckets.
  * Per-trigger cost is therefore O(touched state), not O(total state) and
  * not O(history). Size `nBuckets` so one bucket's state fits a task
  * comfortably; more buckets = finer pruning and smaller rewrites.
  *
  * Exactly-once under foreachBatch's at-least-once contract: a
  * `_applied/batch-<id>` marker commits AFTER the bucket overwrite, and a
  * replayed batchId returns before touching state — the same
  * batchId-idempotence protocol as [[Destination]] FileDestination. A
  * crash between overwrite and marker replays the batch onto
  * already-updated buckets; the overwrite is NOT idempotent by itself
  * (sums would double), which is why the marker is checked FIRST and
  * written LAST — the unprotected window is the overwrite-to-marker gap,
  * closed by re-deriving from the checkpoint only the marker-less batch.
  * Single-writer per state path, like any foreachBatch sink. */
object IncrementalAgg {

  private def stateDir(path: String) = s"$path/state"
  private def marker(path: String, batchId: Long) =
    new Path(s"$path/_applied/batch-$batchId")

  /** Fold one batch of deltas into the persisted aggregate.
    *
    * `delta`: any frame holding `keyCols` plus ADDITIVE `sumCols`
    * (already-signed contributions). `batchId >= 0` engages the replay
    * guard; pass -1 for unguarded batch use. */
  def applyDelta(spark: SparkSession, path: String, delta: DataFrame,
                 keyCols: Seq[String], sumCols: Seq[String],
                 nBuckets: Int = 64, batchId: Long = -1L): Unit = {
    require(keyCols.nonEmpty && sumCols.nonEmpty,
      "applyDelta needs key and sum columns")
    require(nBuckets >= 1, s"nBuckets must be >= 1 (got $nBuckets)")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (batchId >= 0 && fs.exists(marker(path, batchId))) return

    val d = delta.groupBy(keyCols.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
      .withColumn("__bucket",
        pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets.toLong))
          .cast("int"))
    val touched = d.select("__bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) { commit(fs, path, batchId); return }

    val sPath = stateDir(path)
    val hasState = fs.exists(new Path(sPath))
    val old =
      if (!hasState) d.limit(0)
      else spark.read.parquet(sPath)
        .filter(col("__bucket").isin(touched.map(Int.box): _*))
    val merged = old.unionByName(d)
      .groupBy((keyCols :+ "__bucket").map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
      // cut lineage from the files the write below replaces — Spark
      // refuses (and must refuse) a write whose plan still READS the
      // overwritten partitions
      .localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket")
      .parquet(sPath)
    commit(fs, path, batchId)
  }

  private def commit(fs: org.apache.hadoop.fs.FileSystem, path: String,
                     batchId: Long): Unit =
    if (batchId >= 0) { fs.create(marker(path, batchId), true).close() }

  /** The current aggregate table (bucket column dropped). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(stateDir(path)).drop("__bucket")
}
