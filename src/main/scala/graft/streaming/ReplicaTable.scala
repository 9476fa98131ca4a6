package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted CDC REPLICA maintenance — "apply the change stream to a
  * table": each key's row in the parquet state reflects its LATEST
  * upstream version, and a key whose newest operation is delete-class is
  * ABSENT. This is the durable sibling of [[Materializer]] (whose state
  * lives in the streaming state store and whose output is a changelog):
  * here the replica itself is the artifact — a queryable parquet table
  * any engine can scan — which is what "sync Mongo to the lake" means in
  * practice, and the one thing the reference's file sink leaves to its
  * downstream consumers (rigatoni dumps event FILES; consumers must
  * re-derive current state per query).
  *
  * Same state layout and batch protocol as [[IncrementalAgg]], different
  * merge semantics: hash-bucketed parquet keyed by `keyCols`, each batch
  *   1. reduces to its newest row per key (one keyed aggregate — ties and
  *      ordering decided by `versionCols`, compared lexicographically as
  *      a struct);
  *   2. reads ONLY the touched buckets, keeps the per-key max of
  *      (old row, batch row) — last-writer-wins across restarts and
  *      out-of-order batches;
  *   3. drops keys whose winning row is delete-class, and dynamically
  *      overwrites exactly the touched buckets.
  * Exactly-once via the checked-first/written-last `_applied/batch-<id>`
  * marker, as in [[IncrementalAgg]]. Per-trigger cost O(touched state).
  *
  * A delete arriving BEFORE its insert (out-of-order feed) wins if its
  * version is newer — the tombstone persists as absence only when the
  * winning version is the delete; an older delete cannot resurrect or
  * suppress a newer row, matching [[Materializer]]'s tombstone rule. The
  * one divergence from an infinite-retention changelog: a tombstoned
  * key's absence carries no version, so a LATE row older than the delete
  * would re-insert if it arrives in a later batch after the delete's
  * batch already landed. Closing that needs retained tombstones;
  * `tombstoneRetention` keeps delete markers as hidden rows for exactly
  * that window (0 = drop immediately, the compact default). */
object ReplicaTable {

  private def stateDir(path: String) = s"$path/state"
  private def marker(path: String, batchId: Long) =
    new Path(s"$path/_applied/batch-$batchId")
  private val TombstoneCol = "__tombstone"

  /** Fold one batch of CDC rows into the replica.
    *
    * `deleteWhen` marks delete-class rows; `versionCols` order versions
    * (newest wins; make the tuple total, e.g. event time + event id).
    * `tombstones = true` retains delete markers (hidden from [[read]])
    * so late rows older than a delete stay dead across batches. */
  def applyBatch(spark: SparkSession, path: String, batch: DataFrame,
                 keyCols: Seq[String], versionCols: Seq[String],
                 deleteWhen: Column, nBuckets: Int = 64,
                 batchId: Long = -1L, tombstones: Boolean = true): Unit = {
    require(keyCols.nonEmpty && versionCols.nonEmpty,
      "applyBatch needs key and version columns")
    require(nBuckets >= 1, s"nBuckets must be >= 1 (got $nBuckets)")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (batchId >= 0 && fs.exists(marker(path, batchId))) return

    val tagged = batch.withColumn(TombstoneCol, deleteWhen)
    val dataCols = tagged.columns.filterNot(keyCols.contains)
    // newest row per key within the batch: one keyed max over
    // struct(version..., payload...) — struct ordering is lexicographic
    // on the version prefix, so the payload tail never decides a winner
    // between distinct versions
    def reduceLatest(df: DataFrame): DataFrame =
      df.groupBy(keyCols.map(col): _*)
        .agg(max(struct((versionCols ++
          dataCols.filterNot(versionCols.contains)).map(col): _*))
          .as("__row"))
        .select(keyCols.map(col) :+ col("__row.*"): _*)
    val d = reduceLatest(tagged)
      .withColumn("__bucket",
        pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets.toLong))
          .cast("int"))
    val touched = d.select("__bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) { commit(fs, path, batchId); return }

    val sPath = stateDir(path)
    // schema sidecar (DDL text), written once: the replica can
    // legitimately become EMPTY (every key deleted), and a parquet dir
    // with no data files cannot answer "what is the table's schema" on
    // read — an empty-frame parquet write leaves no files either
    val schemaPath = new Path(s"$path/_schema.ddl")
    if (!fs.exists(schemaPath)) {
      val out = fs.create(schemaPath, true)
      out.write(d.schema.toDDL.getBytes("UTF-8"))
      out.close()
    }
    // "state exists" = at least one bucket dir: a fully-emptied replica
    // leaves sPath with only _SUCCESS, which parquet cannot infer from
    val hasState = fs.exists(new Path(sPath)) &&
      fs.listStatus(new Path(sPath)).exists(st =>
        st.isDirectory && st.getPath.getName.startsWith("__bucket="))
    val old =
      if (!hasState) d.limit(0)
      else spark.read.parquet(sPath)
        .filter(col("__bucket").isin(touched.map(Int.box): _*))
    val merged = reduceLatest(old.unionByName(d))
      .withColumn("__bucket",
        pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets.toLong))
          .cast("int"))
    val kept = (
      if (tombstones) merged else merged.filter(!col(TombstoneCol)))
      .localCheckpoint()
    kept.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket")
      .parquet(sPath)
    // dynamic overwrite replaces only partitions PRESENT in the written
    // frame — a touched bucket whose every row was dropped writes
    // nothing and would silently keep its stale rows. Clear emptied
    // buckets explicitly (only the tombstones=false path can empty one:
    // retained tombstones never shrink a bucket to zero).
    val keptBuckets = kept.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    touched.filterNot(keptBuckets).foreach { b =>
      fs.delete(new Path(s"$sPath/__bucket=$b"), true)
    }
    commit(fs, path, batchId)
  }

  private def commit(fs: org.apache.hadoop.fs.FileSystem, path: String,
                     batchId: Long): Unit =
    if (batchId >= 0) { fs.create(marker(path, batchId), true).close() }

  /** The current replica (tombstoned keys absent, bookkeeping dropped).
    * An all-deleted replica reads as an empty frame with the table's
    * schema (from the `_schema` sidecar), not an error. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val sPath = stateDir(path)
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(new Path(sPath)) &&
      fs.listStatus(new Path(sPath)).exists(st =>
        st.isDirectory && st.getPath.getName.startsWith("__bucket="))
    val base =
      if (hasData) spark.read.parquet(sPath)
      else {
        val in = fs.open(new Path(s"$path/_schema.ddl"))
        val ddl = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        in.close()
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(ddl))
      }
    base.filter(!col(TombstoneCol)).drop(TombstoneCol, "__bucket")
  }
}
