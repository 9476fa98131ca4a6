package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — min/max skipping indexes over a parquet layout
  * for columns the PARTITIONING doesn't cover: a manifest table with one
  * row per data file holding each indexed column's (min, max, null
  * count), and a reader that intersects a predicate with the manifest to
  * scan only the files that can match. This is the light-weight
  * secondary-index tier between "partition pruning" (needs the column in
  * the layout) and "read everything and let row-group stats help":
  * row-group stats only prune AFTER a task has opened the file; the
  * manifest prunes the FILE LIST at plan time — at 100 TB that is the
  * difference between launching 800k tasks and launching the 2k whose
  * files can match. Works best over a clustered layout (ZOrder/sorted
  * writes) where value ranges per file are tight; on a random layout
  * every file's range spans everything and nothing prunes (the manifest
  * tells you that too — `widthShare` diagnoses it).
  *
  * The manifest is SHARDED BY PARTITION DIRECTORY (`part_dir`, the data
  * file's leaf directory relative to the layout root): `_zonemap` is
  * itself a partitioned parquet table, so (a) maintenance — a sink
  * appending a batch dir, [[update]] reaping a replayed batch,
  * [[Compaction.compact]] rewriting a fragmented leaf — rewrites only the
  * affected shards via dynamic partition overwrite, never the whole
  * manifest, and (b) reads that carry a partition hint prune manifest
  * shards before touching a single zone row. [[prunedRead]] intersects
  * per shard: each driver-side file-list collect is bounded by one
  * partition's candidates, not the layout's.
  *
  * Build cost: ONE distributed pass over the layout (input_file_name()
  * grouping — a partial-aggregated groupBy; no footer round-trips, no
  * driver-side file loop). The manifest is layout-sized (rows = files).
  */
object ZoneMap {

  /** What [[update]] did: `added` = newly indexed files, `reaped` =
    * manifest rows dropped because their files vanished (a replayed batch
    * directory was overwritten, or a compaction rewrote the layout). */
  final case class UpdateDelta(added: Long, reaped: Long)

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) =
    Manifests.fsFor(spark, path)

  private def partDirCol(rootAbs: String): Column =
    Manifests.partDirCol(rootAbs)

  /** Types whose per-file SUM is recorded in the manifest: exactly the
    * types where re-aggregating file sums is bit-identical to summing the
    * rows in any order — integral types (long arithmetic is associative,
    * wraparound included) and decimals (exact arithmetic; the widened
    * re-aggregate casts back losslessly or overflows exactly where the
    * direct sum would). Float/double sums are order-dependent and are
    * deliberately NOT recorded — [[graft.plans.RewriteToMetaAggregate]]
    * refuses them, and a manifest column would only invite wrong serving. */
  private[graft] def sumable(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _: org.apache.spark.sql.types.DecimalType => true
      case _ => false
    }

  private def statsFor(df: DataFrame, cols: Seq[String],
                       rootAbs: String): DataFrame = {
    require(cols.nonEmpty, "zone map needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +:
      cols.flatMap { c =>
        Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
          (count(lit(1)) - count(col(c))).as(s"${c}_nulls")) ++
          (if (types.get(c).exists(sumable))
             Seq(sum(col(c)).as(s"${c}_sum"))
           else Nil)
      }
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("part_dir", partDirCol(rootAbs))
  }

  /** One pass: per data file, per indexed column — min/max/null count.
    * Wide-format manifest: `file, n_rows, <c>_min, <c>_max, <c>_nulls,
    * part_dir` (the shard key). */
  def build(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val (_, root) = fsFor(spark, path)
    statsFor(spark.read.parquet(path), cols, root.toUri.getPath)
  }

  /** The indexed column names, recovered from a manifest's schema — how
    * [[Compaction]] maintains (and [[graft.plans.GraftCatalog]]
    * self-describes) a zone map it didn't build. */
  private[graft] def manifestCols(spark: SparkSession,
                                  path: String): Seq[String] = {
    val fields = spark.read.parquet(s"$path/_zonemap").schema.fieldNames
    fields.filter(_.endsWith("_min")).map(_.stripSuffix("_min")).toSeq
  }

  private[graft] def manifestExists(spark: SparkSession,
                                    path: String): Boolean = {
    val (fs, root) = fsFor(spark, path)
    fs.exists(new Path(root, "_zonemap"))
  }

  /** Incremental manifest maintenance — the per-micro-batch call for a
    * streaming sink: index ONLY files the manifest doesn't know yet
    * (identified by basename — part files carry a UUID), scanning just
    * those files, and REAP rows whose files no longer exist (a replayed
    * batch directory was overwritten under the same batchId, or a
    * compaction rewrote a leaf — either way the old part files are gone
    * and their zones must not surface as candidates). Cost per call is
    * O(new files) scan + a rewrite of only the AFFECTED manifest shards
    * (dynamic partition overwrite on `part_dir`); untouched shards are
    * never rewritten and the layout is never rescanned. The layout
    * listing is driver-side metadata. Indexed columns must be DATA
    * columns (reading a file set directly sees no Hive partition values —
    * partition columns already have partition pruning). */
  def update(spark: SparkSession, path: String,
             cols: Seq[String]): UpdateDelta = {
    val (fs, root) = fsFor(spark, path)
    val rootAbs = root.toUri.getPath
    // SCHEMA-DRIFT guard: a manifest written before a stats-schema change
    // (e.g. the per-file `<c>_sum` columns) cannot be extended
    // incrementally — a union would throw on the reap path and a plain
    // append would leave a SILENT mixed-schema manifest whose reader
    // drops the old files' sums. Rebuild the whole manifest once instead
    // (one distributed pass, the build cost) and return it as all-added.
    if (manifestExists(spark, path) &&
        !schemaMatches(spark, path, cols)) {
      write(spark, path, cols, updateCatalog = false)
      val n = Manifests.listDataFiles(fs, root).length.toLong
      return UpdateDelta(n, 0L)
    }
    val (added, reaped) = Manifests.incrementalUpdate(spark, path, "_zonemap",
      fresh => statsFor(
        spark.read.parquet(fresh.map(_.toString): _*), cols, rootAbs))
    UpdateDelta(added, reaped)
  }

  /** Does the on-disk manifest carry exactly the statistic columns
    * [[statsFor]] would emit today for `cols` over this layout? */
  private def schemaMatches(spark: SparkSession, path: String,
                            cols: Seq[String]): Boolean = {
    // a layout with ZERO data files left (full retention wipe) cannot
    // answer a schema read — and needs no stats schema either: nothing
    // fresh will be indexed, the reap path never unions fresh stats
    val types =
      try spark.read.parquet(path).schema.fields
        .map(f => f.name -> f.dataType).toMap
      catch { case _: org.apache.spark.sql.AnalysisException => return true }
    val expected: Set[String] = Set("file", "n_rows", "part_dir") ++
      cols.flatMap { c =>
        Seq(s"${c}_min", s"${c}_max", s"${c}_nulls") ++
          (if (types.get(c).exists(sumable)) Seq(s"${c}_sum") else Nil)
      }
    spark.read.parquet(s"$path/_zonemap")
      .schema.fieldNames.toSet == expected
  }

  /** Persist the manifest next to the data (full rebuild, overwrite),
    * then SELF-DESCRIBE the layout in `_graft_catalog.json` beside the
    * data ([[graft.plans.GraftCatalog.selfDescribe]] — the
    * `FileDestination` discipline on the batch path): a fresh session's
    * plain range query prunes with zero setup. `updateCatalog = false`
    * opts out. */
  def write(spark: SparkSession, path: String, cols: Seq[String],
            updateCatalog: Boolean = true): Unit = {
    build(spark, path, cols).coalesce(1)
      .write.mode("overwrite").partitionBy("part_dir")
      .parquet(s"$path/_zonemap")
    Manifests.bumpManifestVersion(path, "_zonemap")
    if (updateCatalog) graft.plans.GraftCatalog.selfDescribe(spark, path)
  }

  /** Rewrite the manifest shards for `dirs` (leaf directories relative to
    * the root) from the files currently on disk — [[Compaction]]'s hook:
    * it knows exactly which leaves it rewrote, so the zone map follows
    * the rewrite at O(rewritten dirs), never a full rebuild. */
  private[sources] def refreshShards(spark: SparkSession, path: String,
                                     dirs: Seq[String]): Unit = {
    if (dirs.isEmpty || !manifestExists(spark, path)) return
    val cols = manifestCols(spark, path)
    // same schema-drift guard as [[update]]: a per-shard overwrite onto a
    // pre-drift manifest would leave shards with DIFFERENT schemas (the
    // reader then silently drops whichever columns its sampled footer
    // lacks) — rebuild wholesale instead
    if (!schemaMatches(spark, path, cols)) {
      write(spark, path, cols, updateCatalog = false)
      return
    }
    val (_, root) = fsFor(spark, path)
    val rootAbs = root.toUri.getPath
    val abs = dirs.map(d =>
      if (d == ".") root.toString else new Path(root, d).toString)
    statsFor(spark.read.parquet(abs: _*), cols, rootAbs)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("part_dir")
      .parquet(s"$path/_zonemap")
    Manifests.bumpManifestVersion(path, "_zonemap")
  }

  /** Files whose zone intersects `[lo, hi]` on `c` (inclusive). A file
    * with an all-NULL zone for `c` never matches a range predicate.
    * `parts` restricts the intersect to those manifest shards (partition
    * pruning on the manifest read — supply it when the predicate is known
    * to live in specific partition directories). */
  def candidateFiles(spark: SparkSession, path: String, c: String,
                     lo: Any, hi: Any,
                     parts: Seq[String] = Nil): Seq[String] = {
    val m = zoneFilter(spark, path, c, lo, hi, parts)
    m.select("file").collect().map(_.getString(0)).toSeq
  }

  /** Candidate files for an OPTIONALLY-OPEN interval (None = unbounded
    * on that side) — the probe leg of the
    * [[graft.plans.RewriteToBloomPrunedJoin]] optimizer rule's range
    * case. Files whose zone cells are all-NULL never match a range
    * predicate (range comparisons are null-rejecting), so the
    * min-isNotNull guard is exact. */
  private[graft] def candidateFilesBounded(spark: SparkSession,
                                           path: String, c: String,
                                           lo: Option[Any], hi: Option[Any],
                                           parts: Seq[String] = Nil)
      : Seq[String] = {
    val m = spark.read.parquet(s"$path/_zonemap")
    val sharded =
      if (parts.isEmpty) m else m.filter(col("part_dir").isin(parts: _*))
    val loC = lo.map(v => col(s"${c}_max") >= lit(v)).getOrElse(lit(true))
    val hiC = hi.map(v => col(s"${c}_min") <= lit(v)).getOrElse(lit(true))
    sharded.filter(col(s"${c}_min").isNotNull && loC && hiC)
      .select("part_dir", "file").sort("part_dir", "file")
      .collect().map(_.getString(1)).toSeq
  }

  private def zoneFilter(spark: SparkSession, path: String, c: String,
                         lo: Any, hi: Any, parts: Seq[String]): DataFrame = {
    val m = spark.read.parquet(s"$path/_zonemap")
    val sharded = if (parts.isEmpty) m else m.filter(col("part_dir").isin(parts: _*))
    sharded.filter(col(s"${c}_min").isNotNull &&
      col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi))
  }

  /** Range-predicate read through the manifest: scan ONLY candidate
    * files, then re-apply the exact predicate (zones are necessary, not
    * sufficient). Output == the full scan's filter, proven in spec.
    *
    * The intersect is ONE metadata-sized manifest job whose result
    * streams to the driver partition-ordered (`toLocalIterator` — memory
    * stays one batch wide, never the layout's file list), and the scan
    * plans as few batched parquet arms ([[Manifests.batchedRead]]), not
    * one union arm per shard. `parts` short-circuits the manifest scan
    * to those shards. */
  def prunedRead(spark: SparkSession, path: String, c: String,
                 lo: Any, hi: Any, parts: Seq[String] = Nil): DataFrame = {
    val matching = zoneFilter(spark, path, c, lo, hi, parts)
    val predicate = col(c) >= lit(lo) && col(c) <= lit(hi)
    val files = matching.select("part_dir", "file")
      .sort("part_dir", "file").toLocalIterator()
    Manifests.batchedRead(spark,
        scala.jdk.CollectionConverters.IteratorHasAsScala(files)
          .asScala.map(_.getString(1)),
        basePath = Some(path)) // keep Hive partition columns (if any)
      .getOrElse(spark.read.parquet(path).limit(0))
      .filter(predicate)
  }

  /** Answer table-level `count / min / max / null-count` aggregates from
    * the manifest ALONE — zero data files opened. The manifest already
    * holds each file's row count and per-column extrema, and those
    * statistics COMPOSE exactly (count = Σ counts, min = min of mins …),
    * so the classic "how big is this table, what's its value range"
    * dashboard query costs a files-sized metadata scan instead of a
    * 100 TB data scan — the trick every lakehouse table format plays with
    * its manifest tier, available here on plain parquet. Only these four
    * statistics compose losslessly from zones. This is the FIRST of the
    * library's three metadata tiers (README "metadata tiers"): grouped
    * SUM/COUNT/AVG roll-ups need maintained summaries
    * ([[graft.plans.SummaryViews]] over
    * [[graft.streaming.IncrementalAgg]]), and distincts/quantiles/heavy
    * hitters need the sketch tier ([[graft.functions.Sketches]]) —
    * anything past that honestly needs the data.
    *
    * Output: one row — `n_rows`, then per indexed column `<c>_min,
    * <c>_max, <c>_nulls` in NATIVE types (exactly what a raw-table
    * aggregate would return, proven under the oracle). */
  def metaProfile(spark: SparkSession, path: String,
                  cols: Seq[String]): DataFrame = {
    val m = spark.read.parquet(s"$path/_zonemap")
    val aggs: Seq[Column] = sum(col("n_rows")).as("n_rows") +:
      cols.flatMap { c =>
        Seq(min(col(s"${c}_min")).as(s"${c}_min"),
          max(col(s"${c}_max")).as(s"${c}_max"),
          sum(col(s"${c}_nulls")).as(s"${c}_nulls"))
      }
    m.agg(aggs.head, aggs.tail: _*)
  }

  /** Clustering diagnostic per indexed NUMERIC column: mean zone width
    * as a share of the global value range (`width_share`). ~files⁻¹ on a
    * perfectly range-clustered layout, ~1.0 on a random layout — the
    * number that says whether building this index will prune anything,
    * read from the manifest alone (no data scan). */
  def diagnose(spark: SparkSession, path: String,
               cols: Seq[String]): DataFrame = {
    val m = spark.read.parquet(s"$path/_zonemap")
    val frames = cols.map { c =>
      m.agg(
          avg(col(s"${c}_max").cast("double") -
            col(s"${c}_min").cast("double")).as("mean_width"),
          (max(col(s"${c}_max").cast("double")) -
            min(col(s"${c}_min").cast("double"))).as("global_range"))
        .select(lit(c).as("col_name"),
          round(col("mean_width") /
            when(col("global_range") === 0d, lit(null))
              .otherwise(col("global_range")), 6).as("width_share"))
    }
    frames.reduce(_ unionByName _)
  }
}
