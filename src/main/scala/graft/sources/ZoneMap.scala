package graft.sources

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
  * Build cost: ONE distributed pass over the layout (input_file_name()
  * grouping — a partial-aggregated groupBy; no footer round-trips, no
  * driver-side file loop). The manifest is layout-sized (rows = files).
  */
object ZoneMap {

  private def statsFor(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "zone map needs at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +:
      cols.flatMap { c =>
        Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
          (count(lit(1)) - count(col(c))).as(s"${c}_nulls"))
      }
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** One pass: per data file, per indexed column — min/max/null count.
    * Wide-format manifest: `file, n_rows, <c>_min, <c>_max, <c>_nulls`. */
  def build(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    statsFor(spark.read.parquet(path), cols)

  /** Incremental manifest maintenance — the per-micro-batch call for a
    * streaming sink: index ONLY files the manifest doesn't know yet
    * (identified by basename — part files carry a UUID), scanning just
    * those files, and APPEND their rows to `_zonemap`. Cost per call is
    * O(new files); the layout is never rescanned — the skipping index
    * stays current with the sink instead of being rebuilt nightly (the
    * layout sibling of DedupIndex.ingestStream). The layout listing is
    * driver-side metadata. Indexed columns must be DATA columns (reading
    * a file set directly sees no Hive partition values — partition
    * columns already have partition pruning). Returns newly indexed file
    * count. */
  def update(spark: SparkSession, path: String, cols: Seq[String]): Long = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifestPath = new org.apache.hadoop.fs.Path(s"$path/_zonemap")
    def baseName(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    val known: Set[String] =
      if (!fs.exists(manifestPath)) Set.empty
      else spark.read.parquet(s"$path/_zonemap")
        .select("file").collect().map(r => baseName(r.getString(0))).toSet
    def dataFiles(dir: org.apache.hadoop.fs.Path)
        : Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) dataFiles(st.getPath)
        else Seq(st.getPath)
      }
    val fresh = dataFiles(root).filterNot(p => known.contains(p.getName))
    if (fresh.isEmpty) return 0L
    statsFor(spark.read.parquet(fresh.map(_.toString): _*), cols)
      .write.mode("append").parquet(s"$path/_zonemap")
    fresh.length.toLong
  }

  /** Persist the manifest next to the data (overwrite). */
  def write(spark: SparkSession, path: String, cols: Seq[String]): Unit =
    build(spark, path, cols).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zonemap")

  /** Files whose zone intersects `[lo, hi]` on `c` (inclusive). A file
    * with an all-NULL zone for `c` never matches a range predicate. */
  def candidateFiles(spark: SparkSession, path: String, c: String,
                     lo: Any, hi: Any): Seq[String] = {
    val m = spark.read.parquet(s"$path/_zonemap")
    m.filter(col(s"${c}_min").isNotNull &&
        col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Range-predicate read through the manifest: scan ONLY candidate
    * files, then re-apply the exact predicate (zones are necessary, not
    * sufficient). Output == the full scan's filter, proven in spec.
    *
    * The file list materializes on the driver — bounded by the MANIFEST
    * row count (files, not rows). For layouts whose file count itself is
    * driver-hostile, intersect at a coarser unit first (partition dirs)
    * or shard the manifest by partition and prune per shard. */
  def prunedRead(spark: SparkSession, path: String, c: String,
                 lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(spark, path, c, lo, hi)
    val base =
      if (files.isEmpty)
        spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
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
