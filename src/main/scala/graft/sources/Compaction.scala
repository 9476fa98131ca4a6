package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Small-file compaction over a [[Writers.write]]-style layout — the
  * OPTIMIZE pass of lakehouse engines: a streaming sink that commits a
  * micro-batch every 30 s writes thousands of KB-sized files per
  * partition per day, and every downstream scan then pays file-open and
  * footer-read cost per tiny file. Compaction rewrites ONLY the
  * fragmented partition directories, bin-packing each to
  * ceil(bytes / targetFileBytes) files from MEASURED on-disk sizes (not
  * plan-stats estimates, which is what the write path has to use).
  *
  * Shape: one driver-side listing (layout-sized — directory and file
  * METADATA, never data), then one small distributed job per fragmented
  * directory (read dir → repartition(targetFiles) → write). Untouched
  * directories are never read — selective like Delta's OPTIMIZE, not a
  * full-table rewrite. At 100 TB the per-directory jobs are independent;
  * `parallelism` overlaps them from a bounded thread pool (each job is
  * data-local to one partition's bytes and underuses the cluster alone).
  *
  * Swap protocol (no transaction log here, so stated plainly): new files
  * land in the live directory under a `compacted-` prefix FIRST, then the
  * old files are deleted. A crash between the two steps leaves the
  * partition readable but with duplicate rows; recovery = delete either
  * generation (`compacted-<runId>-` names make the new one identifiable).
  * The loss-window alternative (delete first) is strictly worse for a
  * data pipeline; exactly-once swaps need the transaction-log layer this
  * library deliberately leaves to the table format.
  *
  * Returns the compaction report: one row per leaf data directory —
  * `(partition, files_before, bytes, files_after, compacted)` — with
  * `files_after` the post-state file count whether or not a rewrite ran.
  * Re-running on an already-compacted layout is a no-op (every dir
  * already meets its target ⇒ zero rewrites). */
object Compaction {

  private case class Leaf(rel: String, dir: Path, files: Seq[Path],
                          bytes: Long)

  private def listLeaves(fs: FileSystem, root: Path): Seq[Leaf] = {
    def isData(p: Path): Boolean = {
      val n = p.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    def walk(dir: Path): Seq[Leaf] = {
      val entries = fs.listStatus(dir).toSeq
        .filter(st => isData(st.getPath))
      val files = entries.filter(_.isFile)
      val subs = entries.filter(_.isDirectory)
        .flatMap(st => walk(st.getPath))
      if (files.isEmpty) subs
      else {
        val rel = root.toUri.relativize(dir.toUri).getPath.stripSuffix("/")
        Leaf(if (rel.isEmpty) "." else rel, dir, files.map(_.getPath),
          entries.filter(_.isFile).map(_.getLen).sum) +: subs
      }
    }
    walk(root)
  }

  /** `sortCols`: re-cluster each rewritten directory on these columns
    * (range-partition across the packed files + sort within each) so
    * compaction PRESERVES a zone-map/row-group-stats-friendly layout —
    * a plain hash repartition would scramble a range-clustered dir and
    * silently destroy the pruning its writer paid for ([[ZoneMap]]'s
    * `width_share` measures exactly this; ZoneMapSpec proves the
    * round-trip). Empty = plain hash packing. */
  def compact(spark: SparkSession, path: String, format: OutFormat,
              compression: OutCompression = OutCompression.None,
              targetFileBytes: Long = 128L << 20,
              schemaDDL: Option[String] = None,
              sortCols: Seq[String] = Nil,
              parallelism: Int = 1,
              // after refreshing index manifests, also merge-write the
              // layout's _graft_catalog.json (GraftCatalog.selfDescribe) —
              // pass false for layouts whose writers deliberately opted
              // out of discovery (the BloomIndex/ZoneMap updateCatalog
              // opt-out must not be silently undone by maintenance)
              updateCatalog: Boolean = true): DataFrame = {
    require(targetFileBytes >= 1,
      s"targetFileBytes must be >= 1 (got $targetFileBytes)")
    require(parallelism >= 1, s"parallelism must be >= 1 (got $parallelism)")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fully qualify BEFORE relativizing: listStatus returns scheme-
    // qualified paths, and URI.relativize against an unqualified root
    // silently returns the absolute URI instead of the partition name
    val root = fs.makeQualified(new Path(path))
    val leaves = listLeaves(fs, root)
    val runId = java.util.UUID.randomUUID().toString.take(8)

    // per-directory rewrites are independent (distinct dirs, distinct tmp
    // staging, thread-safe job submission) — `parallelism` > 1 overlaps
    // them from a bounded pool, the practical lever when a day's ingest
    // fragments thousands of partitions and each rewrite is a small job
    // that underuses the cluster alone
    val compactOne: Leaf => Row = { leaf =>
      val target = math.max(1L,
        (leaf.bytes + targetFileBytes - 1) / targetFileBytes).toInt
      if (leaf.files.length <= target)
        Row(leaf.rel, leaf.files.length, leaf.bytes, leaf.files.length, false)
      else {
        // read ONLY this directory's data files (partition values live in
        // the dir name and are untouched by rewriting the files within)
        val in = readDir(spark, leaf.dir.toString, format, schemaDDL)
        val packed =
          if (sortCols.isEmpty) in.repartition(target)
          else if (target == 1)
            in.repartition(1)
              .sortWithinPartitions(sortCols.map(
                org.apache.spark.sql.functions.col): _*)
          else in.repartitionByRange(target, sortCols.map(
              org.apache.spark.sql.functions.col): _*)
            .sortWithinPartitions(sortCols.map(
              org.apache.spark.sql.functions.col): _*)
        val tmp = new Path(root, s".compact-tmp/$runId/${leaf.rel}")
        writeDir(packed, tmp.toString, format, compression)
        val newFiles = fs.listStatus(tmp).toSeq.map(_.getPath)
          .filter(p => !p.getName.startsWith("_") &&
            !p.getName.startsWith("."))
        // new generation in first (crash ⇒ duplicates, never loss) …
        newFiles.zipWithIndex.foreach { case (f, i) =>
          val ext = f.getName.dropWhile(_ != '.')
          require(fs.rename(f,
            new Path(leaf.dir, s"compacted-$runId-$i$ext")),
            s"rename failed for $f")
        }
        // … then the old generation out
        leaf.files.foreach(f => fs.delete(f, false))
        Row(leaf.rel, leaf.files.length, leaf.bytes, newFiles.length, true)
      }
    }
    val ordered = leaves.sortBy(_.rel)
    val report =
      if (parallelism == 1) ordered.map(compactOne)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
        try {
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration.Duration
          implicit val ec: ExecutionContext =
            ExecutionContext.fromExecutorService(pool)
          Await.result(
            Future.sequence(ordered.map(l => Future(compactOne(l)))),
            Duration.Inf)
        } finally pool.shutdown()
      }
    fs.delete(new Path(root, ".compact-tmp"), true)

    // an indexed layout's manifests must follow the rewrite: the old
    // part files are gone, so their index rows are ghosts (prunedRead
    // would hand dead paths to the scan). Refresh exactly the shards of
    // the leaves rewritten above — O(rewritten dirs), indexed columns
    // recovered from each manifest's own schema. Both sidecar tiers:
    // `_zonemap` (range pruning) and `_bloomindex` (point lookups).
    if (format == OutFormat.Parquet) {
      val rewritten = report.collect {
        case r if r.getBoolean(4) => r.getString(0)
      }
      ZoneMap.refreshShards(spark, path, rewritten)
      BloomIndex.refreshShards(spark, path, rewritten)
      // …and so must the catalog: a compacted layout whose manifests were
      // never self-described (built before the catalog existed) becomes
      // discoverable here — merge semantics keep every existing entry's
      // settings; updateCatalog=false preserves a deliberate opt-out
      if (updateCatalog && rewritten.nonEmpty &&
          (ZoneMap.manifestExists(spark, path) ||
            BloomIndex.manifestExists(spark, path)))
        graft.plans.GraftCatalog.selfDescribe(spark, path)
    }

    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(report).asJava),
      StructType(Seq(
        StructField("partition", StringType, nullable = false),
        StructField("files_before", IntegerType, nullable = false),
        StructField("bytes", LongType, nullable = false),
        StructField("files_after", IntegerType, nullable = false),
        StructField("compacted", BooleanType, nullable = false))))
  }

  /** Read one leaf directory WITHOUT partition discovery (mirrors
    * [[Writers.read]]'s options; parquet/jsonl/csv — the formats
    * [[Writers.write]] lays out as plain files). */
  private def readDir(spark: SparkSession, dir: String, format: OutFormat,
                      schemaDDL: Option[String]): DataFrame = format match {
    case OutFormat.Jsonl =>
      Writers.textCodec(spark, OutCompression.Zstd) // .zst must resolve
      val r = spark.read
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      schemaDDL.fold(r)(s => r.schema(s)).json(dir)
    case OutFormat.Csv =>
      Writers.textCodec(spark, OutCompression.Zstd) // .zst must resolve
      val r = spark.read.option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      schemaDDL.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(dir)
    case OutFormat.Parquet => spark.read.parquet(dir)
    case OutFormat.Avro => throw new IllegalArgumentException(
      "avro compaction is not supported (AvroSink owns that layout)")
  }

  private def writeDir(df: DataFrame, dir: String, format: OutFormat,
                       compression: OutCompression): Unit = format match {
    case OutFormat.Jsonl =>
      df.write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .option("compression", Writers.textCodec(df.sparkSession, compression))
        .json(dir)
    case OutFormat.Csv =>
      df.write.mode("overwrite").option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .option("compression", Writers.textCodec(df.sparkSession, compression))
        .csv(dir)
    case OutFormat.Parquet =>
      df.write.mode("overwrite")
        .option("compression", compression.name).parquet(dir)
    case OutFormat.Avro => // rejected in readDir
  }
}
