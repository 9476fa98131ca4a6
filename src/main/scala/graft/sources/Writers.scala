package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{KeyStrategy, PartitionKeys}

/** Output formats (rigatoni-destinations/src/s3/config.rs:104-132): name,
  * file extension and MIME content type — the T7 metadata surface. */
sealed abstract class OutFormat(val name: String, val extension: String,
                                val contentType: String)
object OutFormat {
  case object Jsonl   extends OutFormat("jsonl", ".jsonl", "application/x-ndjson")
  case object Csv     extends OutFormat("csv", ".csv", "text/csv")
  case object Parquet extends OutFormat("parquet", ".parquet", "application/vnd.apache.parquet")
  case object Avro    extends OutFormat("avro", ".avro", "application/avro")
  val all: Seq[OutFormat] = Seq(Jsonl, Csv, Parquet, Avro)
}

/** Compression options (s3/config.rs:165-192): extension suffix plus the
  * codec name each Spark writer understands. */
sealed abstract class OutCompression(val name: String, val suffix: String)
object OutCompression {
  case object None extends OutCompression("none", "")
  case object Gzip extends OutCompression("gzip", ".gz")
  case object Zstd extends OutCompression("zstd", ".zst")
  case object Snappy extends OutCompression("snappy", "")
}

/** The serialization/sink layer (SURVEY §2.3 T1-T7 + §2.8) — the
  * reference's whole write path (s3/destination.rs:194-513 serialize +
  * compress, key_gen.rs:148-224 partitioned keys) re-expressed as Spark
  * `DataFrameWriter` plans: `partitionBy` produces the Hive-style layout
  * the reference emits for downstream engines, and each format writes
  * through Spark's distributed, committer-protected output path instead of
  * hand-rolled PUTs. Avro has no datasource in this build, so it goes
  * through [[AvroSink]] (Avro container files via the Java library,
  * written per-partition — still fully distributed).
  *
  * Codec matrix: jsonl/csv: none, gzip, zstd (via [[ZstdCodec]], a
  * zstd-jni-backed Hadoop codec — stock Hadoop's needs native libs this
  * environment lacks) · parquet: none, snappy, gzip, zstd ·
  * avro: none(null), gzip(deflate), zstd(zstandard)
  */
object Writers {

  /** Text-format compression option value: shortnames for built-ins, the
    * [[ZstdCodec]] class for zstd (no native-hadoop here — zstd-jni codec
    * instead). Registers the codec with the session's Hadoop conf so the
    * reader resolves `.zst` files on the way back. */
  private[sources] def textCodec(spark: org.apache.spark.sql.SparkSession,
                                 compression: OutCompression): String =
    compression match {
      case OutCompression.Zstd =>
        val conf = spark.sparkContext.hadoopConfiguration
        val key = "io.compression.codecs"
        val cls = classOf[ZstdCodec].getName
        val cur = Option(conf.get(key)).getOrElse("")
        if (!cur.contains(cls))
          conf.set(key, if (cur.isEmpty) cls else s"$cur,$cls")
        cls
      case c => c.name
    }

  /** Write `df` under `strategy`'s partition layout. Time partition
    * columns derive from event time (`tsCol`) — deterministic and
    * replayable, deviating deliberately from the reference's wall-clock
    * keys (SURVEY §7.3).
    *
    * `maxFilesPerKey` bounds BOTH file-count hazards: repartitioning on
    * the partition columns alone fixes the small-files explosion (every
    * task otherwise holds rows for every key → tasks × partitions tiny
    * files; measured 10× slower at sf0.1) but collapses each key into ONE
    * task — a skewed key (one hot collection of eight) then serializes
    * through a single core and produces one giant file. The shuffle key is
    * therefore (partition columns, pmod(xxhash64(row), filesPerKey)):
    * bounded files AND up to that many parallel writer tasks per key.
    *
    * The salt width ADAPTS to volume: filesPerKey =
    * clamp(estimated_bytes / targetFileBytes, 1, maxFilesPerKey), using
    * Catalyst's plan-size estimate (no job launched). Small writes get 1
    * file per key (a fixed salt would multiply tiny files — measured ~2×
    * slower round-trip at sf0.1 from 4× the gzip streams); huge writes
    * saturate at maxFilesPerKey.
    *
    * The plan estimate is TOTAL bytes, which implicitly assumes the
    * worst-case distribution (all bytes in one hot key) — sizing every
    * key's salt from it would spray an evenly-spread large write into
    * maxFilesPerKey tiny files per key (10 GB over 1000 collections →
    * 64,000 sub-MB files). So whenever the naive width exceeds 1, one
    * cheap approx-distinct pass over the key columns rescales to per-key
    * volume; a floor of min(4, naive) keeps some spread for a hidden hot
    * key (even-spread math would under-salt it). Small writes — the
    * common case — never pay the extra pass.
    *
    * COST CAVEAT: that approx-distinct pass is an EAGER job over the full
    * input at plan time, so an uncached expensive upstream (a multi-join
    * CDC transform, not a bare scan) computes its lineage twice — once to
    * count keys, once to write. When the lineage is costlier than a scan,
    * either `.persist()` the input before calling write, or pass
    * `filesPerKeyHint` (e.g. from table statistics or a previous run) to
    * skip the estimation pass entirely. */
  def write(df: DataFrame, path: String, format: OutFormat,
            compression: OutCompression = OutCompression.None,
            strategy: KeyStrategy = KeyStrategy.HivePartitioned,
            tsCol: String = "cluster_time",
            mode: String = "overwrite",
            maxFilesPerKey: Int = 64,
            targetFileBytes: Long = 128L << 20,
            filesPerKeyHint: Option[Int] = None): Unit = {
    require(maxFilesPerKey >= 1, s"maxFilesPerKey must be >= 1 (got $maxFilesPerKey)")
    require(targetFileBytes >= 1, s"targetFileBytes must be >= 1 (got $targetFileBytes)")
    require(filesPerKeyHint.forall(_ >= 1),
      s"filesPerKeyHint must be >= 1 (got $filesPerKeyHint)")
    val derived = PartitionKeys.withPartitionColumns(df, strategy, tsCol)
    val filesPerKey = filesPerKeyHint.map(_.min(maxFilesPerKey)).getOrElse {
      val est = derived.queryExecution.optimizedPlan.stats.sizeInBytes
      val naive = ((est + targetFileBytes - 1) / targetFileBytes)
        .min(maxFilesPerKey).max(1).toInt
      if (naive <= 1 || strategy.partitionColumns.isEmpty) naive
      else {
        import org.apache.spark.sql.functions.{approx_count_distinct, col, struct}
        val keyCount = derived
          .agg(approx_count_distinct(
            struct(strategy.partitionColumns.map(col): _*)))
          .head().getLong(0).max(1L)
        (((est / keyCount) + targetFileBytes - 1) / targetFileBytes)
          .max(math.min(4, naive))
          .min(maxFilesPerKey).max(1).toInt
      }
    }
    val keyed =
      if (strategy.partitionColumns.nonEmpty) {
        import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64,
          spark_partition_id}
        // xxhash64 rejects MapType (and variant) inputs — salt only from
        // hashable columns (graft.Hashable, shared with Skew.saltedJoin).
        // The no-hashable-column fallback spreads by INPUT PARTITION id:
        // coarse (one bucket per input partition) but deterministic under
        // task recompute, where the previous monotonically_increasing_id
        // fallback was the SPARK-23207 nondeterministic-shuffle-key hazard
        // (a recomputed map task re-salts rows and the written output
        // silently duplicates or drops them). REMAINING CAVEAT: the
        // fallback is deterministic PER INPUT PARTITION, not per row —
        // it is recompute-stable only when the upstream partitioning
        // itself is (a file scan). If an upstream SHUFFLE feeds this
        // write and its map side is nondeterministic, a recomputed task
        // can see different partition contents; all-unhashable schemas
        // feeding a salted write should materialize (checkpoint/persist)
        // below the shuffle first.
        // plan output attributes, not derived(f.name): name lookup would
        // mis-parse a column literally named "a.b" as nested access and
        // throw on duplicate names (same fix as Skew.saltedJoin)
        val originalNames = df.columns.toSet
        val saltInputs = derived.queryExecution.analyzed.output
          .filter(a => originalNames.contains(a.name))
          .filterNot(a => graft.Hashable.unhashable(a.dataType))
          .map(a => org.apache.spark.sql.GraftBridge.column(a))
          .toIndexedSeq
        val salt = pmod(
          if (saltInputs.nonEmpty) xxhash64(saltInputs: _*)
          else xxhash64(spark_partition_id().cast("long")),
          lit(filesPerKey.toLong))
        // explicit partition count: a count-less repartition is fair game
        // for AQE partition coalescing, which at small volumes merges the
        // salted groups back into one task — exactly the serialization
        // point the salt exists to prevent
        val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
          .toIntOption.getOrElse(200).max(filesPerKey)
        derived.repartition(n,
          (strategy.partitionColumns.map(col) :+ salt): _*)
      } else derived
    format match {
      case OutFormat.Avro =>
        AvroSink.write(keyed, path, compression, strategy.partitionColumns, mode)
      case _ =>
        val w0 = keyed.write.mode(mode)
        val w =
          if (strategy.partitionColumns.nonEmpty)
            w0.partitionBy(strategy.partitionColumns: _*)
          else w0
        format match {
          case OutFormat.Jsonl =>
            w.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
              .option("compression", textCodec(df.sparkSession, compression))
              .json(path)
          case OutFormat.Csv =>
            w.option("header", "true")
              .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
              .option("compression", textCodec(df.sparkSession, compression))
              .csv(path)
          case OutFormat.Parquet =>
            w.option("compression", compression.name).parquet(path)
          case OutFormat.Avro => // handled above
        }
    }
  }

  /** Read back what [[write]] produced (partition columns are rediscovered
    * from the Hive layout). For CSV/JSON the caller's schema keeps types
    * lossless — schema-on-read, exactly how downstream engines consume the
    * reference's objects. */
  def read(spark: SparkSession, path: String, format: OutFormat,
           schemaDDL: Option[String] = None): DataFrame = format match {
    case OutFormat.Jsonl =>
      textCodec(spark, OutCompression.Zstd) // ensure .zst resolves
      val r = spark.read
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      schemaDDL.fold(r)(s => r.schema(s)).json(path)
    case OutFormat.Csv =>
      textCodec(spark, OutCompression.Zstd) // ensure .zst resolves
      val r = spark.read.option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      schemaDDL.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
    case OutFormat.Parquet => spark.read.parquet(path)
    case OutFormat.Avro    => AvroSink.read(spark, path, schemaDDL)
  }
}
