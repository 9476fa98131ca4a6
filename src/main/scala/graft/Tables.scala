package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All tables are plain parquet scans — column pruning and predicate pushdown
  * reach the scan untouched. The one wrinkle is `events.ts`, whose physical
  * type has varied across driver-generated fixtures: TIMESTAMP(NANOS) (which
  * Spark's reader rejects with [PARQUET_TYPE_ILLEGAL] unless read as raw
  * longs via the legacy conf) and plain TIMESTAMP(MICROS) with
  * isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ). [[events]]
  * normalizes both to a session-zoned µs TimestampType column so every
  * downstream query sees one stable type, and — with the UTC session
  * timezone all our entry points pin — the wall-clock values match what
  * DuckDB's naive µs TIMESTAMP sees on the same file, so oracle comparisons
  * line up in either case.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events"     => events(spark, dir)
      case "documents"  => canonical(spark, dir, "documents",
        Map("doc_id" -> "long", "n_chars" -> "long"))
      case "embeddings" => canonical(spark, dir, "embeddings",
        Map("vec_id" -> "long", "embedding" -> "array<float>",
          "label" -> "int"))
      case n => spark.read.parquet(path(dir, n))
    }

  /** Scan with key columns pinned to canonical types. The round-5 lesson,
    * generalized: a driver-regenerated fixture can change a column's
    * PHYSICAL encoding (int32 vs int64, float vs double lists) without
    * changing its meaning, and every downstream hash/encoder/codegen path
    * assumes one type. Casting to the type the column already has is
    * eliminated by the optimizer, so the canonical read costs nothing when
    * the fixture matches. */
  private def canonical(spark: SparkSession, dir: String, name: String,
                        types: Map[String, String]): DataFrame = {
    val raw = spark.read.parquet(path(dir, name))
    types.foldLeft(raw) { case (df, (c, t)) =>
      df.withColumn(c, col(c).cast(t))
    }
  }

  /** `events` with `ts` normalized to a microsecond TimestampType column,
    * whatever the fixture's physical type.
    *
    * DOCUMENTED SIDE EFFECT (nanos fixtures only): forces
    * `spark.sql.legacy.parquet.nanosAsLong` to true on the session when the
    * first read attempt fails on TIMESTAMP(NANOS) — including over a
    * caller's explicit `false` (the public conf API cannot distinguish an
    * explicit false from the registered default, and without the flag the
    * nanos fixture cannot be read at all; the round driver constructs its
    * own session). µs/ms fixtures never touch the conf. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val p = path(dir, "events")
    val raw =
      try spark.read.parquet(p)
      catch {
        case e: Exception if Option(e.getMessage).exists(_.contains("PARQUET_TYPE_ILLEGAL")) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(p)
      }
    raw.schema("ts").dataType match {
      // legacy TIMESTAMP(NANOS) fixture read as raw long nanos: integer
      // `div` keeps full long precision; a double divide would lose sub-µs
      // bits at 2^60-scale nanos and round instead of truncate.
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) fixture: Spark infers
      // TIMESTAMP_NTZ; cast re-zones the same wall clock into the session
      // (UTC) zone — a value-identity under the UTC sessions we pin.
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
