package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All tables are plain parquet scans — column pruning and predicate pushdown
  * reach the scan untouched. The one wrinkle is `events.ts`, written as
  * parquet TIMESTAMP(NANOS), which Spark's reader rejects
  * ([PARQUET_TYPE_ILLEGAL]); we read it as raw long nanos via the legacy conf
  * and truncate to microseconds — the same truncation DuckDB applies when it
  * casts ns parquet to its µs TIMESTAMP, so oracle comparisons line up.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(path(dir, n))
    }

  /** `events` with `ts` converted to a microsecond TimestampType column.
    *
    * DOCUMENTED SIDE EFFECT: forces `spark.sql.legacy.parquet.nanosAsLong`
    * to true on the session — including over a caller's explicit `false`
    * (the public conf API cannot distinguish an explicit false from the
    * registered default, and without the flag the TIMESTAMP(NANOS)
    * fixture cannot be read at all on an arbitrary caller-owned session;
    * the round driver constructs its own). It changes how OTHER
    * nanos-parquet reads on the same session behave: they come back as
    * raw long nanos. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(path(dir, "events"))
      // integer `div` keeps full long precision; a double divide would lose
      // sub-µs bits at 2^60-scale nanos and round instead of truncate.
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
