package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output-partitioning key strategies (SURVEY §2.8), re-expressing
  * rigatoni-destinations/src/s3/key_gen.rs:53-224.
  *
  * The reference formats S3 object keys by hand; Spark-native form is
  * `partitionBy(...)` on the writer, which also makes the layout
  * partition-prunable on read. One deliberate deviation, noted in SURVEY
  * §7.3: the reference keys by wall-clock at flush time (key_gen.rs:148-224,
  * `Utc::now`); we key by event time (`cluster_time`) so output is
  * deterministic and replayable.
  */
sealed trait KeyStrategy { def partitionColumns: Seq[String] }
object KeyStrategy {
  /** key_gen.rs:56-63 — `collection=…/year=…/month=…/day=…/hour=…` */
  case object HivePartitioned extends KeyStrategy {
    val partitionColumns = Seq("collection", "year", "month", "day", "hour")
  }
  /** key_gen.rs:66-75 — default strategy (s3/config.rs:338) */
  case object DateHourPartitioned extends KeyStrategy {
    val partitionColumns = Seq("collection", "year", "month", "day", "hour")
  }
  /** key_gen.rs:78-86 */
  case object DatePartitioned extends KeyStrategy {
    val partitionColumns = Seq("collection", "year", "month", "day")
  }
  /** key_gen.rs:89-95 */
  case object CollectionBased extends KeyStrategy {
    val partitionColumns = Seq("collection")
  }
  /** key_gen.rs:98-104 — single flat prefix */
  case object Flat extends KeyStrategy {
    val partitionColumns = Seq.empty
  }
}

object PartitionKeys {

  /** Derive the time partition columns from the event-time column. Kept as
    * plain year/month/day/hour expressions so they stay codegen'd and the
    * written layout is identical to the reference's Hive scheme. */
  def withTimeColumns(df: DataFrame, tsCol: String = "cluster_time"): DataFrame =
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
      .withColumn("hour", hour(col(tsCol)))

  def withPartitionColumns(df: DataFrame, strategy: KeyStrategy,
                           tsCol: String = "cluster_time"): DataFrame =
    strategy match {
      case KeyStrategy.Flat | KeyStrategy.CollectionBased => df
      case _ => withTimeColumns(df, tsCol)
    }

  /** The flat strategies' object-name prefix `{collection}_{ts}` /
    * `{collection}/{ts}` (key_gen.rs:205-223) as a column, for sinks that
    * need explicit keys rather than directory layout. */
  def flatKey(collectionCol: Column, tsCol: Column): Column =
    concat_ws("_", collectionCol,
      (unix_micros(tsCol) / lit(1000L)).cast("long").cast("string"))
}
