package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The CDC change-event envelope — the single record type the reference
  * engine pushes through its whole pipeline
  * (rigatoni-core/src/event.rs:272-311). Document bodies stay schemaless:
  * they ride along as JSON-string columns and are parsed per-query
  * (the reference's own layout choice for Parquet output,
  * rigatoni-destinations/src/s3/destination.rs:266-296).
  */
final case class TruncatedArray(field: String, newSize: Int)

/** rigatoni-core/src/event.rs:206-230 */
final case class UpdateDescription(
    updatedFields: String, // JSON document of changed fields
    removedFields: Seq[String],
    truncatedArrays: Seq[TruncatedArray])

final case class CdcEnvelope(
    operation: String,
    database: String,
    collection: String,
    cluster_time: java.sql.Timestamp,
    document_key: Option[String],
    full_document: Option[String],
    update_description: Option[UpdateDescription],
    resume_token: String)

object CdcEnvelope {

  /** Envelope schema, mirroring event.rs:272-311 with the reference's own
    * flattening of Namespace into (database, collection)
    * (s3/destination.rs:288-289). */
  val schema: StructType = StructType(Seq(
    StructField("operation", StringType, nullable = false),
    StructField("database", StringType, nullable = false),
    StructField("collection", StringType, nullable = false),
    StructField("cluster_time", TimestampType, nullable = false),
    StructField("document_key", StringType, nullable = true),
    StructField("full_document", StringType, nullable = true),
    StructField("update_description", StructType(Seq(
      StructField("updatedFields", StringType, nullable = true),
      StructField("removedFields", ArrayType(StringType), nullable = true),
      StructField("truncatedArrays", ArrayType(StructType(Seq(
        StructField("field", StringType, nullable = false),
        StructField("newSize", IntegerType, nullable = false)))), nullable = true)
    )), nullable = true),
    StructField("resume_token", StringType, nullable = false)))

  /** Pre-image column name (`fullDocumentBeforeChange`, Mongo 6+). */
  val preImageColumn = "full_document_before"

  /** Envelope schema when pre-images are enabled
    * (`full_document_before_change: WhenAvailable`, stream.rs:483-501 →
    * applied stream.rs:583-608): the document as it was BEFORE the change,
    * nullable because pre-images only exist for update-class operations
    * and only when the server captured one. */
  val schemaWithPreImages: StructType = StructType(
    schema.fields.flatMap { f =>
      if (f.name == "full_document")
        Seq(f, StructField(preImageColumn, StringType, nullable = true))
      else Seq(f)
    })

  /** Canonical adapter from the driver's `events` table to the envelope
    * (FIXTURES.md §B.1). Extra passthrough columns (`event_id`, `user_id`,
    * `value`) are kept so downstream operator queries stay expressible;
    * `envelopeOnly` drops them.
    *
    * `preImages = true` is the `full_document_before_change` source option
    * (stream.rs:483-501): update-class events (the synthetic feed's
    * `purchase`) additionally carry the document as it was before the
    * change. On this fixture the pre-image is a deterministic derivation —
    * `k_before = (k*7 + event_id) mod 100` — so oracles can reproduce it.
    */
  def fromEvents(events: DataFrame, numCollections: Int = 8,
                 preImages: Boolean = false): DataFrame = {
    val base = fromEventsBase(events, numCollections)
    if (!preImages) base
    else {
      val k = get_json_object(col("full_document"), "$.k").cast("long")
      val kBefore = pmod(k * lit(7L) + col("event_id"), lit(100L))
      val withPre = base.withColumn(preImageColumn,
        when(col("operation") === "purchase",
          concat(lit("{\"k\": "), kBefore.cast("string"), lit("}"))))
      // keep column order: pre-image right after full_document
      val cols = withPre.columns.filterNot(_ == preImageColumn).flatMap {
        case "full_document" => Seq("full_document", preImageColumn)
        case c               => Seq(c)
      }
      withPre.select(cols.map(col).toIndexedSeq: _*)
    }
  }

  private def fromEventsBase(events: DataFrame, numCollections: Int): DataFrame =
    events.select(
      col("event_type").as("operation"),
      lit("testdb").as("database"),
      concat(lit("c_"), pmod(col("user_id"), lit(numCollections)).cast("string"))
        .as("collection"),
      col("ts").as("cluster_time"),
      concat(lit("{\"_id\":"), col("event_id").cast("string"), lit("}"))
        .as("document_key"),
      col("props").as("full_document"),
      // update_description (event.rs:206-230) only exists for update-class
      // events; on the synthetic feed, `purchase` plays the update role.
      // updatedFields carries the changed-doc JSON, removedFields/
      // truncatedArrays are deterministic derivations of the event id.
      when(col("event_type") === "purchase",
        struct(
          col("props").as("updatedFields"),
          array(lit("legacy_field")).as("removedFields"),
          array(struct(
            lit("items").as("field"),
            pmod(col("event_id"), lit(10)).cast("int").as("newSize")))
            .as("truncatedArrays")))
        .as("update_description"),
      concat(lit("{\"_data\":"), col("event_id").cast("string"), lit("}"))
        .as("resume_token"),
      col("event_id"),
      col("user_id"),
      col("value"))

  val envelopeColumns: Seq[String] = Seq(
    "operation", "database", "collection", "cluster_time",
    "document_key", "full_document", "resume_token")

  /** `Namespace::full_name()` — "db.coll" (event.rs:196-200). */
  def fullName(database: Column = col("database"),
               collection: Column = col("collection")): Column =
    concat(database, lit("."), collection)

  /** Batching-oriented size estimate (event.rs:397-432): BYTE lengths of
    * the string payload fields (`octet_length` — UTF-8 octets, not
    * characters, so multi-byte text cannot under-count a byte budget) plus
    * a fixed overhead for the timestamp and envelope bookkeeping (the
    * reference uses a ~50 B/key heuristic; here the JSON fields carry
    * their own real lengths). */
  def estimatedSizeBytes(
      operation: Column = col("operation"),
      database: Column = col("database"),
      collection: Column = col("collection"),
      documentKey: Column = col("document_key"),
      fullDocument: Column = col("full_document"),
      resumeToken: Column = col("resume_token")): Column =
    (octet_length(operation) + octet_length(database) + octet_length(collection) +
      coalesce(octet_length(documentKey), lit(0)) +
      coalesce(octet_length(fullDocument), lit(0)) +
      coalesce(octet_length(resumeToken), lit(0)) + lit(50)).cast("long")

  /** Envelope projection; keeps the pre-image column when present. */
  def envelopeOnly(df: DataFrame): DataFrame = {
    val cols =
      if (df.columns.contains(preImageColumn))
        envelopeColumns.flatMap {
          case "full_document" => Seq("full_document", preImageColumn)
          case c               => Seq(c)
        }
      else envelopeColumns
    df.select(cols.map(col): _*)
  }
}

/** Operation taxonomy + class predicates (event.rs:88-144). On the synthetic
  * `events` table operations are {click,error,purchase,signup,view}; the
  * class predicates take the operation set as data, exactly like the
  * reference's `$in` match stages.
  */
object Operations {
  val Insert       = "insert"
  val Update       = "update"
  val Delete       = "delete"
  val Replace      = "replace"
  val Invalidate   = "invalidate"
  val Drop         = "drop"
  val DropDatabase = "dropDatabase"
  val Rename       = "rename"

  /** event.rs:124-128 */
  val dataModification: Seq[String] = Seq(Insert, Update, Replace)
  /** event.rs:130-134 */
  val dataRemoval: Seq[String] = Seq(Delete, Drop, DropDatabase)
  /** event.rs:136-144 */
  val ddl: Seq[String] = Seq(Drop, DropDatabase, Rename)

  def opIn(ops: Seq[String], opCol: Column = col("operation")): Column =
    opCol.isin(ops: _*)

  def isDataModification(opCol: Column = col("operation")): Column =
    opIn(dataModification, opCol)
  def isDataRemoval(opCol: Column = col("operation")): Column =
    opIn(dataRemoval, opCol)
  def isDdl(opCol: Column = col("operation")): Column = opIn(ddl, opCol)
  def isInvalidate(opCol: Column = col("operation")): Column =
    opCol === Invalidate
}
