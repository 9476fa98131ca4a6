package graft.cdc

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class CdcEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val env = CdcEnvelope.fromEvents(Tables.events(spark, sfTiny)).cache()

  test("adapter emits every envelope column with the declared types") {
    val got = CdcEnvelope.envelopeOnly(env).schema
    val want = CdcEnvelope.schema
    for (f <- want.fields if f.name != "update_description") {
      val g = got.fields.find(_.name == f.name)
      assert(g.isDefined, s"missing ${f.name}")
      assert(g.get.dataType === f.dataType, s"type mismatch on ${f.name}")
    }
  }

  test("update_description populated exactly for update-class (purchase) events") {
    val withUd = env.filter(col("update_description").isNotNull)
    assert(withUd.filter(col("operation") =!= "purchase").count() === 0)
    assert(withUd.count() ===
      env.filter(col("operation") === "purchase").count())
    // struct shape matches event.rs:206-230
    val udType = env.schema("update_description").dataType.asInstanceOf[StructType]
    assert(udType.fieldNames.toSeq ===
      Seq("updatedFields", "removedFields", "truncatedArrays"))
  }

  test("pre-images populated exactly for update-class events, deterministic (S6)") {
    val pre = CdcEnvelope.fromEvents(Tables.events(spark, sfTiny),
      preImages = true)
    // column order: pre-image sits right after full_document, per schema
    assert(pre.columns.indexOf(CdcEnvelope.preImageColumn) ===
      pre.columns.indexOf("full_document") + 1)
    val withPre = pre.filter(col(CdcEnvelope.preImageColumn).isNotNull)
    assert(withPre.filter(col("operation") =!= "purchase").count() === 0)
    assert(withPre.count() ===
      pre.filter(col("operation") === "purchase").count())
    // content is the documented derivation: k_before = (k*7 + event_id) % 100
    val bad = withPre.filter(
      get_json_object(col(CdcEnvelope.preImageColumn), "$.k").cast("long") =!=
        pmod(get_json_object(col("full_document"), "$.k").cast("long") * 7 +
          col("event_id"), lit(100L)))
    assert(bad.count() === 0)
    // schemaWithPreImages declares the same shape
    assert(CdcEnvelope.schemaWithPreImages.fieldNames.toSeq ===
      CdcEnvelope.schema.fieldNames.toSeq.flatMap {
        case "full_document" => Seq("full_document", "full_document_before")
        case c               => Seq(c)
      })
    // default stays pre-image-free: the option is opt-in (stream.rs:494)
    assert(!env.columns.contains(CdcEnvelope.preImageColumn))
  }

  test("document_key and resume_token are valid JSON carrying the event id") {
    val parsed = env.select(
      col("event_id"),
      get_json_object(col("document_key"), "$._id").cast("long").as("key_id"),
      get_json_object(col("resume_token"), "$._data").cast("long").as("tok_id"))
    assert(parsed.filter(col("key_id") =!= col("event_id") ||
      col("tok_id") =!= col("event_id")).count() === 0)
  }

  test("JSONL round-trip is lossless for arbitrary envelope rows (T1)") {
    // ScalaCheck-generated envelope payloads through to_json -> from_json:
    // the serializer contract of s3/destination.rs:194-208, including JSON
    // metacharacters in string fields.
    val strGen = Gen.asciiPrintableStr
    val gen = Gen.listOfN(80, Gen.zip(strGen, Gen.chooseNum(0L, 1L << 40), strGen))
    val rows = gen(Gen.Parameters.default, Seed(7L)).get
    val df = rows.toDF("operation", "event_id", "payload")
    val schema = "operation string, event_id bigint, payload string"
    val roundTripped = df
      .select(to_json(struct(col("operation"), col("event_id"), col("payload"))).as("j"))
      .select(from_json(col("j"), StructType.fromDDL(schema)).as("r"))
      .select("r.operation", "r.event_id", "r.payload")
    assert(roundTripped.collect().toSeq === df.collect().toSeq)
  }

  test("full_name and size estimate behave like the reference accessors") {
    val r = env.select(
      CdcEnvelope.fullName().as("fn"),
      CdcEnvelope.estimatedSizeBytes().as("sz"),
      length(col("full_document")).as("doc_len")).head()
    assert(r.getAs[String]("fn").matches("testdb\\.c_\\d"))
    // the estimate must dominate the payload length (it includes it)
    assert(r.getAs[Long]("sz") > r.getAs[Int]("doc_len"))
    // null-safe: a delete-style event with no documents still sizes
    import spark.implicits._
    val bare = Seq(("delete", "db", "c", null: String, null: String, "{}"))
      .toDF("operation", "database", "collection", "document_key",
        "full_document", "resume_token")
    val sz = bare.select(CdcEnvelope.estimatedSizeBytes()).head().getLong(0)
    assert(sz === ("delete".length + "db".length + "c".length + 2 + 50).toLong)
    // multi-byte payloads count UTF-8 OCTETS, not characters — a byte
    // budget must not under-admit on non-ASCII documents
    val utf = Seq(("insert", "db", "c", null: String, "héllo", "{}"))
      .toDF("operation", "database", "collection", "document_key",
        "full_document", "resume_token")
    val szU = utf.select(CdcEnvelope.estimatedSizeBytes()).head().getLong(0)
    assert(szU === (6 + 2 + 1 + 6 + 2 + 50).toLong, // héllo = 6 bytes, 5 chars
      s"size estimate counted characters, not bytes: $szU")
  }

  test("operation-class predicates partition the op taxonomy correctly") {
    val ops = Seq("insert", "update", "delete", "replace", "invalidate",
      "drop", "dropDatabase", "rename", "weird_unknown").toDF("operation")
    def opsWhere(c: org.apache.spark.sql.Column): Set[String] =
      ops.filter(c).as[String].collect().toSet
    assert(opsWhere(Operations.isDataModification()) ===
      Set("insert", "update", "replace"))
    assert(opsWhere(Operations.isDataRemoval()) ===
      Set("delete", "drop", "dropDatabase"))
    assert(opsWhere(Operations.isDdl()) === Set("drop", "dropDatabase", "rename"))
    assert(opsWhere(Operations.isInvalidate()) === Set("invalidate"))
  }
}
