package graft.sources

import graft.{SparkSpec, Tables}
import graft.cdc.CdcEnvelope
import graft.operators.KeyStrategy
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Write→read-back contract for the whole T1-T7 serializer/compression/
  * key-strategy matrix (mirror of the reference's per-format×compression
  * integration tests, s3_integration_test.rs:73-360). */
class WritersSpec extends SparkSpec {

  private val outRoot = "/root/repo/target/test-out/writers"

  private lazy val env = CdcEnvelope
    .envelopeOnly(CdcEnvelope.fromEvents(Tables.events(spark, sfTiny)))
    .cache()

  private val envDDL =
    "operation string, database string, collection string, " +
      "cluster_time timestamp, document_key string, full_document string, " +
      "resume_token string"

  private def canon(df: DataFrame): Seq[String] = {
    val cols = CdcEnvelope.envelopeColumns
    df.select(cols.head, cols.tail: _*)
      .collect()
      .map(r => cols.map(c => String.valueOf(r.getAs[Any](c))).mkString("|"))
      .sorted.toSeq
  }

  private lazy val want = canon(env)

  private val matrix: Seq[(OutFormat, OutCompression, KeyStrategy)] = Seq(
    (OutFormat.Jsonl, OutCompression.None, KeyStrategy.HivePartitioned),
    (OutFormat.Jsonl, OutCompression.Gzip, KeyStrategy.HivePartitioned),
    (OutFormat.Jsonl, OutCompression.Zstd, KeyStrategy.CollectionBased),
    (OutFormat.Csv, OutCompression.None, KeyStrategy.DatePartitioned),
    (OutFormat.Csv, OutCompression.Gzip, KeyStrategy.CollectionBased),
    (OutFormat.Csv, OutCompression.Zstd, KeyStrategy.Flat),
    (OutFormat.Parquet, OutCompression.Snappy, KeyStrategy.HivePartitioned),
    (OutFormat.Parquet, OutCompression.Zstd, KeyStrategy.Flat),
    (OutFormat.Parquet, OutCompression.Gzip, KeyStrategy.DateHourPartitioned),
    (OutFormat.Avro, OutCompression.None, KeyStrategy.CollectionBased),
    (OutFormat.Avro, OutCompression.Gzip, KeyStrategy.Flat),
    (OutFormat.Avro, OutCompression.Zstd, KeyStrategy.CollectionBased))

  for ((fmt, comp, strat) <- matrix) {
    test(s"round-trip ${fmt.name} × ${comp.name} × ${strat.getClass.getSimpleName.stripSuffix("$")}") {
      val path = s"$outRoot/${fmt.name}-${comp.name}-${strat.getClass.getSimpleName.stripSuffix("$")}"
      Writers.write(env, path, fmt, comp, strat)
      val back = Writers.read(spark, path, fmt, Some(envDDL))
      assert(canon(back) === want)
    }
  }

  test("hive layout on disk matches the reference key scheme") {
    val path = s"$outRoot/layout-check"
    Writers.write(env, path, OutFormat.Jsonl, OutCompression.Gzip,
      KeyStrategy.HivePartitioned)
    // expect .../collection=c_0/year=YYYY/month=M/day=D/hour=H/part-*.json.gz
    val stream = Files.walk(Paths.get(path))
    val leaf = try {
      val it = stream.iterator()
      var found: Option[String] = None
      while (it.hasNext && found.isEmpty) {
        val p = it.next()
        if (p.toString.endsWith(".json.gz")) found = Some(p.toString)
      }
      found
    } finally stream.close()
    assert(leaf.isDefined, "no compressed jsonl part files written")
    val rel = leaf.get.stripPrefix(path + "/")
    assert(rel.matches("collection=[^/]+/year=\\d+/month=\\d+/day=\\d+/hour=\\d+/part-.*"),
      s"unexpected layout: $rel")
  }

  test("partitioned layout is partition-prunable on read (scan skips other keys)") {
    val path = s"$outRoot/prune-check"
    Writers.write(env, path, OutFormat.Parquet, OutCompression.Snappy,
      KeyStrategy.CollectionBased)
    val one = Writers.read(spark, path, OutFormat.Parquet)
      .filter(col("collection") === "c_1")
    val scan = one.queryExecution.executedPlan.toString
    // Spark reports partition pruning in the scan node
    assert(scan.contains("PartitionFilters: [isnotnull(collection"),
      s"partition filter not pushed:\n$scan")
    assert(one.count() === env.filter(col("collection") === "c_1").count())
  }

  test("skewed partition key fans out to multiple bounded files, not one giant") {
    // 90% of rows in one collection: the salted shuffle must spread the hot
    // key over >1 writer task (no single-core serialization) while keeping
    // file count per key <= maxFilesPerKey (no small-files explosion).
    import spark.implicits._
    val maxFiles = 4
    val skewed = (0 until 20000).map { i =>
      (if (i % 10 == 0) s"c_${i % 4}" else "c_hot", s"doc-$i", i.toLong)
    }.toDF("collection", "document_key", "seq")
    val path = s"$outRoot/skew-check"
    // tiny targetFileBytes forces the adaptive salt to its maxFilesPerKey
    // ceiling — the regime a hot key hits at production volume
    Writers.write(skewed, path, OutFormat.Jsonl, OutCompression.None,
      KeyStrategy.CollectionBased, maxFilesPerKey = maxFiles,
      targetFileBytes = 1024)
    def filesUnder(key: String): Seq[String] = {
      val dir = Paths.get(s"$path/collection=$key")
      val stream = Files.walk(dir)
      try {
        val it = stream.iterator()
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val p = it.next().toString
          if (p.contains("/part-")) out += p
        }
        out.toSeq
      } finally stream.close()
    }
    val hot = filesUnder("c_hot")
    assert(hot.size > 1, s"hot key serialized through one task: $hot")
    assert(hot.size <= maxFiles, s"file count per key not bounded: $hot")
    // every row still lands exactly once
    val back = Writers.read(spark, path, OutFormat.Jsonl,
      Some("collection string, document_key string, seq long"))
    assert(back.count() === 20000)
    assert(back.filter(col("collection") === "c_hot").count() === 18000)

    // and the flip side: at the default 128 MiB target this small write
    // must NOT salt — one file per key, no tiny-file multiplication
    val smallPath = s"$outRoot/skew-check-small"
    Writers.write(skewed, smallPath, OutFormat.Jsonl, OutCompression.None,
      KeyStrategy.CollectionBased, maxFilesPerKey = maxFiles)
    def filesAt(base: String, key: String): Int = {
      val stream = Files.walk(Paths.get(s"$base/collection=$key"))
      try stream.iterator().asScala.count(_.toString.contains("/part-"))
      finally stream.close()
    }
    assert(filesAt(smallPath, "c_hot") === 1,
      "small write multiplied files despite volume below target size")
  }

  test("format metadata matches the reference's extensions and content types") {
    assert(OutFormat.Jsonl.extension === ".jsonl")
    assert(OutFormat.Csv.contentType === "text/csv")
    assert(OutFormat.Parquet.extension === ".parquet")
    assert(OutFormat.Avro.contentType === "application/avro")
    assert(OutCompression.Gzip.suffix === ".gz")
    assert(OutCompression.Zstd.suffix === ".zst")
  }
}
