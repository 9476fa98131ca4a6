package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String = {
    val p = s"/root/repo/target/test-out/incr-agg/$tag"
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  private val rows = (1L to 300L).map(i => (i % 17, i, 1L)) // (key, v, n)

  test("three incremental batches == one-shot aggregate, exactly") {
    val path = freshPath("three-batches")
    val df = rows.toDF("key", "v", "n")
    (0 until 3).foreach { b =>
      IncrementalAgg.applyDelta(spark, path,
        df.filter(pmod(col("v"), lit(3)) === b),
        keyCols = Seq("key"), sumCols = Seq("v", "n"),
        nBuckets = 4, batchId = b)
    }
    val got = IncrementalAgg.read(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = df.groupBy("key").agg(sum("v").as("v"), sum("n").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("replayed batchId is a no-op (exactly-once under at-least-once)") {
    val path = freshPath("replay")
    val df = Seq((1L, 10L), (2L, 20L)).toDF("key", "v")
    IncrementalAgg.applyDelta(spark, path, df, Seq("key"), Seq("v"),
      nBuckets = 4, batchId = 0)
    // replay the SAME batch id — sums must not double
    IncrementalAgg.applyDelta(spark, path, df, Seq("key"), Seq("v"),
      nBuckets = 4, batchId = 0)
    val got = IncrementalAgg.read(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 10L, 2L -> 20L))
    // a NEW batch id with the same payload does apply
    IncrementalAgg.applyDelta(spark, path, df, Seq("key"), Seq("v"),
      nBuckets = 4, batchId = 1)
    val got2 = IncrementalAgg.read(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === Map(1L -> 20L, 2L -> 40L))
  }

  test("a batch rewrites ONLY the buckets it touches") {
    val path = freshPath("selective")
    val nBuckets = 8
    val seed = (1L to 64L).map(k => (k, k)).toDF("key", "v")
    IncrementalAgg.applyDelta(spark, path, seed, Seq("key"), Seq("v"),
      nBuckets = nBuckets, batchId = 0)
    val stateDir = new java.io.File(s"$path/state")
    def bucketFiles(): Map[String, Map[String, Long]] =
      stateDir.listFiles().filter(_.getName.startsWith("__bucket="))
        .map(d => d.getName -> d.listFiles()
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(f => f.getName -> f.lastModified()).toMap).toMap
    val before = bucketFiles()
    assert(before.size === nBuckets, s"64 keys should hit all 8 buckets")
    // one-key delta → exactly one bucket dir changes
    IncrementalAgg.applyDelta(spark, path, Seq((1L, 5L)).toDF("key", "v"),
      Seq("key"), Seq("v"), nBuckets = nBuckets, batchId = 1)
    val after = bucketFiles()
    val changed = after.keySet.filter(b => after(b) != before(b))
    assert(changed.size === 1,
      s"expected exactly one rewritten bucket, got $changed")
    // and the aggregate is still exact
    val got = IncrementalAgg.read(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 6L && got(2L) === 2L && got.size === 64)
  }

  test("foreachBatch wiring: streamed deltas land exactly once") {
    val path = freshPath("stream")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("key", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        IncrementalAgg.applyDelta(spark, path, batch,
          Seq("key"), Seq("v"), nBuckets = 4, batchId = id)
      }
      .option("checkpointLocation", s"$path/_ckpt")
      .start()
    try {
      mem.addData((1L, 1L), (2L, 2L)); q.processAllAvailable()
      mem.addData((1L, 10L), (3L, 3L)); q.processAllAvailable()
    } finally q.stop()
    val got = IncrementalAgg.read(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 11L, 2L -> 2L, 3L -> 3L))
  }
}
