package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReplicaTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String = {
    val p = s"/root/repo/target/test-out/replica/$tag"
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  // (key, version, op, payload)
  private def df(rows: (Long, Long, String, String)*) =
    rows.toDF("key", "ver", "op", "payload")

  test("out-of-order batches converge to global latest-per-key") {
    val path = freshPath("ooo")
    val all = (1L to 120L).map { i =>
      (i % 11, i, if (i % 13 == 0) "delete" else "upsert", s"p$i")
    }
    // deliberately NOT time-ordered chunks: i % 3 interleaves versions
    (0 until 3).foreach { b =>
      ReplicaTable.applyBatch(spark, path,
        df(all.filter(_._2 % 3 == b): _*),
        keyCols = Seq("key"), versionCols = Seq("ver"),
        deleteWhen = col("op") === "delete", nBuckets = 4, batchId = b)
    }
    val got = ReplicaTable.read(spark, path)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(3)))
      .toMap
    val want = all.groupBy(_._1).view.mapValues(_.maxBy(_._2))
      .filter(_._2._3 != "delete")
      .map { case (k, (_, v, _, p)) => k -> (v, p) }.toMap
    assert(got === want)
    assert(got.size < 11, "some key's latest op should be a delete")
  }

  test("versioned tombstones: older rows cannot resurrect a deleted key") {
    val path = freshPath("tombstone")
    // batch 0: the delete (version 10) arrives FIRST
    ReplicaTable.applyBatch(spark, path, df((1L, 10L, "delete", "x")),
      Seq("key"), Seq("ver"), col("op") === "delete", 4, batchId = 0)
    // batch 1: a LATE row with an OLDER version — must stay dead
    ReplicaTable.applyBatch(spark, path, df((1L, 5L, "upsert", "old")),
      Seq("key"), Seq("ver"), col("op") === "delete", 4, batchId = 1)
    assert(ReplicaTable.read(spark, path).count() === 0,
      "a retained tombstone must out-version the late row")
    // batch 2: a NEWER row revives the key
    ReplicaTable.applyBatch(spark, path, df((1L, 20L, "upsert", "new")),
      Seq("key"), Seq("ver"), col("op") === "delete", 4, batchId = 2)
    val r = ReplicaTable.read(spark, path).collect()
    assert(r.length === 1 && r.head.getString(3) === "new")
  }

  test("tombstones=false is compact but loses the late-row guard (documented)") {
    val path = freshPath("no-tombstone")
    ReplicaTable.applyBatch(spark, path, df((1L, 10L, "delete", "x")),
      Seq("key"), Seq("ver"), col("op") === "delete", 4, batchId = 0,
      tombstones = false)
    ReplicaTable.applyBatch(spark, path, df((1L, 5L, "upsert", "old")),
      Seq("key"), Seq("ver"), col("op") === "delete", 4, batchId = 1,
      tombstones = false)
    // the delete marker was dropped, so the older row re-inserts — the
    // exact divergence the scaladoc documents
    assert(ReplicaTable.read(spark, path).count() === 1)
  }

  test("deleting every key in a bucket clears its dir (dynamic-overwrite gap)") {
    val path = freshPath("empty-bucket")
    val seed = df((1L to 16L).map(k => (k, 1L, "upsert", s"p$k")): _*)
    ReplicaTable.applyBatch(spark, path, seed, Seq("key"), Seq("ver"),
      col("op") === "delete", nBuckets = 4, batchId = 0, tombstones = false)
    assert(ReplicaTable.read(spark, path).count() === 16)
    // delete EVERYTHING: dynamic overwrite alone would write zero
    // partitions and silently keep all 16 stale rows
    val wipe = df((1L to 16L).map(k => (k, 2L, "delete", "x")): _*)
    ReplicaTable.applyBatch(spark, path, wipe, Seq("key"), Seq("ver"),
      col("op") === "delete", nBuckets = 4, batchId = 1, tombstones = false)
    assert(ReplicaTable.read(spark, path).count() === 0,
      "emptied buckets must be cleared, not left stale")
    assert(!new java.io.File(s"$path/state").listFiles()
      .exists(_.getName.startsWith("__bucket=")),
      "all bucket dirs should be deleted")
  }

  test("replayed batchId is a no-op; a batch rewrites only touched buckets") {
    val path = freshPath("replay-selective")
    val nBuckets = 8
    val seed = df((1L to 64L).map(k => (k, k, "upsert", s"p$k")): _*)
    ReplicaTable.applyBatch(spark, path, seed, Seq("key"), Seq("ver"),
      col("op") === "delete", nBuckets, batchId = 0)
    // replay: state unchanged
    val before = ReplicaTable.read(spark, path).count()
    ReplicaTable.applyBatch(spark, path, seed, Seq("key"), Seq("ver"),
      col("op") === "delete", nBuckets, batchId = 0)
    assert(ReplicaTable.read(spark, path).count() === before)
    // one-key update touches exactly one bucket dir
    val stateDir = new java.io.File(s"$path/state")
    def files(): Map[String, Map[String, Long]] =
      stateDir.listFiles().filter(_.getName.startsWith("__bucket="))
        .map(d => d.getName -> d.listFiles()
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(f => f.getName -> f.lastModified()).toMap).toMap
    val pre = files()
    ReplicaTable.applyBatch(spark, path, df((1L, 100L, "upsert", "v2")),
      Seq("key"), Seq("ver"), col("op") === "delete", nBuckets, batchId = 1)
    val post = files()
    assert(post.keySet.count(b => post(b) != pre(b)) === 1,
      "exactly one bucket should be rewritten")
    val got = ReplicaTable.read(spark, path)
      .filter(col("key") === 1L).collect()
    assert(got.length === 1 && got.head.getString(3) === "v2")
  }
}
