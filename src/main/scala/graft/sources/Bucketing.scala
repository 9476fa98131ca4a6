package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the "shuffle once at write time, join
  * shuffle-free forever after" contract. A fact co-bucketed with its join
  * partner on the join key turns every subsequent join into a bucket-local
  * sort-merge: at 100 TB that deletes the dominant exchange from every
  * repeated join against the same key, which is exactly how a warehouse
  * lays out orders/lineitem-shaped pairs.
  *
  * Mechanics: `bucketBy(n, key).sortBy(key)` hashes rows into `n` buckets
  * per writer task and records the layout in the catalog; at read time
  * Spark plans joins between tables bucketed on the same key with the same
  * bucket count WITHOUT an Exchange on either side. The bucket count is a
  * real capacity decision — it fixes the join parallelism for the table's
  * lifetime, so size it to the target cluster (cores × a small factor),
  * not to today's data.
  */
object Bucketing {

  /** Write `df` as a parquet-backed table bucketed and sorted on `key`,
    * at `path` (external — the layout lives with the data, not wherever
    * the session's warehouse points). Overwrites any previous layout. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int, path: String,
                    updateCatalog: Boolean = true): Unit = {
    require(nBuckets >= 1, s"bucket count must be >= 1 (got $nBuckets)")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
    // self-describe at the layout root: a session without the metastore
    // entry can still discover HOW the files are bucketed (table name,
    // key, count) and re-register the table to get exchange-free joins
    if (updateCatalog)
      graft.plans.GraftCatalog.describeArtifact(df.sparkSession, path,
        "bucketed-table",
        Map("table" -> table, "key" -> key,
          "nBuckets" -> nBuckets.toString))
  }

  /** The two bucketed sides joined on their bucket key. The MERGE hint
    * pins a sort-merge join so the bucket layout (not a broadcast
    * estimate) decides the plan shape — with co-bucketed inputs the join
    * carries no Exchange. */
  def colocatedJoin(spark: SparkSession, leftTable: String, leftKey: String,
                    rightTable: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
