package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-management operators a large-scale training-data pipeline needs
  * beyond per-document analytics: deterministic dataset splits and
  * benchmark decontamination. Both are engine-portable (md5-based, no
  * Spark-only hashes) so the DuckDB oracle can replay them exactly. */
object CorpusOps {

  /** Deterministic hash bucket in [0, buckets): md5 of the content, first
    * 8 hex digits as an integer. Content-keyed (not id-keyed), so the
    * assignment survives re-ingestion and re-ordering — the property a
    * train/val/test split must have at corpus scale. */
  def hashBucket(content: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(content), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Train/val/test assignment by content hash: scan-local, shuffle-free,
    * reproducible. Fractions are percentage points (default 80/10/10). */
  def withSplit(docs: DataFrame, contentCol: String = "text",
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val b = hashBucket(col(contentCol))
    docs.withColumn("split_bucket", b)
      .withColumn("split",
        when(b < trainPct, "train")
          .when(b < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any word
    * n-gram with a benchmark set. The join is a posting-list semi-join on
    * the shingle (one shuffle keyed by shingle — the shape that scales;
    * never a document cross product). Returns (doc_id, n_shared_shingles)
    * for contaminated corpus docs.
    *
    * Shingles are joined by their codegen'd xxhash64 hashes
    * ([[TextFunctions.shingleHashes]]), not strings: equal strings hash
    * equal on both sides, so the semi-join and the distinct count are
    * unchanged (64-bit collisions negligible), while shingling never
    * materializes a string and the shuffle keys are 8 bytes.
    *
    * `n` defaults to 4 here because the synthetic fixture's vocabulary is
    * tiny; production decontamination typically uses 8-13-gram overlap. */
  def contaminated(corpus: DataFrame, benchmark: DataFrame, n: Int = 4,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    def shingles(df: DataFrame): DataFrame =
      df.select(col(idCol),
        explode(TextFunctions.shingleHashes(col(textCol), n)).as("g"))
    val benchShingles = shingles(benchmark).select(col("g")).distinct()
    shingles(corpus)
      .join(benchShingles, "g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_shingles"))
  }
}
