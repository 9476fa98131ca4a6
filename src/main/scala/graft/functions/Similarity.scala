package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, per the standard ANN playbook:
  *  - brute-force cosine top-k — the exact baseline; queries are broadcast,
  *    so the corpus side streams through scan-local with no shuffle of the
  *    big table (this is the shape that survives 100 TB: cost is
  *    |corpus| × |queries|, never corpus × corpus);
  *  - random-hyperplane LSH bucketing — the scale path: corpus and queries
  *    hash to sign-pattern buckets, candidates are bucket-local.
  * All vector math is zip_with/aggregate over the array column (JVM
  * higher-order functions, computed in double).
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn).otherwise(lit(0.0))
  }

  /** Exact top-k neighbours for each query vector. `queries` must be small
    * (it is broadcast); ties break on corpus id for determinism. Top-k per
    * query uses a keyed window — shuffles only the (query × corpus) scored
    * pairs, already filtered to k by partial sort within partitions. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // --- random-hyperplane LSH ------------------------------------------------

  /** Deterministic pseudo-random hyperplane component for (plane j, dim i):
    * ±1 by the parity of a fixed integer hash. Public splitmix64 constants. */
  private def planeSign(j: Int, i: Column): Column = {
    val mixed = (i + lit(j.toLong * 0x9E3779B97F4A7C15L))
      .bitwiseXOR(lit(0xBF58476D1CE4E5B9L))
    when(pmod(mixed, lit(2L)) === 0L, lit(1.0)).otherwise(lit(-1.0))
  }

  /** Sign bit of `vec · plane_j` using index-addressed aggregation. */
  private def planeBit(vec: Column, j: Int): Column = {
    val d = aggregate(
      zip_with(vec, sequence(lit(0L), size(vec).cast("long") - 1L),
        (x, i) => x.cast("double") * planeSign(j, i)),
      lit(0.0), (acc, v) => acc + v)
    when(d >= 0, lit(1L << j)).otherwise(lit(0L))
  }

  /** LSH bucket id from `nPlanes` hyperplane sign bits. */
  def lshBucket(vec: Column, nPlanes: Int = 8): Column =
    (0 until nPlanes).map(j => planeBit(vec, j))
      .reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k: bucket corpus and queries with the same hyperplanes, join
    * bucket-locally, rank within the candidate set. Recall < 1 by design;
    * the bucket join replaces the full-corpus scan with a hash lookup. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 8, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") && c("bucket") === q("bucket"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
