package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
  * SimHash. All are expressed as declarative plans whose only shuffles are
  * on dedup keys / LSH buckets, so they scale out: no driver-side state, no
  * cross-product except within candidate buckets.
  */
object Dedup {

  /** Exact dedup stats per group: hash-groupBy on a content digest.
    * At 100 TB this is one shuffle on md5(text) — the canonical exact-dedup
    * plan. */
  def exactStats(docs: DataFrame, groupCol: String = "source"): DataFrame =
    docs
      .select(col(groupCol), md5(col("text")).as("content_hash"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("content_hash")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("content_hash"))).as("n_dups"))

  /** Exact dedup: keep one representative (lowest id) per distinct text. */
  def exact(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text"))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // --- n-gram Jaccard -------------------------------------------------------

  /** Distinct word n-gram set per document. */
  def ngramSet(text: Column, n: Int): Column =
    array_distinct(TextFunctions.tokenShingles(text, n))

  /** Exact pairwise Jaccard over word n-grams, restricted to pairs within
    * `blockCol` (blocking keeps the candidate space linear — the unblocked
    * cross product is exactly what does NOT scale; callers needing global
    * pairs should go through MinHash LSH below). */
  def ngramJaccardPairs(docs: DataFrame, n: Int,
                        blockCol: String = "source"): DataFrame = {
    val withSets = docs.select(
      col("doc_id"), col(blockCol).as("block"),
      ngramSet(col("text"), n).as("ngrams"))
    val a = withSets.as("a")
    val b = withSets.as("b")
    a.join(b, col("a.block") === col("b.block") &&
             col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.block").as("block"),
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        jaccard(col("a.ngrams"), col("b.ngrams")).as("jaccard"))
  }

  /** |A ∩ B| / |A ∪ B| via |A|+|B|-|A∩B| (avoids a union materialization and
    * matches integer-exact semantics in any engine). Inputs must be
    * distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  // --- MinHash + LSH --------------------------------------------------------

  /** Universal-hash parameters: h_i(x) = (a_i*x + b_i) wrapped mod 2^64 then
    * folded positive. Constants derive from splitmix64-style odd multipliers
    * — fixed, deterministic, public. */
  private def perm(h: Column, i: Int): Column = {
    val a = 0x9E3779B97F4A7C15L * (2L * i + 1)
    val b = 0xBF58476D1CE4E5B9L * (i + 1)
    // wrapping overflow is fine for hashing; abs() folds to non-negative
    abs(h * lit(a) + lit(b))
  }

  /** k-wide MinHash signature from a distinct shingle-hash array.
    * Scan-local: one aggregate() per hash function, no shuffle. */
  def minhashSignature(shingleHashes: Column, k: Int): Column =
    when(size(shingleHashes) > 0,
      array((0 until k).map { i =>
        aggregate(shingleHashes, lit(Long.MaxValue),
          (acc, h) => least(acc, perm(h, i)))
      }: _*))
      .otherwise(array((0 until k).map(i => lit(-1L - i)): _*))

  /** LSH band keys: signature split into `bands` bands of `k/bands` rows,
    * each band hashed to one bucket key. */
  def lshBandKeys(signature: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    array((0 until bands).map { bIdx =>
      struct(
        lit(bIdx).as("band"),
        xxhash64(concat_ws(",",
          (0 until rows).map(r => element_at(signature, bIdx * rows + r + 1)): _*))
          .as("bucket"))
    }: _*)
  }

  /** MinHash-LSH near-duplicate candidate pairs with estimated Jaccard.
    *
    * Plan shape (the scalable shape): per-doc signature (narrow) → explode
    * bands (×bands) → shuffle on (band, bucket) → within-bucket self-join →
    * distinct pairs → signature-agreement estimate. The only join is
    * bucket-local; skewed mega-buckets should be capped upstream by salting
    * or bucket-size limits at real scale.
    */
  def minhashCandidates(docs: DataFrame, shingleN: Int = 3, k: Int = 32,
                        bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val signed = docs.select(
      col("doc_id"),
      minhashSignature(
        TextFunctions.shingleHashes(col("text"), shingleN), k).as("sig"))
    val exploded = signed
      .select(col("doc_id"), col("sig"),
        explode(lshBandKeys(col("sig"), k, bands)).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    val est = size(filter(
      zip_with(col("a.sig"), col("b.sig"), (x, y) => (x === y).cast("int")),
      v => v === 1)).cast("double") / lit(k.toDouble)
    a.join(b, col("a.band") === col("b.band") &&
             col("a.bucket") === col("b.bucket") &&
             col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        est.as("est_jaccard"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  // --- SimHash --------------------------------------------------------------

  /** 64-bit SimHash from token hashes: per-bit majority vote over xxhash64
    * of each token, built entirely from column expressions (no UDF). The 64
    * per-bit vote subtrees share the token-hash subexpression via Spark's
    * subexpression elimination. */
  def simhash(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text), w => xxhash64(w))
    val n = size(hashes)
    (0 until 64).map { j =>
      val mask = 1L << j
      val ones = size(filter(hashes, h => h.bitwiseAND(lit(mask)) =!= 0L))
      when(ones * 2 > n, lit(mask)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit simhashes (popcount via bit_count). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within a blocking column, at most `maxDistance`
    * differing bits. */
  def simhashPairs(docs: DataFrame, maxDistance: Int = 16,
                   blockCol: String = "source"): DataFrame = {
    val hashed = docs.select(col("doc_id"), col(blockCol).as("block"),
      simhash(col("text")).as("sh"))
    val a = hashed.as("a")
    val b = hashed.as("b")
    a.join(b, col("a.block") === col("b.block") &&
             col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hammingDistance(col("a.sh"), col("b.sh")).as("hamming"))
      .filter(col("hamming") <= maxDistance)
  }
}
