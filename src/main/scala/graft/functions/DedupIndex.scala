package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED MinHash-LSH dedup index — incremental fuzzy dedup across
  * ingest generations, the batch sibling of
  * [[graft.streaming.StreamingDedup]] and the dedup analogue of
  * [[Similarity.writeIvfIndex]]'s write-once/append-forever story.
  *
  * At 100 TB the corpus is not re-scanned per ingest: signatures and band
  * buckets are computed ONCE per document and persisted as a parquet
  * layout; a daily delta then
  *  1. computes its own signatures (cost ∝ delta),
  *  2. equi-joins its band buckets against the stored entries — with the
  *     delta as the SMALL side, AQE plans a broadcast-hash join, so the
  *     index is scanned once, never shuffled, per ingest —
  *  3. appends its entries, becoming part of the corpus the next delta
  *     dedups against.
  *
  * Parameters (shingle width, signature width, band count) are pinned in a
  * meta table at [[write]] time and every later call derives them from
  * there — an appended generation can never drift to a different banding
  * scheme than the corpus it joins against (signatures of different widths
  * would silently estimate garbage agreement).
  *
  * Layout:
  * {{{
  *   path/meta/     one row: (shingle_n, k, bands)
  *   path/entries/  (band, bucket, doc_id, sig) partitioned by gen
  *                  — bands × |corpus| rows; one partition per ingest
  *                  generation, so a RETRIED generation overwrites ITS OWN
  *                  partition (dynamic partition overwrite) instead of
  *                  double-appending — the idempotence a streaming ingest
  *                  needs ([[ingestStream]]).
  * }}}
  */
object DedupIndex {

  private def entries(docs: DataFrame, shingleN: Int, k: Int, bands: Int,
                      idCol: String, textCol: String): DataFrame =
    Dedup.minhashSignatures(docs, shingleN, k, idCol, textCol)
      .select(col(idCol).as("doc_id"), col("sig"),
        explode(Dedup.lshBandKeys(col("sig"), k, bands)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
        col("doc_id"), col("sig"))

  /** Build the index: pin the parameters, persist one (band, bucket,
    * doc_id, sig) row per document band. Overwrites any prior index at
    * `path`. */
  def write(docs: DataFrame, path: String, shingleN: Int = 3, k: Int = 32,
            bands: Int = 8, idCol: String = "doc_id",
            textCol: String = "text",
            updateCatalog: Boolean = true): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((shingleN, k, bands)).toDF("shingle_n", "k", "bands")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
    // base corpus is gen −1: streaming batchIds start at 0, and an ingest
    // stream's first replayed batch must overwrite ITS OWN partition,
    // never the base
    entries(docs, shingleN, k, bands, idCol, textCol)
      .withColumn("gen", lit(-1L))
      .write.mode("overwrite").partitionBy("gen")
      .parquet(s"$path/entries")
    // self-describe at the index root: the pinned parameters become
    // discoverable documentation (the authoritative copy stays in meta/)
    if (updateCatalog)
      graft.plans.GraftCatalog.describeArtifact(spark, path, "dedup-index",
        Map("shingleN" -> shingleN.toString, "k" -> k.toString,
          "bands" -> bands.toString, "idCol" -> idCol,
          "textCol" -> textCol))
  }

  private def readMeta(spark: SparkSession, path: String): (Int, Int, Int) = {
    val m = spark.read.parquet(s"$path/meta").head()
    (m.getInt(0), m.getInt(1), m.getInt(2))
  }

  /** Append a new generation's entries under the PINNED parameters — cost
    * ∝ delta, one narrow signature pass + a partitioned write. Run
    * [[newPairs]] first if the generation should be dedup-gated before it
    * joins the corpus.
    *
    * `gen` identifies the generation partition. The default (−1) assigns
    * max-existing + 1 (a partition-listing read, no row data). Passing an
    * EXPLICIT gen makes the call IDEMPOTENT: the write runs in dynamic
    * partition-overwrite mode, so re-running the same generation (a
    * failed-ingest retry, a streaming micro-batch replay) replaces its own
    * partition instead of double-appending — exactly-once index
    * maintenance without a transaction log. */
  def append(newDocs: DataFrame, path: String, idCol: String = "doc_id",
             textCol: String = "text", gen: Long = -1L): Unit = {
    val spark = newDocs.sparkSession
    val (shingleN, k, bands) = readMeta(spark, path)
    val g =
      if (gen >= 0) gen
      else spark.read.parquet(s"$path/entries")
        // partition-value inference may type `gen` int or long; pin long
        .agg(max(col("gen").cast("long"))).head().getLong(0) + 1L
    entries(newDocs, shingleN, k, bands, idCol, textCol)
      .withColumn("gen", lit(g))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("gen")
      .parquet(s"$path/entries")
  }

  /** Streaming ingest against the persisted index — the production shape
    * of dedup-at-ingest when the history lives in the INDEX rather than in
    * streaming state (the stream-static sibling of
    * [[graft.streaming.StreamingDedup]], which keeps its buckets in the
    * state store): per micro-batch, (1) [[newPairs]] flags the batch's
    * near-dups against every prior generation AND batch-internal pairs,
    * (2) `onPairs` consumes them (gate, quarantine, metric), (3) the batch
    * [[append]]s under `gen = batchId` — so a REPLAYED batch overwrites
    * its own partition and re-derives byte-identical pairs (its stored
    * self-entries share doc_ids with the replay and self-pairs are
    * excluded; estimates dedup through newPairs' pair-level groupBy):
    * end-to-end idempotent under the engine's at-least-once foreachBatch
    * contract. Returns the writer; caller sets checkpoint/trigger and
    * starts it. */
  def ingestStream(stream: DataFrame, path: String,
                   threshold: Double = 0.5, maxBucketSize: Int = 0,
                   idCol: String = "doc_id", textCol: String = "text")
                  (onPairs: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onPairs(
        newPairs(batch, path, threshold, maxBucketSize, idCol, textCol),
        batchId)
      append(batch, path, idCol, textCol, gen = batchId)
    }

  /** Near-duplicate pairs INVOLVING the delta: delta↔corpus pairs plus
    * delta-internal pairs, with the same estimate and threshold semantics
    * as [[Dedup.minhashCandidates]] — proven in DedupIndexSpec:
    * `minhashCandidates(old ∪ delta)` == `minhashCandidates(old)` ∪
    * `newPairs(delta)` exactly, estimates included. Corpus-internal pairs
    * are deliberately NOT re-derived (they were the previous generations'
    * ingest question).
    *
    * Join shape: stored entries stream out of the scan into the bucket
    * equi-join with the delta side (small → broadcast under AQE); the only
    * wide state is candidate pairs. `maxBucketSize` drops oversized
    * COMBINED buckets, the [[Dedup.minhashCandidates]] cap semantics
    * applied to the union — one template band shared by the corpus can't
    * go quadratic against a delta that re-ships it. Self-pairs (a re-
    * ingested doc_id meeting its stored self) are excluded. */
  def newPairs(newDocs: DataFrame, path: String, threshold: Double = 0.5,
               maxBucketSize: Int = 0, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val spark = newDocs.sparkSession
    val (shingleN, k, bands) = readMeta(spark, path)
    // The delta's signature pipeline (shingle + minhash + band explode)
    // feeds SIX branches of this plan (cap keys, stored semi-join, keep,
    // the union, and both sides of the pair join) — without
    // materialization Spark recomputes it per branch. It is delta-sized
    // (one ingest batch, never the corpus), so checkpoint it once
    // (guide §5: reuse beats recompute when the reused thing is small
    // and the recompute is a whole scan+aggregate pipeline).
    val delta = entries(newDocs, shingleN, k, bands, idCol, textCol)
      .withColumn("is_new", lit(true))
      .localCheckpoint()
    val stored = spark.read.parquet(s"$path/entries")
      .drop("gen")
      .withColumn("is_new", lit(false))
    val all = stored.unionByName(delta)
    val pruned =
      if (maxBucketSize <= 0) all
      else {
        // The cap decision only needs combined (stored + delta) counts for
        // buckets the DELTA touches: an untouched bucket can never produce
        // a pair (the a-side below requires is_new), so windowing the full
        // stored∪delta union — which would hash-exchange every persisted
        // entry, O(corpus), on every ingest — is pure waste. Instead:
        // count each side per touched bucket (the stored side is first
        // semi-joined down to the delta's bucket keys via a BROADCAST, so
        // the index is scanned, never shuffled — only band/bucket columns
        // are read and only count partials cross the wire), then keep the
        // buckets whose combined size clears the cap. Within a touched
        // bucket the semi-join retains every stored row, so the combined
        // count — and therefore which rows survive — is IDENTICAL to the
        // windowed form (DedupIndexSpec's cap-identity test pins this).
        val deltaKeys = delta.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__dn"))
        val storedCounts = stored
          .join(broadcast(deltaKeys.select(col("band"), col("bucket"))),
            Seq("band", "bucket"), "left_semi")
          .groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__sn"))
        val keep = deltaKeys
          .join(storedCounts, Seq("band", "bucket"), "left_outer")
          .filter(col("__dn") + coalesce(col("__sn"), lit(0L)) <= maxBucketSize)
          .select(col("band"), col("bucket"))
        all.join(broadcast(keep), Seq("band", "bucket"), "left_semi")
      }
    val a = pruned.filter(col("is_new")).as("a")
    val b = pruned.as("b")
    val est = graft.functions.expressions.VectorExpressions
      .agreementNative(col("a.sig"), col("b.sig"))
    // delta×all join; a delta-delta pair would otherwise appear twice
    // (once from each side's is_new leg), so the new-new case is ordered
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") =!= col("b.doc_id") &&
        (!col("b.is_new") || col("a.doc_id") < col("b.doc_id")))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        est.as("est_jaccard"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }
}
