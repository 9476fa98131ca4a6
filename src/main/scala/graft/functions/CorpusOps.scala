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

  /** Scale path for [[contaminated]]: identical result, Bloom-prefiltered
    * shuffle. [[contaminated]]'s semi-join shuffles EVERY corpus shingle —
    * at 100 TB that exchange (corpus tokens × 8 bytes) dominates, even
    * though almost no shingle matches. Here a Bloom filter over the
    * benchmark's shingle hashes (benchmark = dimension-sized, the filter is
    * ~1.2 MB/M shingles at 1 % fpp) is built distributed and probed
    * scan-locally by a codegen'd predicate, so clean shingles drop inside
    * the scan stage and only candidates — true matches plus the fpp
    * fraction — pay the shuffle. The exact join on survivors then removes
    * Bloom false positives, which is what keeps the output equal to
    * [[contaminated]] (same oracle) rather than approximately equal.
    *
    * Costs one extra pass over the benchmark side (a scan-local shingle
    * tally to size the filter, then the distributed build), the same trade
    * Spark's own injected runtime filters make. The size pass deliberately
    * uses the TOTAL shingle count — an upper bound on the distinct count —
    * so it needs no shuffle; a Bloom filter sized above its true
    * cardinality only gets a lower fpp. */
  def contaminatedBloom(corpus: DataFrame, benchmark: DataFrame, n: Int = 4,
                        fpp: Double = 0.01,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    def shingles(df: DataFrame): DataFrame =
      df.select(col(idCol),
        explode(TextFunctions.shingleHashes(col(textCol), n)).as("g"))
    val benchShingles = shingles(benchmark).select(col("g")).distinct()
    val upperBound = benchmark
      .select(greatest(size(TextFunctions.shingleHashes(col(textCol), n)),
        lit(0)).as("ns"))
      .agg(coalesce(sum(col("ns")), lit(0L))).first().getLong(0)
    val filter = Bloom.build(benchShingles, "g",
      expectedItems = upperBound, fpp = fpp)
    shingles(corpus)
      .filter(Bloom.mightContain(filter, col("g")))
      .join(benchShingles, "g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_shingles"))
  }

  /** Chunk each document into fixed-size token windows with `overlap`
    * tokens of context carried between consecutive chunks — the unit a
    * training pipeline embeds or packs into sequences. Scan-local: one
    * explode per document (row count grows by ~n_tokens/stride, data
    * volume by ~1 + overlap/size), no shuffle; the chunk text is rebuilt
    * with `slice` + `array_join` (codegen'd collection ops, no HOFs).
    * Output: (…, chunk_idx, chunk_text, chunk_tokens); `chunk_idx` is
    * 0-based and deterministic, so chunks are stable keys for downstream
    * embedding caches. A final short window is kept (minimum 1 token) —
    * dropping tails would silently lose corpus mass. */
  def chunkTokens(docs: DataFrame, chunkSize: Int, overlap: Int = 0,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(chunkSize >= 1, s"chunk size must be >= 1 (got $chunkSize)")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize) (got $overlap of $chunkSize)")
    val stride = chunkSize - overlap
    val toks = TextFunctions.tokens(col(textCol))
    val nChunks = greatest(lit(1),
      ceil((size(toks) - lit(overlap)).cast("double") / lit(stride)).cast("int"))
    docs
      .withColumn("__toks", toks)
      .withColumn("chunk_idx",
        explode(sequence(lit(0), nChunks - lit(1))))
      .withColumn("__chunk",
        slice(col("__toks"), col("chunk_idx") * lit(stride) + lit(1),
          lit(chunkSize)))
      .withColumn("chunk_text", array_join(col("__chunk"), " "))
      .withColumn("chunk_tokens", size(col("__chunk")))
      .drop("__toks", "__chunk", textCol)
  }

  /** Greedy contiguous sequence packing at whole-chunk granularity: chunks
    * (ordered by (idCol, chunk_idx) within each `groupCol`) are laid
    * end-to-end and cut into sequences of ~`budget` tokens — a chunk whose
    * START offset crosses a budget boundary opens the next sequence, so a
    * sequence can overrun by at most one chunk. This is the concat-and-
    * split pack every training pipeline runs before batching.
    *
    * Scale shape: ONE window keyed by `groupCol` (running token sum is
    * partition-local per group — never a global single-partition window);
    * assignment is pure arithmetic on the running sum, so packing is
    * deterministic and reproducible across re-runs. */
  def packSequences(chunks: DataFrame, budget: Int,
                    groupCol: String = "source",
                    idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1 (got $budget)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(idCol), col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("__end", sum(col("chunk_tokens")).over(w))
      .withColumn("seq_id",
        ((col("__end") - col("chunk_tokens")) / lit(budget))
          .cast("long"))
      .drop("__end")
  }

  /** Deterministic weighted sampling per group (the training-mix operator:
    * "keep 30% of crawl, 100% of wiki"): a document survives iff its
    * content-hash bucket (0-99) falls below its group's percentage.
    * Content-keyed like [[withSplit]] — re-ingestion keeps the same
    * sample — and engine-portable for the oracle. Weights absent from the
    * map default to keep-all. Scan-local filter; at 100 TB this is a
    * narrow pass that never shuffles. */
  def sampleWeighted(docs: DataFrame, weights: Map[String, Int],
                     groupCol: String = "source",
                     contentCol: String = "text"): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 100),
      "weights are integer percentages in [0, 100]")
    val pct = weights.foldLeft(lit(100): Column) { case (acc, (g, w)) =>
      when(col(groupCol) === g, lit(w)).otherwise(acc)
    }
    docs.filter(hashBucket(col(contentCol)) < pct)
  }

  /** Exact-k WEIGHTED sample without replacement (Efraimidis & Spirakis
    * 2006, "Weighted random sampling with a reservoir" — public paper):
    * precisely `k` documents drawn with per-document inclusion pressure
    * proportional to `weightCol` — the coreset/curriculum operator
    * ("keep the 100k highest-leverage documents, weighted by quality
    * score") that neither the rate-based [[sampleWeighted]] (group
    * percentages, count only in expectation) nor the unweighted
    * [[sampleStratifiedExact]] expresses.
    *
    * The E-S key: with u ~ Uniform(0,1), taking the top k by `u^(1/w)` —
    * equivalently the MINIMUM k by `−ln(u)/w`, the fixed-point-friendly
    * form used here — yields exactly the weighted-without-replacement
    * distribution. `u` derives from the content hash (md5 first 8 hex
    * digits, +0.5 to dodge the endpoints), so the draw is deterministic,
    * reproducible under re-ingestion, and engine-portable for the
    * oracle — same policy as [[withSplit]]/[[sampleWeighted]].
    *
    * Plan shape: a scan-local key projection + TakeOrdered(k) — no full
    * sort, no shuffle beyond the top-k reduction; driver state is k rows
    * by construction. Rows with NULL id/content and non-positive/NULL
    * weights are EXCLUDED (a zero-weight item has zero inclusion
    * probability; the E-S key is undefined there, and a NULL content hash
    * would yield a NULL key that sorts FIRST — winning the draw — under
    * the ascending order). Same policy as the streaming twin
    * [[graft.streaming.StreamingSample.weightedK]]. Output: the sampled
    * rows + `es_key` (ascending = draw order, a total order via the id
    * tiebreak). */
  def sampleWeightedK(docs: DataFrame, k: Int,
                      weightCol: String,
                      idCol: String = "doc_id",
                      contentCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val u = (conv(substring(md5(col(contentCol)), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    docs.filter(col(idCol).isNotNull && col(contentCol).isNotNull &&
        col(weightCol).isNotNull &&
        col(weightCol).cast("double") > 0)
      .withColumn("es_key",
        -log(u) / col(weightCol).cast("double"))
      .orderBy(col("es_key").asc, col(idCol).asc)
      .limit(k)
  }

  /** Exact-count stratified sample: precisely `n` documents per stratum
    * (fewer only when the stratum is smaller), chosen by content-hash order
    * — the allocation a balanced eval set needs, where rate-based sampling
    * ([[sampleWeighted]]) only hits the target in expectation. Hash order
    * makes the pick reproducible under re-ingestion AND unbiased by any
    * storage order. One shuffle on the stratum; the per-stratum sort is
    * rank-limited (WindowGroupLimit pushes n into the sort), never a global
    * sort. Output keeps `pick_order` (1..n within the stratum). */
  def sampleStratifiedExact(docs: DataFrame, n: Int,
                            stratumCol: String = "lang",
                            idCol: String = "doc_id",
                            contentCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be >= 1 (got $n)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(conv(substring(md5(col(contentCol)), 1, 8), 16, 10)
        .cast("long").asc, col(idCol).asc)
    docs.withColumn("pick_order", row_number().over(w).cast("long"))
      .filter(col("pick_order") <= n)
  }

  /** Top-`k` terms per document by tf-idf (smoothed idf:
    * ln((N+1)/(df+1))). Three keyed shuffles regardless of corpus size —
    * tf on (doc, term), df on term, the top-k window on doc — with the
    * corpus size N riding along as a 1-row broadcast. Ties break by term
    * (total order, deterministic). Whitespace tokenization matches the
    * rest of the text surface ([[TextFunctions.tokens]]). */
  def tfIdfTopK(docs: DataFrame, k: Int,
                idCol: String = "doc_id",
                contentCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(contentCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = toks.groupBy(col("term"))
      .agg(count_distinct(col(idCol)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"), col("tf"),
        (col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))))
          .as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"))
  }

  /** Temperature-smoothed source mixing — the multilingual/multi-source
    * rebalancing curve (sampling exponent alpha, e.g. XLM-R's 0.3-0.7
    * range): each source keeps p_s = (n_min/n_s)^(1-alpha) of its
    * documents, so the smallest source keeps everything and a source 100×
    * larger keeps 10% at alpha=0.5 — flattening the head without starving
    * the tail the way uniform capping would.
    *
    * Deterministic like [[sampleWeighted]]: a document survives iff its
    * content-hash bucket (0..1e6) clears its source's threshold, so the
    * mix is reproducible under re-ingestion and engine-portable for the
    * oracle. Source counts are ONE tiny aggregate broadcast back; the keep
    * decision itself is scan-local (no shuffle of the corpus).
    *
    * alpha=0.5 routes through `sqrt` (IEEE correctly-rounded in every
    * engine, so thresholds replay bit-identically); other alphas use `pow`,
    * where the last ulp is engine-dependent — fine in production, but an
    * exact cross-engine replay should stick to 0.5.
    *
    * Rows with a NULL `groupCol` are EXCLUDED from the sample — stated
    * policy, not a join accident: a null source has no size to balance
    * against (and an equi-join on a null key would drop it silently
    * anyway). Map nulls to a sentinel source upstream to keep them. */
  def sampleTemperature(docs: DataFrame, alpha: Double = 0.5,
                        groupCol: String = "source",
                        contentCol: String = "text"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1] (got $alpha)")
    val grouped = docs.filter(col(groupCol).isNotNull)
    val counts = grouped.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__n_min"))
    val ratio = col("__n_min").cast("double") / col("__n").cast("double")
    val p = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    grouped
      .join(broadcast(counts), groupCol)
      .crossJoin(broadcast(nMin))
      .filter(hashBucket(col(contentCol), 1000000) <
        floor(lit(1000000.0) * p).cast("long"))
      .drop("__n", "__n_min")
  }

  /** Corpus-wide repeated-passage removal — the C4 / RefinedWeb line-dedup
    * step, adapted to this corpus (no newlines, so the unit is a
    * fixed-`width` non-overlapping token window): any segment whose text
    * occurs in more than `maxDf` distinct documents is dropped from EVERY
    * document, and each document is rebuilt from its surviving segments in
    * original order. This removes boilerplate (headers, license blocks,
    * navigation chrome) that document-level dedup can never see.
    *
    * Scale shape, in passes over the corpus:
    *  1. frequency: explode to (md5(segment), doc) and count distinct docs
    *     per segment hash — ONE shuffle whose rows are two ids (the text
    *     itself never rides; md5 keeps the oracle engine-portable like
    *     [[withSplit]]).
    *  2. the frequent set (df > maxDf) is boilerplate by definition —
    *     orders of magnitude smaller than the corpus — so it comes back as
    *     a BROADCAST hash join against the exploded segments; clean
    *     segments never shuffle for the membership test.
    *  3. rebuild: one groupBy(doc) shuffle keyed by the doc id carrying
    *     (pos, segment) — linear in corpus size, the unavoidable pass that
    *     reassembles text (the same shape the original C4 pipeline used).
    * No step is quadratic and nothing collects to the driver.
    *
    * Output: (idCol, clean_text, n_kept, n_total); a document whose every
    * segment was dropped survives with clean_text = ''. */
  def dropRepeatedSegments(docs: DataFrame, width: Int = 10, maxDf: Int = 2,
                           idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    require(width >= 1, s"segment width must be >= 1 (got $width)")
    require(maxDf >= 1, s"maxDf must be >= 1 (got $maxDf)")
    val toks = TextFunctions.tokens(col(textCol))
    // ceil(n_tokens/width) segments, minimum 1 (sequence(0,-1) would step
    // DOWN and fabricate a phantom segment for empty text)
    val nSegs = greatest(
      ceil(size(toks).cast("double") / lit(width)).cast("int"), lit(1))
    // explode positions FIRST, slice per row after: slice/array_join are
    // codegen'd collection ops, where a transform(sequence(...), i -> …)
    // lambda would run interpreted on the corpus-wide hot path (the same
    // trap the shingle builder hit in round 2)
    val segs = docs
      .withColumn("__toks", toks)
      .withColumn("__pos", explode(sequence(lit(0), nSegs - lit(1))))
      .select(col(idCol), col("__pos"),
        array_join(slice(col("__toks"), col("__pos") * width + lit(1),
          lit(width)), " ").as("__seg"))
    val frequent = segs
      .groupBy(md5(col("__seg")).as("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDf)
      .select("__h")
    // no broadcast HINT: the frequent set is boilerplate-sized in any sane
    // corpus and AQE promotes the join to a broadcast at runtime from its
    // OBSERVED size — where a forced broadcast would OOM the driver on a
    // pathological corpus whose every segment repeats, this degrades to a
    // shuffle join instead
    segs
      .join(frequent, md5(col("__seg")) === col("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        // collect_list skips nulls, so dropped segments vanish before the
        // sort; __pos is unique per doc → array_sort is a total order
        array_join(transform(
          array_sort(collect_list(
            when(col("__h").isNull, struct(col("__pos"), col("__seg"))))),
          s => s("__seg")), " ").as("clean_text"),
        count(when(col("__h").isNull, lit(1))).as("n_kept"),
        count(lit(1)).as("n_total"))
  }

  /** Deterministic global shuffle + sharding — the training-reader layout
    * step: each epoch wants the corpus in a fresh pseudo-random order,
    * reproducible across reruns and engines, cut into `nShards` pieces a
    * 1000-reader job can consume independently. A salted content hash
    * drives BOTH the shard assignment (first 8 hex digits, mod nShards —
    * hash-uniform, so shards are balanced by construction) and the order
    * within the shard (full digest, id tie-break for duplicate texts).
    * ONE keyed exchange: the per-shard rank window; size nShards so one
    * shard's sort fits a task (at 100 TB that is thousands of shards, each
    * tens of GB). Changing `epoch` reshuffles everything deterministically.
    * md5 (not xxhash64) keeps the assignment engine-portable. */
  def shuffleShard(docs: DataFrame, nShards: Int, epoch: Int = 0,
                   contentCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1 (got $nShards)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    docs
      .withColumn("__h", saltedHash(epoch, contentCol))
      .withColumn("shard", shardOf(col("__h"), nShards))
      .withColumn("ord", row_number().over(w))
      .drop("__h")
  }

  /** Cleaning-waterfall ATTRITION: attribute every document to the FIRST
    * pipeline stage that drops it — the per-stage loss table every corpus
    * curation report publishes (how many documents and tokens each filter
    * costs), computed in the same pass order the cleaning pipeline
    * actually applies (quality gate → language agreement → exact dedup):
    *
    *  - `quality`: failed the quality floor;
    *  - `lang`:    passed quality but language-ID disagreed with the tag;
    *  - `dedup`:   passed both but an earlier-id survivor has identical
    *               text (the duplicate THAT WOULD BE dropped — the kept
    *               representative stays `kept`);
    *  - `kept`:    survives the full pipeline.
    *
    * Output: (source, stage, n_docs, total_bpe_tokens) — tokens priced
    * with the same BPE estimate the budget operators use, so "tokens lost
    * to each stage" reads in budget units.
    *
    * Plan shape: scoring is scan-local; dedup attribution is ONE window
    * over md5(text) (count of earlier survivors in the same text group —
    * no self-join, no union rewrite of the scan); then one
    * partial-aggregated groupBy. Nothing data-sized leaves the executors,
    * and the md5 keying matches [[graft.functions.Dedup.exact]], so the
    * `kept` rows are EXACTLY the pipeline's output (asserted in
    * CorpusOpsSpec). */
  def cleanAttrition(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val scored = docs.select(
      col("doc_id"), col("source"), col("lang"), col("text"),
      TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"),
      TextFunctions.langId(col("text")).as("pred_lang"))
    val survivor = col("quality") >= minQuality &&
      col("pred_lang") === col("lang")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    scored
      .withColumn("__prev_survivors",
        count(when(survivor, lit(1))).over(w))
      .withColumn("stage",
        when(col("quality") < minQuality, lit("quality"))
          .when(col("pred_lang") =!= col("lang"), lit("lang"))
          .when(col("__prev_survivors") > 0, lit("dedup"))
          .otherwise(lit("kept")))
      .groupBy(col("source"), col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.bpeTokenEstimate(col("text")))
          .as("total_bpe_tokens"))
  }

  /** Salted content digest + shard assignment shared by [[shuffleShard]]
    * and [[shardManifest]] — same formula, so a manifest always describes
    * the layout the shuffle actually produced. */
  private def saltedHash(epoch: Int, contentCol: String): Column =
    md5(concat_ws(":", lit(epoch.toString), col(contentCol)))
  private def shardOf(h: Column, nShards: Int): Column =
    pmod(conv(substring(h, 1, 8), 16, 10).cast("long"),
      lit(nShards.toLong)).cast("int")

  /** Per-shard manifest for a [[shuffleShard]] layout: document count,
    * token count, and an ORDER-INDEPENDENT content digest (bit_xor of a
    * 60-bit slice of each document's salted md5 — hex digits 17-31, disjoint
    * from the digits the shard and budget operators key on). Two corpora
    * produce identical manifests iff their shards hold the same document
    * multisets, so a reader fleet can verify a re-materialized epoch
    * without comparing documents. Plan: scan-local hashing, ONE exchange
    * (the per-shard partial-aggregated groupBy) — the window in
    * shuffleShard is not needed for the manifest and not paid. */
  def shardManifest(docs: DataFrame, nShards: Int, epoch: Int = 0,
                    contentCol: String = "text"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1 (got $nShards)")
    docs
      .withColumn("__h", saltedHash(epoch, contentCol))
      .select(
        shardOf(col("__h"), nShards).as("shard"),
        TextFunctions.tokenCount(col(contentCol)).cast("long").as("__tok"),
        conv(substring(col("__h"), 17, 15), 16, 10).cast("long").as("__dig"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"),
        expr("bit_xor(__dig)").as("content_digest"))
  }

  /** Token-budget sampling: deterministically keep documents per group —
    * in content-hash order — until the group's token budget is exhausted
    * (the "mix to N tokens per source" recipe step). A document is kept
    * iff the tokens BEFORE it in its group's hash order total less than
    * the budget, so every group overshoots by at most one document.
    *
    * The naive form is a cumulative-sum window over each whole group — one
    * task sorting an entire source at 100 TB. This runs the EXACT same
    * total order (bucket, hash, id) in two phases instead: per-(group,
    * sub-bucket) token sums (a tiny aggregate — groups × `subBuckets`
    * rows) give each bucket's prefix offset via a window over that SMALL
    * frame; buckets that fit wholly under the budget keep every document
    * scan-locally, buckets wholly past it drop scan-locally, and only the
    * one BOUNDARY bucket per group — 1/subBuckets of the data — pays a
    * cumulative-sum window. Prefix-sum decomposition makes the kept set
    * identical to the naive single window (the DuckDB oracle replays that
    * naive form).
    *
    * Rows with a NULL `groupCol` or NULL `contentCol` are EXCLUDED — the
    * same stated policy as [[sampleTemperature]] (a null source has no
    * budget to draw from, and an equi-join on a null key would drop it
    * silently anyway; the explicit filter makes the behavior a contract).
    * Map nulls to a sentinel group upstream to keep them. */
  def sampleTokenBudget(docs: DataFrame, tokensPerGroup: Long,
                        groupCol: String = "source",
                        contentCol: String = "text",
                        idCol: String = "doc_id",
                        subBuckets: Int = 256): DataFrame = {
    require(tokensPerGroup >= 1, s"budget must be >= 1 (got $tokensPerGroup)")
    require(subBuckets >= 1, s"subBuckets must be >= 1 (got $subBuckets)")
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .filter(col(groupCol).isNotNull && col(contentCol).isNotNull)
      .withColumn("__h", md5(col(contentCol)))
      // hex digits 9-16 of md5(content): disjoint from digits 1-8, which
      // hashBucket/withSplit key on over the SAME hash input, so a split
      // decision and a budget decision on one pipeline don't correlate
      .withColumn("__bkt",
        pmod(conv(substring(col("__h"), 9, 8), 16, 10).cast("long"),
          lit(subBuckets.toLong)))
      .withColumn("__tok", TextFunctions.tokenCount(col(contentCol)).cast("long"))
    val perBucket = base.groupBy(col(groupCol), col("__bkt"))
      .agg(sum(col("__tok")).as("__btok"))
    val wSmall = Window.partitionBy(col(groupCol)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixed = perBucket
      .withColumn("__prefix", coalesce(sum(col("__btok")).over(wSmall), lit(0L)))
    val joined = base.join(broadcast(prefixed), Seq(groupCol, "__bkt"))
    // whole bucket under budget: keep scan-locally, no sort anywhere
    val keepAll = joined.filter(col("__prefix") + col("__btok") <= tokensPerGroup)
    // boundary bucket: the only slice that pays a cumulative-sum window
    val wBoundary = Window.partitionBy(col(groupCol), col("__bkt"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = joined
      .filter(col("__prefix") < tokensPerGroup &&
        col("__prefix") + col("__btok") > tokensPerGroup)
      .withColumn("__cum",
        col("__prefix") + coalesce(sum(col("__tok")).over(wBoundary), lit(0L)))
      .filter(col("__cum") < tokensPerGroup)
      .drop("__cum")
    keepAll.unionByName(boundary)
      .withColumnRenamed("__tok", "n_tokens")
      .drop("__h", "__bkt", "__btok", "__prefix")
  }

  /** Overlapping positional word n-grams as (position, space-joined text),
    * one row per window start — the stride-1 sibling of
    * [[dropRepeatedSegments]]'s fixed windows, built the same codegen'd way
    * (explode positions, then `slice` + `array_join` per row; a
    * transform(sequence(...)) lambda would run interpreted on the corpus
    * hot path). Documents shorter than `width` tokens produce no rows. */
  private def positionalNgrams(docs: DataFrame, width: Int,
                               idCol: String, textCol: String,
                               extraCols: Seq[org.apache.spark.sql.Column] = Nil)
      : DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .withColumn("__toks", toks)
      // guard the short-doc case BEFORE sequence(): sequence(0, -1) steps
      // DOWN and would fabricate phantom windows (the dropRepeatedSegments
      // trap)
      .filter(size(col("__toks")) >= width)
      .withColumn("__pos",
        explode(sequence(lit(0), size(col("__toks")) - lit(width))))
      .select(col(idCol) +: col("__pos") +:
        array_join(slice(col("__toks"), col("__pos") + lit(1), lit(width)), " ")
          .as("__gram") +: extraCols: _*)
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
    * 2023): score every raw document by how target-like its hashed n-gram
    * feature distribution is. The importance weight of a document is
    * `sum over its bigram features f of log(p_target(bucket(f)) /
    * p_raw(bucket(f)))` with add-`smoothing` estimates over `nBuckets`
    * hashed buckets; a high weight means "reads like the target corpus".
    * Downstream, select top-weight documents (or Gumbel-resample) to tilt
    * a 100 TB crawl toward a quality/domain target.
    *
    * `isTarget` is a boolean Column over `docs` marking the target slice
    * (e.g. `col("source") === "wiki"`); the target distribution is
    * estimated from it and every document — target rows included — is
    * scored against it.
    *
    * Scale shape, in corpus passes:
    *  1. features: one scan-local explode to overlapping bigrams, bucketed
    *     by md5 (engine-portable, like [[hashBucket]]) — no string ever
    *     shuffles, only (id, bucket).
    *  2. bucket counts for raw AND target come from ONE partial-aggregated
    *     groupBy over those features (`nBuckets`-bounded result), and the
    *     log-ratio table derived from it is a broadcast — the "model" is
    *     nBuckets doubles, never driver-resident data.
    *  3. per-doc weight: broadcast-join features to the ratio table, one
    *     doc-keyed sum (partial-aggregated map-side).
    * Documents with fewer than 2 tokens have no features: they surface
    * with n_feats = 0 and dsir_weight = 0.0 rather than vanishing.
    *
    * Output: (idCol, is_target, n_feats, dsir_weight). */
  def dsirWeights(docs: DataFrame,
                  isTarget: org.apache.spark.sql.Column,
                  nBuckets: Int = 8192, smoothing: Double = 0.5,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1 (got $nBuckets)")
    require(smoothing > 0.0, s"smoothing must be > 0 (got $smoothing)")
    val flagged = docs.withColumn("__tgt", isTarget)
    val feats = positionalNgrams(flagged, 2, idCol, textCol,
        extraCols = Seq(col("__tgt")))
      .select(col(idCol), col("__tgt"),
        pmod(conv(substring(md5(col("__gram")), 1, 8), 16, 10).cast("long"),
          lit(nBuckets.toLong)).as("__bkt"))
    val bucketCounts = feats.groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__raw_n"),
        count(when(col("__tgt"), lit(1))).as("__tgt_n"))
    val totals = bucketCounts.agg(
      sum(col("__raw_n")).as("__raw_total"),
      sum(col("__tgt_n")).as("__tgt_total"))
    val denomShift = lit(smoothing * nBuckets)
    val ratios = bucketCounts.crossJoin(broadcast(totals))
      .select(col("__bkt"),
        (log((col("__tgt_n") + lit(smoothing)) /
            (col("__tgt_total") + denomShift)) -
          log((col("__raw_n") + lit(smoothing)) /
            (col("__raw_total") + denomShift))).as("__lr"))
    val weights = feats
      .join(broadcast(ratios), "__bkt")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__lr")).as("dsir_weight"))
    flagged.select(col(idCol), col("__tgt").as("is_target"))
      .join(weights, Seq(idCol), "left")
      .select(col(idCol), col("is_target"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("dsir_weight"), lit(0.0)).as("dsir_weight"))
  }

  /** Gumbel-top-k importance RESAMPLING over [[dsirWeights]] — the actual
    * selection step of DSIR: drawing k documents WITHOUT replacement with
    * probability proportional to exp(weight / temperature) is exactly
    * taking the k largest values of `weight/temperature + Gumbel noise`
    * (the Gumbel-top-k trick), so the whole draw is one k-bounded
    * TakeOrdered — no sequential sampling state, no global sort.
    *
    * The Gumbel variate is DETERMINISTIC: `g = -ln(-ln(u))` with
    * `u = (h + 0.5) / 2^32` from the first 8 hex digits of a SALTED
    * content md5 (`gumbel:<epoch>:` prefix — an independent hash from the
    * unsalted digits [[hashBucket]]/[[sampleTokenBudget]] key on, so the
    * draw does not correlate with split or budget decisions on the same
    * pipeline, and changing `epoch` redraws). Content-keyed like every
    * sampler here: re-ingestion reproduces the sample, and the same
    * formula replays in the DuckDB oracle. u in (0,1) strictly — the +0.5
    * offset keeps both ln calls finite.
    *
    * `weighted` must carry (idCol, contentCol, weightCol) — join
    * [[dsirWeights]] output back to the documents. Higher `temperature`
    * flattens the draw toward uniform; lower sharpens toward argmax.
    *
    * Output: the k sampled rows of `weighted` plus `sample_key` (the
    * perturbed score the draw ordered on). */
  def dsirResample(weighted: DataFrame, k: Int, temperature: Double = 1.0,
                   epoch: Int = 0,
                   weightCol: String = "dsir_weight",
                   idCol: String = "doc_id",
                   contentCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(temperature > 0.0, s"temperature must be > 0 (got $temperature)")
    val u = (conv(substring(md5(concat_ws(":", lit("gumbel"),
        lit(epoch.toString), col(contentCol))), 1, 8), 16, 10).cast("double")
      + lit(0.5)) / lit(4294967296.0)
    val gumbel = -log(-log(u))
    weighted
      .withColumn("sample_key",
        col(weightCol).cast("double") / lit(temperature) + gumbel)
      .orderBy(col("sample_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** Cross-document repeated-SPAN detection — the shingle approximation of
    * exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better", the suffix-array method): every
    * overlapping `width`-token window whose text occurs in more than one
    * DISTINCT document marks its token positions as repeated, and
    * overlapping/adjacent marked windows merge into maximal spans. Unlike
    * [[dropRepeatedSegments]]'s fixed non-overlapping windows, stride-1
    * windows catch repeats at ANY alignment — a copied sentence starting
    * mid-window is invisible to the segment form but covered here (every
    * repeated run of >= width tokens is found, with at most width-1 tokens
    * of boundary slack vs the true suffix-array answer).
    *
    * Scale shape:
    *  1. positional shingles explode scan-locally; the frequency pass
    *     shuffles only (md5, id) pairs, like [[dropRepeatedSegments]].
    *  2. the repeated-shingle set joins back WITHOUT a broadcast hint: at
    *     df >= 2 over stride-1 windows it is not reliably small, so AQE
    *     promotes from its observed size instead of OOMing the driver.
    *  3. span merge is gaps-and-islands per document: two window passes
    *     over the SAME (doc, position) ordering — Spark plans them in one
    *     exchange, each partition-local and document-sized.
    *
    * Output (integers only, fully hash-stable): (idCol, n_tokens, n_spans,
    * covered_tokens, max_span_len); every input document appears, zeros
    * when nothing repeats. */
  def repeatedSpans(docs: DataFrame, width: Int = 5,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(width >= 1, s"span width must be >= 1 (got $width)")
    import org.apache.spark.sql.expressions.Window
    val grams = positionalNgrams(docs, width, idCol, textCol)
      .select(col(idCol), col("__pos"), md5(col("__gram")).as("__h"))
    val repeated = grams
      .groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= 2)
      .select("__h")
    val marked = grams.join(repeated, "__h")
      .select(col(idCol), col("__pos"))
    // islands: windows [p, p+width-1] merge when the next start is within
    // width of the previous (overlap OR exact adjacency)
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val spans = marked
      .withColumn("__brk",
        when(col("__pos") - lag(col("__pos"), 1).over(byPos) > width, 1)
          .otherwise(0))
      .withColumn("__island", sum(col("__brk"))
        .over(byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__island"))
      .agg((max(col("__pos")) - min(col("__pos")) + lit(width))
        .cast("long").as("__span_len"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("__span_len")).as("covered_tokens"),
        max(col("__span_len")).as("max_span_len"))
    docs.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        coalesce(col("max_span_len"), lit(0L)).as("max_span_len"))
  }

  /** Cross-document repeated-span REMOVAL — the act half of
    * [[repeatedSpans]] (which only measures): every token covered by a
    * stride-1 `width`-gram that occurs in >= 2 distinct documents is
    * dropped from EVERY document, and each document is rebuilt from its
    * surviving tokens in original order. This is the substring-dedup step
    * of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better" — public paper) at shingle resolution: unlike
    * [[dropRepeatedSegments]]'s fixed non-overlapping grid, a copied
    * sentence is caught at ANY alignment, so boilerplate cannot hide by
    * straddling a segment boundary.
    *
    * Scale shape, in passes over the corpus:
    *  1. stride-1 shingles explode scan-locally; the frequency pass
    *     shuffles only (md5, doc_id) pairs (text never rides the wire).
    *  2. the repeated set joins back UNHINTED — AQE promotes to broadcast
    *     from observed size (same policy as [[dropRepeatedSegments]]).
    *  3. marked window starts merge into maximal disjoint islands
    *     (gaps-and-islands, the [[repeatedSpans]] machinery), then
    *     COLLAPSE to one (doc, sorted range array) row per affected doc —
    *     model-thin rows, islands-bounded, never a per-position explode.
    *  4. rebuild is SCAN-LOCAL: the range table left-joins the corpus (the
    *     only operation that touches doc text after the scan — AQE
    *     broadcasts the range side from observed size) and each doc's
    *     surviving text is the concatenation of the gap slices between its
    *     ranges, computed inside the projection. The old shape posexploded
    *     every token, equi-joined (doc, position) against exploded covered
    *     positions, and re-aggregated tokens per doc — two corpus-token
    *     shuffles and a collect_list sort that this form simply deletes
    *     (guide §2.3/§2.4: shuffle range METADATA, not the token stream).
    *
    * Output: (idCol, clean_text, n_kept, n_tokens); every input document
    * appears — untouched docs (and docs shorter than `width`) survive
    * whole, a fully-covered doc survives with clean_text = ''. */
  def stripRepeatedSpans(docs: DataFrame, width: Int = 5,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(width >= 1, s"span width must be >= 1 (got $width)")
    import org.apache.spark.sql.expressions.Window
    val grams = positionalNgrams(docs, width, idCol, textCol)
      .select(col(idCol), col("__pos"), md5(col("__gram")).as("__h"))
    val repeated = grams
      .groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= 2)
      .select("__h")
    // islands merge when consecutive starts are within width (overlap or
    // exact adjacency) — merged spans are disjoint AND non-adjacent; each
    // covered token position lies in exactly one range
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val ranges = grams.join(repeated, "__h")
      .select(col(idCol), col("__pos"))
      .withColumn("__brk",
        when(col("__pos") - lag(col("__pos"), 1).over(byPos) > width, 1)
          .otherwise(0))
      .withColumn("__island", sum(col("__brk"))
        .over(byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // both aggregates cluster by a superset of the window's doc key, so
      // the island merge and the range collapse reuse its exchange
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("__pos")).as("__lo"),
        (max(col("__pos")) + lit(width) - 1).as("__hi"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__lo"), col("__hi"))))
        .as("__ranges"))
    // gap k of a doc spans [prevHi_k + 1, nextLo_k - 1]; slicing the token
    // array over the gaps IS the strip — ranges are in-bounds, sorted,
    // disjoint and non-adjacent, so gap lengths are >= 0 and the slices
    // partition the kept tokens in original order
    val toks = TextFunctions.tokens(col(textCol))
    val rng = coalesce(col("__ranges"),
      array().cast("array<struct<__lo:int,__hi:int>>"))
    val gapStarts = concat(array(lit(0)), transform(rng, r => r("__hi") + lit(1)))
    val gapEnds = concat(transform(rng, r => r("__lo")), array(size(toks)))
    val kept = flatten(zip_with(gapStarts, gapEnds,
      (s, e) => slice(toks, s + lit(1), greatest(e - s, lit(0)))))
    docs.join(ranges, Seq(idCol), "left")
      .select(col(idCol),
        when(toks.isNull, lit("")).otherwise(array_join(kept, " "))
          .as("clean_text"),
        when(toks.isNull, lit(0L)).otherwise(size(kept).cast("long"))
          .as("n_kept"),
        when(toks.isNull, lit(0L)).otherwise(size(toks).cast("long"))
          .as("n_tokens"))
  }

  /** Best-fit sequence packing — the waste-minimizing sibling of
    * [[packSequences]] (cf. Krell et al. 2021, "Efficient Sequence Packing
    * without Cross-contamination", and Ding et al. 2024, "Fewer Truncations
    * Improve Language Modeling" — public papers): where the greedy
    * contiguous pack lays chunks end-to-end (and overruns the budget by up
    * to one chunk), this packs by FIRST-FIT DECREASING, so NO sequence ever
    * exceeds `budget` and the sequence count approaches the
    * ceil(Σtokens/budget) lower bound (FFD's classic 11/9·OPT+1 guarantee;
    * in practice near-optimal when chunks are small against the budget).
    *
    * Scale shape — bin packing is inherently sequential, so the global
    * problem is decomposed into CAPACITY-BOUNDED CELLS and solved exactly
    * inside each:
    *  1. one keyed window ranks chunks per group by (tokens desc, id,
    *     chunk_idx) — the decreasing order FFD wants, with a total
    *     tie-break so cell membership is deterministic;
    *  2. consecutive ranks form cells of `cellSize` chunks; each cell runs
    *     EXACT FFD executor-side (`flatMapGroups` — per-group state is one
    *     remaining-capacity array bounded by cellSize, the legitimate
    *     bounded-memory imperative shape, like the codec `mapPartitions`);
    *  3. no driver state, no global coordination: waste concentrates only
    *     at cell boundaries (≤ one underfilled bin per cell — measured in
    *     CorpusOpsSpec's fill-factor gate).
    * Chunks LARGER than the budget get a singleton sequence each (surfaced,
    * never silently truncated).
    *
    * Output: (groupCol, seq_id, idCol, chunk_idx, chunk_tokens) — the
    * assignment; join back on (idCol, chunk_idx) for payloads. `seq_id` is
    * unique per group (cell · cellSize + bin) but not dense. */
  def packSequencesBestFit(chunks: DataFrame, budget: Int,
                           cellSize: Int = 8192,
                           groupCol: String = "source",
                           idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1 (got $budget)")
    require(cellSize >= 1, s"cell size must be >= 1 (got $cellSize)")
    import org.apache.spark.sql.expressions.Window
    val spark = chunks.sparkSession
    import spark.implicits._
    val base = chunks.select(
      col(groupCol).cast("string").as("g"),
      col(idCol).cast("long").as("d"),
      col("chunk_idx").cast("int").as("ci"),
      col("chunk_tokens").cast("int").as("tk"))
    val w = Window.partitionBy(col("g"))
      .orderBy(col("tk").desc, col("d"), col("ci"))
    val ranked = base.withColumn("cell",
      ((row_number().over(w) - lit(1)) / lit(cellSize)).cast("int"))
    ranked.as[(String, Long, Int, Int, Int)]
      .groupByKey { case (g, _, _, _, cell) => (g, cell) }
      .flatMapGroups { (key: (String, Int), it: Iterator[(String, Long, Int, Int, Int)]) =>
        val (g, cell) = key
        // flatMapGroups gives no row order — re-sort inside the bounded cell
        val items = it.toArray.sortBy { case (_, d, ci, tk, _) => (-tk, d, ci) }
        val rem = scala.collection.mutable.ArrayBuffer.empty[Int]
        items.iterator.map { case (_, d, ci, tk, _) =>
          var b = 0
          while (b < rem.length && rem(b) < tk) b += 1
          if (b == rem.length) rem += (budget - tk).max(0)
          else rem(b) -= tk
          (g, cell.toLong * cellSize + b, d, ci, tk)
        }
      }
      .toDF("g", "seq_id", "d", "ci", "tk")
      .select(col("g").as(groupCol), col("seq_id"), col("d").as(idCol),
        col("ci").as("chunk_idx"), col("tk").as("chunk_tokens"))
  }

  /** Content-defined chunks per document: `(idCol, chunk_hash,
    * chunk_bytes)` via the codegen'd gear-hash CDC kernel
    * ([[graft.functions.expressions.ContentChunks]]). Chunk boundaries
    * follow CONTENT, not offsets, so a near-duplicate with an insertion
    * near the front still shares every chunk after the streams
    * re-synchronize — the storage-style dedup signal that fixed windows
    * ([[dropRepeatedSegments]]) and stride-1 spans ([[repeatedSpans]])
    * complement: CDC is byte-level, alignment-free, and ~len/2^maskBits
    * rows per doc instead of one per token. Scan-local; the explode is
    * the only row amplification. */
  def cdcChunks(docs: DataFrame, maskBits: Int = 5, minBytes: Int = 8,
                maxBytes: Int = 256, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        explode(graft.functions.expressions.TextExpressions
          .contentChunksNative(col(textCol), maskBits, minBytes, maxBytes))
          .as("c"))
      .select(col(idCol), col("c.hash").as("chunk_hash"),
        col("c.n_bytes").as("chunk_bytes"))

  /** Snapshot diff between two corpus generations: per document id,
    * `added` / `removed` / `changed` / `unchanged` — the audit primitive
    * for an incremental pipeline (what did this crawl refresh actually
    * touch?), and the input a selective re-process reads (re-embed / re-dedup
    * only `added`+`changed` instead of the whole corpus — the same
    * delta-cost idea as [[graft.functions.DedupIndex]], applied upstream).
    *
    * Plan shape: each side reduces to `(id, md5(content))` IN ITS SCAN —
    * the full-outer join moves two narrow digest columns, never documents.
    * Change detection is digest EQUALITY within one engine, so the md5s
    * never need to leave the job or match another system's. At 100 TB both
    * sides hash-partition on `id` — one co-partitioned shuffle each, AQE
    * handles the size asymmetry of a small delta against a big base. */
  def snapshotDiff(prev: DataFrame, curr: DataFrame,
                   idCol: String = "doc_id",
                   contentCol: String = "text"): DataFrame = {
    val p = prev.select(col(idCol).cast("long").as("id"),
      md5(col(contentCol)).as("h_prev"))
    val c = curr.select(col(idCol).cast("long").as("id"),
      md5(col(contentCol)).as("h_curr"))
    p.join(c, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("h_prev").isNull, lit("added"))
          .when(col("h_curr").isNull, lit("removed"))
          .when(col("h_prev") === col("h_curr"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
