package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seed-set quality classifiers — the curation-classifier stage of a
  * training-data pipeline (GPT-3 / LLaMA recipe: label a reference slice
  * "positive", everything else "negative", train a cheap linear text
  * classifier, score the whole crawl, keep the high scorers). The
  * statistics-based sibling of the heuristic quality score
  * ([[TextFunctions]]) and the importance-weighting alternative to
  * [[CorpusOps.dsirWeights]] (Brown et al. 2020 filtered with a trained
  * classifier; Xie et al. 2023 replaced it with importance resampling —
  * a curation toolkit wants both).
  *
  * Both classifiers share the hashed-feature discipline that makes the
  * model 100 TB-safe: tokens bucket by md5 into `nBuckets` hashed slots
  * (engine-portable, same trick as [[CorpusOps.hashBucket]]), so the model
  * is `nBuckets` doubles BY CONSTRUCTION — broadcastable at any corpus
  * size, never vocabulary-sized.
  */
object Classifier {

  private def bucketOf(tok: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"),
      lit(nBuckets.toLong))

  /** Unigrams ++ space-joined n-grams up to `wordNgrams`, built
    * scan-local over the token array (terms bucket to longs in the same
    * projection — no string ever shuffles). */
  private def termsOf(textCol: String, wordNgrams: Int): Column = {
    val toks = TextFunctions.tokens(col(textCol))
    (1 to wordNgrams).map { n =>
      if (n == 1) toks
      else transform(
        slice(toks, lit(1), greatest(size(toks) - lit(n - 1), lit(0))),
        (t, i) => concat_ws(" ",
          (Seq(t) ++ (2 to n).map(k => element_at(toks, i + lit(k)))): _*))
    }.reduce(concat(_, _))
  }

  /** Decimal-routed deterministic sum (order-free accumulation). */
  private def dsum(c: Column, scale: Int) =
    sum(c.cast(s"decimal(38,$scale)")).cast("double")

  /** Naive-Bayes seed classifier — train + score in ONE declarative plan.
    *
    * Training IS aggregation, so unlike the iterative [[lrSeedScore]] the
    * whole classifier is SQL-expressible and sits under the DuckDB hash
    * gate: per hashed bucket b, the class-conditional token likelihoods
    * are `(c_pos(b)+a) / (N_pos + a*B)` (add-`smoothing` over `nBuckets`),
    * and a document's score is the MEAN per-token log-odds
    * `ln(p(b|pos)) - ln(p(b|neg))` — length-invariant like a fastText
    * score; the decision threshold absorbs the class prior.
    *
    * Scale shape, in corpus passes:
    *  1. one scan-local tokenize+bucket pass (no string ever shuffles —
    *     only (id, bucket) longs);
    *  2. bucket counts for BOTH classes from one partial-aggregated
    *     groupBy (`nBuckets`-bounded result); the log-odds table derived
    *     from it broadcasts — the model is nBuckets doubles;
    *  3. per-doc score: broadcast-join tokens to the model, one doc-keyed
    *     partial-aggregated mean.
    * Each log term is quantized to DECIMAL(38,9) before the order-free
    * sum (ln is not cross-engine correctly-rounded; the quantum absorbs
    * the ulp, 1000x finer than the 6-dp output rounding).
    *
    * `isPositive` marks the seed slice (e.g. `col("source") === "wiki"`).
    * Docs with no tokens (null text) surface with n_toks = 0, score 0.0.
    * `wordNgrams` > 1 adds hashed word n-gram features exactly as
    * [[lrSeedScore]] does (the transition signal a bag of unigrams
    * cannot see); n_toks then counts FEATURES (unigrams + n-grams) and
    * the score is the mean per-FEATURE log-odds — still
    * length-invariant, still fully SQL-expressible.
    *
    * Output: (idCol, is_positive, n_toks, nb_logodds). */
  def nbSeedScore(docs: DataFrame, isPositive: Column,
                  nBuckets: Int = 4096, smoothing: Double = 0.5,
                  wordNgrams: Int = 1,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1 (got $nBuckets)")
    require(smoothing > 0.0, s"smoothing must be > 0 (got $smoothing)")
    require(wordNgrams >= 1 && wordNgrams <= 3,
      s"wordNgrams must be in [1, 3] (got $wordNgrams)")
    val flagged = docs.withColumn("__pos", isPositive)
    val toks = flagged
      .select(col(idCol), col("__pos"),
        explode(termsOf(textCol, wordNgrams)).as("__tok"))
      .select(col(idCol), col("__pos"),
        bucketOf(col("__tok"), nBuckets).as("__bkt"))
    // totals ride a single-partition window over the nBuckets-bounded
    // count table instead of a second aggregate over a SECOND tokenize
    // pass — the training side now explodes the corpus exactly once
    // (guide §2.4: the duplicated counts subtree was a whole extra scan +
    // explode + exchange; the window moves <= nBuckets rows once).
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val counts = toks.groupBy(col("__bkt"))
      .agg(count(when(col("__pos"), lit(1))).as("__pos_n"),
        count(when(!col("__pos"), lit(1))).as("__neg_n"))
    val denomShift = lit(smoothing * nBuckets)
    val model = counts
      .withColumn("__pos_total", sum(col("__pos_n")).over(wAll))
      .withColumn("__neg_total", sum(col("__neg_n")).over(wAll))
      .select(col("__bkt"),
        (log((col("__pos_n") + lit(smoothing)) /
            (col("__pos_total") + denomShift)) -
          log((col("__neg_n") + lit(smoothing)) /
            (col("__neg_total") + denomShift))).as("__lo"))
    // __pos rides the score aggregate's grouping key (constant per doc),
    // so the doc-keyed result is already labeled — the only rows the old
    // LEFT JOIN back to `flagged` added are docs with NO terms, and a
    // non-null text always yields >= 1 term (split never returns an empty
    // array), so those are exactly the null-text docs: a pushed-filter
    // scan unions them in with the zero scores the join's coalesce
    // produced. SortMergeJoin LeftOuter + its two exchanges -> one
    // filtered scan (guide §2.4).
    val scores = toks
      .join(broadcast(model), "__bkt")
      .groupBy(col(idCol), col("__pos"))
      .agg(count(lit(1)).as("n_toks"),
        round(dsum(col("__lo"), 9) / count(lit(1)), 6).as("nb_logodds"))
    scores.select(col(idCol), col("__pos").as("is_positive"),
        col("n_toks"), col("nb_logodds"))
      .unionAll(flagged.filter(col(textCol).isNull)
        .select(col(idCol), col("__pos").as("is_positive"),
          lit(0L).as("n_toks"), lit(0.0).as("nb_logodds")))
  }

  /** Logistic-regression seed classifier — the iterative sibling of
    * [[nbSeedScore]] (a discriminative fastText-style linear model instead
    * of generative NB), trained by full-batch gradient descent with
    * per-feature adaptive steps (AdaGrad, Duchi et al. 2011).
    *
    * Features: hashed word n-grams (fastText's bag-of-tricks recipe,
    * Joulin et al. 2016: unigrams + `wordNgrams`-order n-grams through
    * the hashing trick), valued x_b = log(1 + tf_b) — sublinear tf, NOT
    * length-normalized. Two lessons are load-bearing here:
    * (1) per-token evidence must ACCUMULATE over the document (exactly
    * what [[nbSeedScore]]'s per-token log-odds sum does) — dividing by
    * doc length turns the margin into a mean of weights and a
    * weak-signal corpus becomes unlearnable — while the log damps
    * burstiness so a single repeated token cannot dominate; (2) word
    * BIGRAMS carry the sequence signal a bag of unigrams cannot: two
    * sources with near-identical unigram frequency profiles but
    * different transition structure (the hard case for the generative
    * unigram [[nbSeedScore]]) are linearly separable in bigram space.
    * The AdaGrad (Duchi et al. 2011) denominator sqrt(Σ g_b²) rescales
    * each coordinate's first update to O(stepSize) regardless of
    * feature scale, so the model moves off zero immediately instead of
    * needing a step size tuned to the corpus.
    *
    * Each epoch is ONE distributed pass: the weight vector (nBuckets
    * doubles — model-sized, like the centroid/codebook/vocab collects in
    * [[Similarity]]/[[Pq]]/[[Bpe]]) broadcasts as a bucket→weight table;
    * margins come from a broadcast-join + doc-keyed sum over ALL docs
    * (a token-less doc's feature vector is the zero vector — it still
    * contributes `sigmoid(bias) - y` to the bias gradient, keeping the
    * trained bias on-model); the gradient `sum_docs (sigmoid(margin) - y)
    * * x` comes back as ONE nBuckets-bounded aggregate. Nothing data-sized
    * ever reaches the driver, and epochs = E means E passes — no per-doc
    * driver loop. Gradient partials are decimal-quantized so accumulation
    * order cannot perturb the trained model, and the AdaGrad accumulators
    * are driver-side scalar math on those deterministic aggregates:
    * training is bit-deterministic.
    *
    * Iterative training is not SQL-expressible, so this op is
    * equivalence-tested (separable fixture, determinism, en-vs-zh
    * separation on the real corpus, NB ranking agreement) rather than
    * DuckDB-oracled — same verification contract as the
    * BPE/unigram/k-means trainers.
    *
    * Output: (idCol, is_positive, lr_score) with lr_score = sigmoid(w·x+b)
    * rounded to 6 dp; token-less docs score at the bias. */
  def lrSeedScore(docs: DataFrame, isPositive: Column,
                  nBuckets: Int = 4096, epochs: Int = 8,
                  stepSize: Double = 0.5, wordNgrams: Int = 2,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1 (got $nBuckets)")
    require(epochs >= 1, s"epochs must be >= 1 (got $epochs)")
    require(stepSize > 0.0, s"stepSize must be > 0 (got $stepSize)")
    require(wordNgrams >= 1 && wordNgrams <= 3,
      s"wordNgrams must be in [1, 3] (got $wordNgrams)")
    val spark = docs.sparkSession
    import spark.implicits._

    val flagged = docs.withColumn("__pos", isPositive)
    // (doc, bucket, x) feature triples + per-doc label; REPARTITIONED BY
    // DOC before the grouped build (hashpartitioning(id) clusters the
    // (id, pos, bkt) grouping keys too, so the build still pays exactly
    // one exchange) and checkpointed — every epoch re-reads them, and
    // because the stored partitioning already clusters by doc, the
    // per-epoch doc-keyed aggregate and the err-side join below need NO
    // exchange at all (guide §2.4: establish the partitioning once).
    // At fixture scale the cache is tiny; at 100 TB a real deployment
    // would persist this projection once.
    val feats = flagged
      .select(col(idCol), col("__pos"),
        explode(termsOf(textCol, wordNgrams)).as("__tok"))
      .select(col(idCol), col("__pos"),
        bucketOf(col("__tok"), nBuckets).as("__bkt"))
      .repartition(col(idCol))
      .groupBy(col(idCol), col("__pos"), col("__bkt"))
      .agg(count(lit(1)).cast("double").as("__tf"))
      .select(col(idCol), col("__pos"), col("__bkt"),
        log1p(col("__tf")).as("__x"))
      .localCheckpoint()
    val nDocs = flagged.count().toDouble

    // Docs with the ZERO feature vector still belong to the bias gradient
    // (err = sigmoid(bias) - y). A non-null text always yields >= 1 term
    // (split never returns an empty array), so those are exactly the
    // null-text docs — a pushed-filter scan, not a per-epoch join of
    // every label against every dot.
    val nullLabels = flagged.filter(col(textCol).isNull)
      .select(col(idCol), col("__pos")).localCheckpoint()

    val adaEps = 1e-8
    var weights = Map.empty[Long, Double]
    var gradSq = Map.empty[Long, Double] // AdaGrad per-feature accumulators
    var bias = 0.0
    var biasSq = 0.0
    val BIAS = -1L // bucketOf is a pmod into [0, nBuckets) — -1 is free
    for (_ <- 1 to epochs) {
      val wDf = broadcast(
        weights.toSeq.toDF("__bkt", "__w"))
      // bias rides a 1-row broadcast column, NOT a literal: a changed
      // literal makes every epoch's generated code unique, so whole-stage
      // codegen recompiled per epoch — as data, the epoch plans share one
      // compiled class and the Janino cache hits (guide §1.2 step 2:
      // per-task work — here per-EPOCH driver work).
      val biasDf = broadcast(Seq(bias).toDF("__bias"))
      // __pos rides the doc-keyed grouping (constant per doc), so err is
      // computable straight off the aggregate — no labels join.
      val errs = feats
        .join(wDf, Seq("__bkt"), "left")
        .groupBy(col(idCol), col("__pos"))
        .agg(dsum(coalesce(col("__w"), lit(0.0)) * col("__x"), 12)
          .as("__dot"))
        .crossJoin(biasDf)
        .select(col(idCol),
          (lit(1.0) / (lit(1.0) + exp(-(col("__dot") + col("__bias")))) -
            when(col("__pos"), lit(1.0)).otherwise(lit(0.0))).as("__err"))
        .persist() // consumed by two branches of ONE action below
      // ONE nBuckets-bounded aggregate answers both gradients per epoch
      // (the old shape paid two actions: a bucket-keyed collect plus a
      // separate bias-sum collect). The bias gradient rides the sentinel
      // bucket: per feat-doc err from the errs branch, per null-text doc
      // the same closed-form err the joined shape produced — the decimal
      // sum sees the identical value multiset, so training is
      // bit-identical to the two-action form.
      val gradRows = try {
        errs.join(feats, idCol)
          .select(col("__bkt"), (col("__err") * col("__x")).as("__t"))
          .unionAll(errs.select(lit(BIAS).as("__bkt"), col("__err").as("__t")))
          .unionAll(nullLabels.crossJoin(biasDf).select(lit(BIAS).as("__bkt"),
            (lit(1.0) / (lit(1.0) + exp(-(lit(0.0) + col("__bias")))) -
              when(col("__pos"), lit(1.0)).otherwise(lit(0.0))).as("__t")))
          .groupBy(col("__bkt"))
          .agg(dsum(col("__t"), 12).as("__g"))
          .collect()
      } finally errs.unpersist(false)
      val grad = gradRows.iterator.filter(_.getLong(0) != BIAS)
        .map(r => r.getLong(0) -> r.getDouble(1) / nDocs).toMap
      val biasGrad = gradRows.find(_.getLong(0) == BIAS)
        .map(_.getDouble(1) / nDocs).getOrElse(0.0)
      gradSq = (gradSq.keySet ++ grad.keySet).iterator.map { b =>
        val g = grad.getOrElse(b, 0.0)
        b -> (gradSq.getOrElse(b, 0.0) + g * g)
      }.toMap
      weights = (weights.keySet ++ grad.keySet).iterator.map { b =>
        b -> (weights.getOrElse(b, 0.0) -
          stepSize * grad.getOrElse(b, 0.0) /
            (math.sqrt(gradSq.getOrElse(b, 0.0)) + adaEps))
      }.toMap
      biasSq += biasGrad * biasGrad
      bias = bias - stepSize * biasGrad / (math.sqrt(biasSq) + adaEps)
    }

    val wFinal = broadcast(weights.toSeq.toDF("__bkt", "__w"))
    val scored = feats
      .join(wFinal, Seq("__bkt"), "left")
      .groupBy(col(idCol), col("__pos"))
      .agg((dsum(coalesce(col("__w"), lit(0.0)) * col("__x"), 12)
        + lit(bias)).as("__m"))
      .select(col(idCol), col("__pos").as("is_positive"),
        round(lit(1.0) / (lit(1.0) + exp(-col("__m"))), 6).as("lr_score"))
    scored.unionAll(nullLabels
      .select(col(idCol), col("__pos").as("is_positive"),
        round(lit(1.0) / (lit(1.0) + exp(lit(-bias))), 6).as("lr_score")))
  }
}
