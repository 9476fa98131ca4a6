package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer — training and application (Kudo 2018,
  * "Subword Regularization: Improving Neural Network Translation Models
  * with Multiple Subword Candidates" — the SentencePiece unigram model;
  * public paper). The probabilistic complement to [[Bpe]]: where BPE
  * GROWS a vocabulary by greedy merges, the unigram model SHRINKS a large
  * seed vocabulary by EM + loss-ranked pruning, and tokenization is the
  * Viterbi maximum-likelihood segmentation rather than greedy merge
  * replay. Production tokenizers (T5, LLaMA-family sentencepiece models)
  * are unigram models, so corpus token budgets measured with one belong
  * in the same engine as the BPE counter.
  *
  * Scale shape — identical to [[Bpe]]'s, and for the same reason:
  *
  *  1. TRAINING never iterates over the corpus. One distributed pass
  *     compresses the corpus to its top-`maxVocab` word-frequency dict
  *     (token-keyed hash aggregation, map-side partials; TakeOrdered cap
  *     → the collected dict is MODEL-sized by construction).
  *  2. Seeding, EM and pruning run DRIVER-side over that dict: seed =
  *     the most frequent substrings (≤ `maxPieceLen` chars) plus every
  *     single character (coverage guarantee); each EM round is one
  *     forward-backward pass per DISTINCT word (not per occurrence —
  *     frequencies weight the expected counts); pruning removes the
  *     lowest-expected-count pieces in shrink rounds with re-EM between,
  *     never removing single characters.
  *  3. APPLICATION is one narrow codegen'd pass: a native expression
  *     ((graft.functions.expressions.UnigramExpressions)) carrying the
  *     piece→logprob table as a plan reference object, Viterbi per word
  *     with a per-thread cache exploiting Zipf repetition.
  *
  * Determinism: seed ties break on (count desc, piece), prune ties on
  * (expected count asc, piece), and Viterbi ties prefer the segmentation
  * found first under leftmost-longest candidate order — all total orders,
  * so the same corpus always learns and applies the same tokenizer.
  *
  * Domain: lowercased whitespace words (the [[TextFunctions.tokens]]
  * convention), like [[Bpe]]. Characters unseen in training tokenize as
  * single-char unknown pieces under a fixed penalty, so segmentation is
  * TOTAL — every word reconstructs from its pieces. */
object Unigram {

  /** Log-probability a character unseen in training pays per char —
    * worse than any trained piece, so unknowns never win a lattice path
    * over trained pieces. */
  val UnkLogProb: Double = -30.0

  /** A trained model: piece → log-probability (natural log, normalized
    * over the final vocabulary). */
  final case class Vocab(logProbs: Map[String, Double], maxPieceLen: Int)

  /** Learn a unigram vocabulary of (at most) `vocabSize` pieces.
    *
    * `seedFactor` × vocabSize substrings seed the EM; `emIters` EM rounds
    * run between shrink steps; each shrink keeps `shrinkKeep` of the
    * current surplus until the target size is reached. Defaults mirror
    * sentencepiece's shape (seed ≫ target, a few EM rounds per shrink). */
  def train(docs: DataFrame, vocabSize: Int, maxVocab: Int = 50000,
            maxPieceLen: Int = 8, seedFactor: Int = 8, emIters: Int = 4,
            shrinkKeep: Double = 0.75, textCol: String = "text"): Vocab = {
    require(vocabSize >= 1, s"vocabSize must be >= 1 (got $vocabSize)")
    val wordFreq = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("t"))
      .select(lower(col("t")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromDict(wordFreq, vocabSize, maxPieceLen, seedFactor, emIters,
      shrinkKeep)
  }

  /** Driver-side seed → EM → shrink loop, exposed for spec-level
    * verification against hand-built dictionaries. */
  def trainFromDict(wordFreq: Seq[(String, Long)], vocabSize: Int,
                    maxPieceLen: Int = 8, seedFactor: Int = 8,
                    emIters: Int = 4, shrinkKeep: Double = 0.75): Vocab = {
    import scala.collection.mutable
    require(wordFreq.nonEmpty, "empty dictionary")

    // ---- seed: frequent substrings + all single chars (coverage) ------
    val subCount = mutable.HashMap.empty[String, Long]
    wordFreq.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var len = 1
        while (len <= maxPieceLen && i + len <= w.length) {
          val p = w.substring(i, i + len)
          subCount(p) = subCount.getOrElse(p, 0L) + f
          len += 1
        }
        i += 1
      }
    }
    val chars = subCount.keysIterator.filter(_.length == 1).toSet
    val seedSize = math.max(vocabSize.toLong * seedFactor, chars.size.toLong)
    val multi = subCount.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take((seedSize - chars.size).max(0L).toInt).map(_._1)
    var pieces: Set[String] = chars ++ multi

    // ---- EM over the word lattice ------------------------------------
    // forward-backward per distinct word; expected counts weighted by f.
    // Returns (expected counts, total corpus log-likelihood).
    def eStep(lp: Map[String, Double])
        : (mutable.HashMap[String, Double], Double) = {
      val exp = mutable.HashMap.empty[String, Double]
      var totalLL = 0.0
      def logsumexp(a: Double, b: Double): Double =
        if (a == Double.NegativeInfinity) b
        else if (b == Double.NegativeInfinity) a
        else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }
      wordFreq.foreach { case (w, f) =>
        val n = w.length
        // alpha(i): log-prob mass of prefixes ending at i
        val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxPieceLen)
          while (j < i) {
            val lpp = lp.get(w.substring(j, i))
            if (lpp.isDefined)
              alpha(i) = logsumexp(alpha(i), alpha(j) + lpp.get)
            j += 1
          }
          // unknown single char keeps the lattice total
          if (alpha(i) == Double.NegativeInfinity)
            alpha(i) = alpha(i - 1) + UnkLogProb
          i += 1
        }
        val beta = Array.fill(n + 1)(Double.NegativeInfinity)
        beta(n) = 0.0
        i = n - 1
        while (i >= 0) {
          var k = i + 1
          while (k <= math.min(n, i + maxPieceLen)) {
            val lpp = lp.get(w.substring(i, k))
            if (lpp.isDefined)
              beta(i) = logsumexp(beta(i), lpp.get + beta(k))
            k += 1
          }
          if (beta(i) == Double.NegativeInfinity)
            beta(i) = UnkLogProb + beta(i + 1)
          i -= 1
        }
        val z = alpha(n)
        totalLL += f * z
        if (z != Double.NegativeInfinity) {
          i = 0
          while (i < n) {
            var k = i + 1
            while (k <= math.min(n, i + maxPieceLen)) {
              val p = w.substring(i, k)
              val lpp = lp.get(p)
              if (lpp.isDefined) {
                val post = math.exp(alpha(i) + lpp.get + beta(k) - z)
                if (post > 0) exp(p) = exp.getOrElse(p, 0.0) + f * post
              }
              k += 1
            }
            i += 1
          }
        }
      }
      (exp, totalLL)
    }
    def mStep(exp: mutable.HashMap[String, Double]): Map[String, Double] = {
      // pieces with zero expectation keep a floor so coverage never dies
      val total = exp.valuesIterator.sum max 1e-300
      pieces.iterator.map { p =>
        val c = exp.getOrElse(p, 0.0)
        p -> (if (c > 0) math.log(c / total) else UnkLogProb)
      }.toMap
    }

    // uniform init over the seed
    var logProbs: Map[String, Double] =
      pieces.iterator.map(_ -> -math.log(pieces.size.toDouble)).toMap
    def runEm(): Double = {
      var ll = Double.NegativeInfinity
      (0 until emIters).foreach { _ =>
        val (exp, total) = eStep(logProbs)
        logProbs = mStep(exp)
        ll = total
      }
      ll
    }
    runEm()

    // ---- shrink: drop lowest-expected-count multi-char pieces ---------
    while (pieces.size > vocabSize) {
      val (exp, _) = eStep(logProbs)
      val removable = pieces.iterator.filter(_.length > 1).toSeq
        .sortBy(p => (exp.getOrElse(p, 0.0), p))
      val surplus = pieces.size - vocabSize
      val toDrop = removable.take(
        math.max(1, math.min(surplus,
          (pieces.size * (1 - shrinkKeep)).toInt)))
      // only single chars remain above the target — stop (coverage wins)
      if (toDrop.isEmpty) return Vocab(logProbs, maxPieceLen)
      pieces = pieces -- toDrop
      logProbs = logProbs -- toDrop
      runEm()
    }
    Vocab(logProbs, maxPieceLen)
  }

  /** Viterbi max-likelihood tokens of a text under the model, as
    * `array<string>`. One narrow codegen'd pass. */
  def tokenize(text: Column, vocab: Vocab): Column =
    graft.functions.expressions.UnigramExpressions
      .tokenizeNative(text, vocab.logProbs, vocab.maxPieceLen)

  /** Token COUNT under the model — the budget operator. */
  def tokenCount(text: Column, vocab: Vocab): Column =
    graft.functions.expressions.UnigramExpressions
      .tokenCountNative(text, vocab.logProbs, vocab.maxPieceLen)
}
