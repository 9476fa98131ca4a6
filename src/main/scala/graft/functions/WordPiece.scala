package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer training and application (Schuster & Nakajima 2012,
  * "Japanese and Korean Voice Search"; the convention popularized by BERT —
  * public papers/models) — the third production tokenizer family beside
  * [[Bpe]] (merge-frequency) and [[Unigram]] (likelihood EM), completing
  * the set a user of the mainstream tokenizer libraries would expect:
  *
  *  - TRAINING is BPE-shaped (greedy agglomerative merges over a word
  *    dict) but scores candidates by LIKELIHOOD GAIN, not raw count:
  *    `score(a,b) = freq(ab) / (freq(a) · freq(b))` — a pair of rare
  *    symbols that almost always co-occur beats a pair of ubiquitous
  *    symbols that collide by chance (the property the spec pins with a
  *    fixture BPE gets "wrong").
  *  - APPLICATION is NOT merge replay: greedy longest-match-first against
  *    the final vocabulary (MaxMatch), continuation pieces carrying the
  *    `##` prefix; a word with no possible segmentation becomes one
  *    `[UNK]` token (never a partial segmentation).
  *
  * Scale shape — identical to [[Bpe]], and for the same reasons: ONE
  * distributed pass compresses the corpus to its capped word-frequency
  * dict (the cap makes the collected dict model-sized BY CONSTRUCTION);
  * the merge loop runs driver-side over that dict with incremental
  * pair/symbol-count maintenance; application is one narrow codegen'd
  * scan (native expression carrying the vocab as a plan reference object,
  * per-thread Zipf cache — [[graft.functions.expressions.WordPieceRuntime]]).
  *
  * Determinism: score ties break lexicographically on (left, right); the
  * vocabulary lists the sorted initial alphabet first, then merged tokens
  * in learning order — the same corpus always learns and applies the same
  * tokenizer. Domain: lowercased whitespace words (the
  * [[TextFunctions.tokens]] convention), first character bare,
  * continuations `##`-prefixed. */
object WordPiece {

  /** The whole-word fallback token (BERT convention). */
  val Unk = "[UNK]"

  /** Continuation-piece prefix (BERT convention). */
  val Continuation = "##"

  /** Learn a WordPiece vocabulary from the corpus: sorted initial
    * alphabet (bare + `##` forms actually seen) followed by `nMerges`
    * likelihood-scored merged tokens in learning order. Same
    * one-distributed-pass / driver-loop split as [[Bpe.learnMerges]]. */
  def learnVocab(docs: DataFrame, nMerges: Int, maxVocab: Int = 50000,
                 textCol: String = "text"): Seq[String] = {
    require(nMerges >= 0, s"nMerges must be >= 0 (got $nMerges)")
    require(maxVocab >= 1, s"maxVocab must be >= 1 (got $maxVocab)")
    val wordFreq = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("t"))
      .select(lower(col("t")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(maxVocab) // TakeOrdered over the vocab — model-sized result
      .collect().map(r => (r.getString(0), r.getLong(1)))
    learnFromDict(wordFreq.toSeq, nMerges)
  }

  /** The driver-side trainer, exposed for spec-level verification against
    * hand-computed examples. Incremental maintenance like
    * [[Bpe.learnFromDict]], plus a symbol-count table (the score's
    * denominator) updated by the same retract/re-add discipline. */
  def learnFromDict(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[String] = {
    import scala.collection.mutable
    def symbolize(w: String): Array[String] =
      w.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else Continuation + c
      }.toArray
    val symbols = mutable.ArrayBuffer.empty[Array[String]]
    val freqs = mutable.ArrayBuffer.empty[Long]
    wordFreq.foreach { case (w, f) => symbols += symbolize(w); freqs += f }
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    val symCount = mutable.HashMap.empty[String, Long]
    def addWord(id: Int, sign: Long): Unit = {
      val s = symbols(id)
      var i = 0
      while (i < s.length) {
        val sc = symCount.getOrElse(s(i), 0L) + sign * freqs(id)
        if (sc == 0L) symCount.remove(s(i)) else symCount(s(i)) = sc
        if (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          val c = pairCount.getOrElse(p, 0L) + sign * freqs(id)
          if (c == 0L) pairCount.remove(p) else pairCount(p) = c
          if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += id
        }
        i += 1
      }
    }
    symbols.indices.foreach(addWord(_, 1L))
    val alphabet = symCount.keys.toArray.sorted // before merges: single pieces
    val merged = mutable.ArrayBuffer.empty[String]
    var rank = 0
    while (rank < nMerges && pairCount.nonEmpty) {
      // argmax likelihood score; ties lexicographic on (left, right).
      // Denominators as doubles: products of corpus-scale counts overflow
      // Long, and IEEE arithmetic is engine-deterministic.
      val best = pairCount.foldLeft(
        Option.empty[((String, String), Double)]) { case (acc, (p, c)) =>
        val score = c.toDouble /
          (symCount(p._1).toDouble * symCount(p._2).toDouble)
        acc match {
          case Some((bp, bs)) =>
            if (score > bs || (score == bs &&
              (p._1 < bp._1 || (p._1 == bp._1 && p._2 < bp._2))))
              Some((p, score))
            else acc
          case None => Some((p, score))
        }
      }.get._1
      // merged piece keeps the left's continuation status
      val tok = best._1 + best._2.stripPrefix(Continuation)
      merged += tok
      val affected = pairWords.getOrElse(best, mutable.Set.empty[Int]).toArray
      affected.foreach { id =>
        addWord(id, -1L)
        val s = symbols(id)
        val out = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == best._1 && s(i + 1) == best._2) {
            out += tok; i += 2
          } else { out += s(i); i += 1 }
        }
        symbols(id) = out.toArray
        addWord(id, 1L)
      }
      pairWords.remove(best)
      pairCount.remove(best)
      rank += 1
    }
    (alphabet ++ merged).toSeq
  }

  /** Codegen'd greedy longest-match tokenization (one `[UNK]` per
    * unmatchable word), as `array<string>`. */
  def tokenize(text: Column, vocab: Seq[String]): Column =
    graft.functions.expressions.WordPieceExpressions.tokenizeNative(text, vocab)

  /** Codegen'd token count — the budget kernel. */
  def tokenCount(text: Column, vocab: Seq[String]): Column =
    graft.functions.expressions.WordPieceExpressions.tokenCountNative(text, vocab)
}
