package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units" —
  * public paper): the real learned-tokenizer complement to the
  * [[TextFunctions.bpeTokenEstimate]] heuristic. Token counts drive every
  * budget decision a training pipeline makes (mixing quotas, packing,
  * sampling), so counting with the ACTUAL tokenizer rather than a
  * rule-of-thumb is a first-class corpus operator.
  *
  * Scale shape — the part that matters at 100 TB:
  *
  *  1. TRAINING never iterates over the corpus. One distributed pass
  *     compresses the corpus to its word-frequency table (token-keyed hash
  *     aggregation, map-side partials — the same compression
  *     `text_bpe_pairs` documents), capped to the top `maxVocab` words by
  *     (freq desc, word). The cap is what makes the collected dict
  *     MODEL-sized by construction — BPE statistics live on the frequency
  *     mass, which the top slice carries (every production BPE trainer
  *     trains on a capped/sampled dict for the same reason).
  *  2. The merge loop runs DRIVER-side over that dict with incremental
  *     pair-count maintenance (only words containing the merged pair are
  *     touched — the standard efficient trainer), so `nMerges` costs
  *     O(touched words · word length), not nMerges corpus scans.
  *  3. APPLICATION is one narrow codegen'd pass over the corpus: a native
  *     expression carrying the rank table as a plan reference object
  *     ([[graft.functions.expressions.BpeTokenize]]), with a per-thread
  *     word→tokens cache exploiting Zipf repetition.
  *
  * Determinism: pair ties break lexicographically (smallest (left, right)
  * pair first), the vocabulary cap ties break on the word string, and
  * greedy application merges the LOWEST-rank adjacent pair first, leftmost
  * occurrence first — all total orders, so the same corpus always learns
  * and applies the same tokenizer.
  *
  * Domain: words are lowercased whitespace tokens (the
  * [[TextFunctions.tokens]] convention), symbolized as single characters
  * plus a terminal `</w>` end-of-word marker.
  */
object Bpe {

  /** End-of-word marker symbol (the Sennrich convention — lets merges
    * distinguish "est" mid-word from "est" at word end). */
  val EndOfWord = "</w>"

  /** One learned merge: concatenate adjacent symbols `left` + `right`.
    * `rank` is the learning order — application priority. */
  final case class Merge(rank: Int, left: String, right: String)

  /** Learn `nMerges` BPE merges from the corpus. Distributed word-frequency
    * pass + driver-side merge loop (see object doc for why that split is
    * the scalable one). Words shorter than 1 char are impossible by
    * construction; single-char words still carry their `</w>` pair. */
  def learnMerges(docs: DataFrame, nMerges: Int, maxVocab: Int = 50000,
                  textCol: String = "text"): Seq[Merge] = {
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
    learnFromDict(wordFreq, nMerges)
  }

  /** The driver-side merge loop, exposed for spec-level verification
    * against hand-computed examples. Incremental maintenance: a pair→count
    * table plus a pair→words-containing-it index; each merge touches only
    * the indexed words. */
  def learnFromDict(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    // word id → (symbol sequence, frequency)
    val symbols = mutable.ArrayBuffer.empty[Array[String]]
    val freqs = mutable.ArrayBuffer.empty[Long]
    wordFreq.foreach { case (w, f) =>
      symbols += (w.map(_.toString) :+ EndOfWord).toArray
      freqs += f
    }
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWord(id: Int, sign: Long): Unit = {
      val s = symbols(id)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * freqs(id)
        if (c == 0L) pairCount.remove(p) else pairCount(p) = c
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += id
        i += 1
      }
    }
    symbols.indices.foreach(addWord(_, 1L))
    val merges = mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    while (rank < nMerges && pairCount.nonEmpty) {
      // argmax frequency; ties lexicographic on (left, right) — total order
      val best = pairCount.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, c)) =>
          acc match {
            case Some((bp, bc)) =>
              if (c > bc || (c == bc &&
                (p._1 < bp._1 || (p._1 == bp._1 && p._2 < bp._2))))
                Some((p, c))
              else acc
            case None => Some((p, c))
          }
      }.get._1
      merges += Merge(rank, best._1, best._2)
      val affected = pairWords.getOrElse(best, mutable.Set.empty[Int]).toArray
      affected.foreach { id =>
        addWord(id, -1L) // retract the word's old pair counts
        val s = symbols(id)
        val out = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == best._1 && s(i + 1) == best._2) {
            out += s(i) + s(i + 1); i += 2
          } else { out += s(i); i += 1 }
        }
        symbols(id) = out.toArray
        addWord(id, 1L)
      }
      pairWords.remove(best)
      pairCount.remove(best) // defensively; retraction should have zeroed it
      rank += 1
    }
    merges.toSeq
  }

  /** Merge ranks as the flat application table the native expression
    * carries: "left right" → rank (symbols never contain spaces — words are
    * whitespace-split — so the joined key is unambiguous). */
  def rankTable(merges: Seq[Merge]): Map[String, Int] =
    merges.map(m => s"${m.left} ${m.right}" -> m.rank).toMap

  /** Subword tokens of a text under the learned merges, as
    * `array<string>` (end-of-word markers stripped; word boundaries are
    * token boundaries by construction). One narrow codegen'd pass. */
  def tokenize(text: Column, merges: Seq[Merge]): Column =
    graft.functions.expressions.BpeExpressions
      .tokenizeNative(text, rankTable(merges))

  /** Subword token COUNT of a text under the learned merges — the budget
    * operator (cheaper than materializing tokens when only counts feed
    * downstream). */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    graft.functions.expressions.BpeExpressions
      .tokenCountNative(text, rankTable(merges))
}
