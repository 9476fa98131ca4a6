package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for unigram-LM application — Viterbi maximum-likelihood
  * segmentation per word, the same StaticInvoke-style pattern as
  * [[BpeRuntime]]: generated code calls straight into ordinary JVM
  * methods, so the expression stays inside whole-stage codegen while the
  * dynamic program lives in plain loops.
  *
  * Segmentation is TOTAL: a character covered by no trained piece pays
  * [[graft.functions.Unigram.UnkLogProb]] as a single-char unknown, so
  * every word reconstructs from its pieces. Viterbi ties (equal path
  * scores) resolve toward the candidate with the SHORTEST last piece
  * examined first (piece lengths scan ascending), a fixed total order —
  * the same text always segments identically. A per-thread word→tokens
  * cache (keyed on the model's identity) exploits Zipf repetition;
  * capacity-capped and transparent. */
object UnigramRuntime {

  private final val UnkLogProb = -30.0
  private final val MaxCacheEntries = 1 << 16

  /** Model as plan-reference-friendly parallel arrays, pre-bucketed into
    * a hash map at first use per thread. */
  private final class Cache(val owner: AnyRef) {
    val map = new java.util.HashMap[String, Array[String]]()
    var probs: java.util.HashMap[String, java.lang.Double] = _
  }
  private val tl = new ThreadLocal[Cache]()

  private def cacheFor(pieces: Array[String],
                       logProbs: Array[Double]): Cache = {
    var c = tl.get()
    if (c == null || (c.owner ne pieces)) {
      c = new Cache(pieces)
      c.probs = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
      var i = 0
      while (i < pieces.length) { c.probs.put(pieces(i), logProbs(i)); i += 1 }
      tl.set(c)
    }
    if (c.map.size() > MaxCacheEntries) c.map.clear()
    c
  }

  /** Viterbi tokens of one lowercased word. Empty words yield zero
    * tokens. */
  def segmentWord(word: String, probs: java.util.HashMap[String, java.lang.Double],
                  maxPieceLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // start index of the winning last piece
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      // ascending piece length: ties keep the first (shortest) candidate
      var j = i - 1
      val lo = math.max(0, i - maxPieceLen)
      while (j >= lo) {
        val lp = probs.get(word.substring(j, i))
        if (lp != null) {
          val s = best(j) + lp.doubleValue()
          if (s > best(i)) { best(i) = s; back(i) = j }
        }
        j -= 1
      }
      if (best(i) == Double.NegativeInfinity) { // unknown single char
        best(i) = best(i - 1) + UnkLogProb
        back(i) = i - 1
      }
      i += 1
    }
    // walk back
    val out = new java.util.ArrayList[String]()
    var k = n
    while (k > 0) { out.add(0, word.substring(back(k), k)); k = back(k) }
    out.toArray(new Array[String](out.size()))
  }

  private def cachedTokens(word: String, c: Cache,
                           maxPieceLen: Int): Array[String] = {
    var t = c.map.get(word)
    if (t == null) { t = segmentWord(word, c.probs, maxPieceLen); c.map.put(word, t) }
    t
  }

  def tokenize(text: UTF8String, pieces: Array[String],
               logProbs: Array[Double], maxPieceLen: Int): ArrayData = {
    val c = cacheFor(pieces, logProbs)
    val words = text.toString.toLowerCase.split(" ", -1)
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < words.length) {
      val toks = cachedTokens(words(i), c, maxPieceLen)
      var j = 0
      while (j < toks.length) { out.add(UTF8String.fromString(toks(j))); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def tokenCount(text: UTF8String, pieces: Array[String],
                 logProbs: Array[Double], maxPieceLen: Int): Long = {
    val c = cacheFor(pieces, logProbs)
    val words = text.toString.toLowerCase.split(" ", -1)
    var n = 0L
    var i = 0
    while (i < words.length) { n += cachedTokens(words(i), c, maxPieceLen).length; i += 1 }
    n
  }
}

/** Viterbi unigram-LM tokenization under a trained vocabulary, as
  * `array<string>`. The model rides the plan as reference objects —
  * model-sized, no broadcast bookkeeping. */
final case class UnigramTokenize(child: Expression, pieces: Array[String],
                                 logProbs: Array[Double], maxPieceLen: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(pieces.length == logProbs.length, "pieces/logProbs length mismatch")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_tokenize"

  override def nullSafeEval(v: Any): Any =
    UnigramRuntime.tokenize(v.asInstanceOf[UTF8String], pieces, logProbs,
      maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val p = ctx.addReferenceObj("ugPieces", pieces, "java.lang.String[]")
      val lp = ctx.addReferenceObj("ugLogProbs", logProbs, "double[]")
      s"${ev.value} = graft.functions.expressions.UnigramRuntime" +
        s".tokenize($x, $p, $lp, $maxPieceLen);"
    })

  override protected def withNewChildInternal(newChild: Expression): UnigramTokenize =
    copy(child = newChild)
}

/** Token count under a trained unigram vocabulary — the counting form. */
final case class UnigramTokenCount(child: Expression, pieces: Array[String],
                                   logProbs: Array[Double], maxPieceLen: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(pieces.length == logProbs.length, "pieces/logProbs length mismatch")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "unigram_token_count"

  override def nullSafeEval(v: Any): Any =
    UnigramRuntime.tokenCount(v.asInstanceOf[UTF8String], pieces, logProbs,
      maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val p = ctx.addReferenceObj("ugPieces", pieces, "java.lang.String[]")
      val lp = ctx.addReferenceObj("ugLogProbs", logProbs, "double[]")
      s"${ev.value} = graft.functions.expressions.UnigramRuntime" +
        s".tokenCount($x, $p, $lp, $maxPieceLen);"
    })

  override protected def withNewChildInternal(newChild: Expression): UnigramTokenCount =
    copy(child = newChild)
}

object UnigramExpressions {
  private def ordered(lp: Map[String, Double]): (Array[String], Array[Double]) = {
    val sorted = lp.toSeq.sortBy(_._1)
    (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }

  /** Codegen'd Viterbi tokenization from a piece → logprob table. */
  def tokenizeNative(text: Column, logProbs: Map[String, Double],
                     maxPieceLen: Int): Column = {
    val (p, lp) = ordered(logProbs)
    GraftBridge.column(UnigramTokenize(GraftBridge.expression(text), p, lp,
      maxPieceLen))
  }

  /** Codegen'd token count from a piece → logprob table. */
  def tokenCountNative(text: Column, logProbs: Map[String, Double],
                       maxPieceLen: Int): Column = {
    val (p, lp) = ordered(logProbs)
    GraftBridge.column(UnigramTokenCount(GraftBridge.expression(text), p, lp,
      maxPieceLen))
  }
}
