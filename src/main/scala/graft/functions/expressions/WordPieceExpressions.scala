package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for WordPiece application — same StaticInvoke pattern as
  * [[BpeRuntime]], same per-thread Zipf cache, different algorithm: greedy
  * longest-match-first (MaxMatch) against the final vocabulary, not merge
  * replay. A word that cannot be fully segmented is ONE `[UNK]` token —
  * never a partial segmentation (the BERT contract). */
object WordPieceRuntime {

  private final val Unk = UTF8String.fromString("[UNK]")
  private final val MaxCacheEntries = 1 << 16

  private final class Cache(val owner: AnyRef) {
    val map = new java.util.HashMap[String, Array[UTF8String]]()
  }
  private val tl = new ThreadLocal[Cache]()

  private def cacheFor(owner: AnyRef): java.util.HashMap[String, Array[UTF8String]] = {
    var c = tl.get()
    if (c == null || (c.owner ne owner)) { c = new Cache(owner); tl.set(c) }
    if (c.map.size() > MaxCacheEntries) c.map.clear()
    c.map
  }

  /** Greedy longest-match pieces of one lowercased word. Empty words
    * yield zero tokens; an unmatchable word yields exactly `[UNK]`. */
  def tokenizeWord(word: String,
                   vocab: java.util.HashSet[String]): Array[UTF8String] = {
    if (word.isEmpty) return Array.empty
    val out = new java.util.ArrayList[UTF8String]()
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (end > start && found == null) {
        val raw = word.substring(start, end)
        val sub = if (start > 0) "##" + raw else raw
        if (vocab.contains(sub)) found = sub else end -= 1
      }
      if (found == null) return Array(Unk)
      out.add(UTF8String.fromString(found))
      start = end
    }
    out.toArray(new Array[UTF8String](out.size()))
  }

  private def cachedTokens(word: String,
                           vocab: java.util.HashSet[String]): Array[UTF8String] = {
    val cache = cacheFor(vocab)
    var t = cache.get(word)
    if (t == null) { t = tokenizeWord(word, vocab); cache.put(word, t) }
    t
  }

  /** All pieces of a text (lowercased, whitespace-word domain — the
    * training contract). */
  def tokenize(text: UTF8String, vocab: java.util.HashSet[String]): ArrayData = {
    val words = text.toString.toLowerCase.split(" ", -1)
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < words.length) {
      val toks = cachedTokens(words(i), vocab)
      var j = 0
      while (j < toks.length) { out.add(toks(j)); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Piece count of a text — the budget kernel. */
  def tokenCount(text: UTF8String, vocab: java.util.HashSet[String]): Long = {
    val words = text.toString.toLowerCase.split(" ", -1)
    var n = 0L
    var i = 0
    while (i < words.length) { n += cachedTokens(words(i), vocab).length; i += 1 }
    n
  }
}

/** Tokenize a text under a learned WordPiece vocabulary, as
  * `array<string>`. The vocab rides the plan as a reference object —
  * model-sized, no broadcast bookkeeping. */
final case class WordPieceTokenize(child: Expression,
                                   vocab: java.util.HashSet[String])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_tokenize"

  override def nullSafeEval(v: Any): Any =
    WordPieceRuntime.tokenize(v.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("wpVocab", vocab, "java.util.HashSet")
      s"${ev.value} = graft.functions.expressions.WordPieceRuntime.tokenize($x, $m);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordPieceTokenize =
    copy(child = newChild)
}

/** Piece count of a text under a learned WordPiece vocabulary — the
  * counting form (skips token materialization in the budget hot path). */
final case class WordPieceTokenCount(child: Expression,
                                     vocab: java.util.HashSet[String])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "wordpiece_token_count"

  override def nullSafeEval(v: Any): Any =
    WordPieceRuntime.tokenCount(v.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("wpVocab", vocab, "java.util.HashSet")
      s"${ev.value} = graft.functions.expressions.WordPieceRuntime.tokenCount($x, $m);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordPieceTokenCount =
    copy(child = newChild)
}

object WordPieceExpressions {
  private def asSet(vocab: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, vocab.size * 2))
    vocab.foreach(s.add)
    s
  }

  /** Codegen'd WordPiece tokenization from a vocabulary list. */
  def tokenizeNative(text: Column, vocab: Seq[String]): Column =
    GraftBridge.column(WordPieceTokenize(GraftBridge.expression(text), asSet(vocab)))

  /** Codegen'd WordPiece piece count from a vocabulary list. */
  def tokenCountNative(text: Column, vocab: Seq[String]): Column =
    GraftBridge.column(WordPieceTokenCount(GraftBridge.expression(text), asSet(vocab)))
}
