package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for BPE application — static methods the generated code
  * calls directly (the `StaticInvoke` pattern Spark itself uses for
  * string kernels), so the expressions stay inside whole-stage codegen
  * while the iterative merge loop lives in ordinary JVM code.
  *
  * Application semantics: merges apply IN RANK ORDER, each merging its
  * non-overlapping occurrences left-to-right — exactly the order training
  * learned them, so tokenizing a training word reproduces the trainer's
  * final symbolization (BpeSpec proves it on the whole dict). A per-thread
  * word→tokens cache (keyed on the merge table's identity) exploits Zipf
  * repetition; the cache is capacity-capped and transparent — output never
  * depends on hit/miss. */
object BpeRuntime {

  private final val EndOfWord = "</w>"
  private final val MaxCacheEntries = 1 << 16

  private final class Cache(val owner: AnyRef) {
    val map = new java.util.HashMap[String, Array[String]]()
  }
  private val tl = new ThreadLocal[Cache]()

  private def cacheFor(owner: AnyRef): java.util.HashMap[String, Array[String]] = {
    var c = tl.get()
    if (c == null || (c.owner ne owner)) { c = new Cache(owner); tl.set(c) }
    if (c.map.size() > MaxCacheEntries) c.map.clear()
    c.map
  }

  /** Subword symbols of one lowercased word (terminal marker stripped from
    * the final symbol). Empty words yield zero tokens. */
  def tokenizeWord(word: String, merges: Array[Array[String]]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var symbols = new Array[String](word.length + 1)
    var i = 0
    while (i < word.length) { symbols(i) = String.valueOf(word.charAt(i)); i += 1 }
    symbols(word.length) = EndOfWord
    var m = 0
    while (m < merges.length && symbols.length > 1) {
      val left = merges(m)(0)
      val right = merges(m)(1)
      var j = 0
      var found = false
      while (j < symbols.length - 1 && !found) {
        if (symbols(j) == left && symbols(j + 1) == right) found = true else j += 1
      }
      if (found) {
        val out = new java.util.ArrayList[String](symbols.length)
        var p = 0
        while (p < symbols.length) {
          if (p < symbols.length - 1 && symbols(p) == left && symbols(p + 1) == right) {
            out.add(left + right); p += 2
          } else { out.add(symbols(p)); p += 1 }
        }
        symbols = out.toArray(new Array[String](out.size()))
      }
      m += 1
    }
    // strip the terminal marker (cosmetic; token COUNT is symbol count)
    val last = symbols.length - 1
    if (symbols(last) == EndOfWord) {
      java.util.Arrays.copyOf(symbols, last)
    } else {
      if (symbols(last).endsWith(EndOfWord))
        symbols(last) = symbols(last).dropRight(EndOfWord.length)
      symbols
    }
  }

  private def cachedTokens(word: String,
                           merges: Array[Array[String]]): Array[String] = {
    val cache = cacheFor(merges)
    var t = cache.get(word)
    if (t == null) { t = tokenizeWord(word, merges); cache.put(word, t) }
    t
  }

  /** All subword tokens of a text (lowercased, whitespace-word domain —
    * the training contract). */
  def tokenize(text: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val words = text.toString.toLowerCase.split(" ", -1)
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < words.length) {
      val toks = cachedTokens(words(i), merges)
      var j = 0
      while (j < toks.length) { out.add(UTF8String.fromString(toks(j))); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Subword token count of a text — the budget kernel (no token
    * materialization; a word whose final symbol is the bare marker counts
    * its symbols exactly like [[tokenize]] emits them). */
  def tokenCount(text: UTF8String, merges: Array[Array[String]]): Long = {
    val words = text.toString.toLowerCase.split(" ", -1)
    var n = 0L
    var i = 0
    while (i < words.length) { n += cachedTokens(words(i), merges).length; i += 1 }
    n
  }
}

/** Tokenize a text under a learned BPE merge table (rank order), as
  * `array<string>`. The table rides the plan as a reference object —
  * model-sized, no broadcast bookkeeping. */
final case class BpeTokenize(child: Expression, merges: Array[Array[String]])
  extends UnaryExpression with ExpectsInputTypes {

  require(merges.forall(_.length == 2), "each merge is a [left, right] pair")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokenize"

  override def nullSafeEval(v: Any): Any =
    BpeRuntime.tokenize(v.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[][]")
      s"${ev.value} = graft.functions.expressions.BpeRuntime.tokenize($x, $m);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokenize =
    copy(child = newChild)
}

/** Subword token count of a text under a learned BPE merge table — the
  * counting form (skips token materialization in the budget hot path). */
final case class BpeTokenCount(child: Expression, merges: Array[Array[String]])
  extends UnaryExpression with ExpectsInputTypes {

  require(merges.forall(_.length == 2), "each merge is a [left, right] pair")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(v: Any): Any =
    BpeRuntime.tokenCount(v.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[][]")
      s"${ev.value} = graft.functions.expressions.BpeRuntime.tokenCount($x, $m);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeExpressions {
  private def ordered(ranks: Map[String, Int]): Array[Array[String]] =
    ranks.toSeq.sortBy(_._2).map { case (k, _) =>
      val sp = k.indexOf(' ')
      Array(k.substring(0, sp), k.substring(sp + 1))
    }.toArray

  /** Codegen'd BPE tokenization from a "left right" → rank table. */
  def tokenizeNative(text: Column, ranks: Map[String, Int]): Column =
    GraftBridge.column(BpeTokenize(GraftBridge.expression(text), ordered(ranks)))

  /** Codegen'd BPE token count from a "left right" → rank table. */
  def tokenCountNative(text: Column, ranks: Map[String, Int]): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(text), ordered(ranks)))
}
