package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the xxhash64 of every n-token
  * shingle of a text column in one pass — the codegen'd replacement for
  * the interpreted `tokenShingles`/`transform(xxhash64)` higher-order
  * pipeline, which dominated the round-2 bench (shingling is the inner
  * loop of every n-gram dedup, MinHash signature, and decontamination
  * pass at corpus scale).
  *
  * The trick that makes this allocation-free: `split(text, " ")` followed
  * by re-joining `n` consecutive tokens with `" "` is an exact inverse
  * pair, so shingle `i` is LITERALLY the byte range of `text` from the
  * start of token `i` to the end of token `i+n−1` (UTF-8 continuation
  * bytes are ≥ 0x80, so scanning raw bytes for 0x20 can never split a
  * multi-byte character). Each hash is therefore
  * `XXH64(bytes[start_i, end_{i+n−1}), seed=42)` over the ORIGINAL string
  * buffer — bit-identical to `xxhash64(concat_ws(" ", tokens...))` with
  * zero string materialization, no per-element lambda frames, and no
  * interpreted HOF passes.
  *
  * Output preserves window order and keeps duplicates (wrap in
  * `array_distinct` for set semantics — that path is codegen'd for
  * primitive longs). Documents with fewer than `n` tokens yield an empty
  * array; a null document yields null (standard null-intolerant unary
  * expression).
  */
final case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width must be >= 1 (got $n)")

  // (return type inferred — Seq[AbstractDataType] is private[sql])
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Seed used by Spark's `xxhash64` function — keeps these hashes
    * bit-compatible with `xxhash64(shingle_string)`. */
  private final val Seed = 42L

  /** One pass over the raw UTF-8 bytes: locate token boundaries (0x20),
    * then hash each n-token window's byte range in place. Token semantics
    * match `split(text, " ")` exactly, including empty tokens from
    * consecutive / leading / trailing spaces and the single empty token of
    * an empty string. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val base = text.getBaseObject
    val off  = text.getBaseOffset
    val len  = text.numBytes
    var spaces = 0
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val nTokens = spaces + 1
    if (nTokens < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // starts(j) = byte index where token j begins; token j ends at the
    // space before token j+1 (or at len for the last token)
    val starts = new Array[Int](nTokens)
    var j = 1
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) { starts(j) = i + 1; j += 1 }
      i += 1
    }
    val out = new Array[Long](nTokens - n + 1)
    var w = 0
    while (w <= nTokens - n) {
      val s = starts(w)
      val e = if (w + n < nTokens) starts(w + n) - 1 else len
      out(w) = XXH64.hashUnsafeBytes(base, off + s, e - s, Seed)
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native Catalyst expression computing a k-wide MinHash signature from a
  * shingle-hash array in one pass — the codegen'd replacement for the
  * column-form `aggregate(...)` ladder, which runs k interpreted HOF
  * passes per row. That ladder is the per-row cost of every signature
  * computed OUTSIDE a groupBy (the bulk explode+groupBy path covers batch;
  * this covers the paths that can't shuffle — per-row signatures in a
  * streaming source, ad-hoc column use).
  *
  * Bit-compatibility: lane i of the signature is
  * `min over h of xxhash64(h, i)`, where Spark's two-argument xxhash64
  * folds left — `XXH64.hashInt(i, XXH64.hashLong(h, 42))`. The inner
  * `hashLong` does not depend on the lane, so it is hoisted: one hashLong
  * + k hashInt per element, against the HOF ladder's k full passes.
  * Empty arrays yield the same sentinel signature (-1, -2, …) as the
  * column and bulk forms; elements must be non-null (shingle hashes).
  */
final case class MinHashSignature(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"signature width must be >= 1 (got $k)")

  // (return type inferred — Seq[AbstractDataType] is private[sql])
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MinHashSignature.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  private final val Seed = 42L

  def compute(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val sig = new Array[Long](k)
    if (n == 0) {
      var i = 0
      while (i < k) { sig(i) = -1L - i; i += 1 }
    } else {
      java.util.Arrays.fill(sig, Long.MaxValue)
      var j = 0
      while (j < n) {
        val t = XXH64.hashLong(hashes.getLong(j), Seed)
        var i = 0
        while (i < k) {
          val v = XXH64.hashInt(i, t)
          if (v < sig(i)) sig(i) = v
          i += 1
        }
        j += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }
}

/** Native Catalyst expression: fraction of an array's elements taken by
  * its most frequent value (max multiplicity / length), 0.0 for an empty
  * array. This is the Gopher-style `top_bigram_frac` repetition signal
  * computed SCAN-LOCALLY: the shingle-hash array is already one row's
  * column, so counting its mode needs no explode, no (doc, shingle)
  * shuffle, and no join back — the whole signal stays inside the document
  * scan (the round-4 form spent two exchanges plus a join on what this
  * expression does in one codegen'd pass).
  *
  * Mode counting is sort + longest-run over a scratch copy (O(m log m),
  * allocation = one long[] per row, no hash map) — exact, not sketched.
  */
final case class TopFreqFrac(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  // (return type inferred — Seq[AbstractDataType] is private[sql])
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "top_freq_frac"

  override def nullSafeEval(input: Any): Any =
    TopFreqFrac.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TopFreqFrac.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TopFreqFrac =
    copy(child = newChild)
}

object TopFreqFrac {
  def compute(hashes: ArrayData): Double = {
    val n = hashes.numElements()
    if (n == 0) return 0.0
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = hashes.getLong(i); i += 1 }
    java.util.Arrays.sort(a)
    var best = 1
    var run = 1
    i = 1
    while (i < n) {
      if (a(i) == a(i - 1)) { run += 1; if (run > best) best = run }
      else run = 1
      i += 1
    }
    best.toDouble / n
  }
}

/** Native Catalyst expression computing the DISTINCT xxhash64 of every
  * character q-gram of a text column in one pass — the codegen'd engine of
  * [[graft.functions.Dedup.charGramHashes]] (edit-distance candidate
  * blocking). The interpreted predecessor —
  * `array_distinct(transform(sequence(...), i => xxhash64(substr(i, q))))`
  * — evaluated ~|text| lambda frames per document, each materializing a
  * q-char substring; on a small-file scan (one input partition until the
  * first shuffle) that single-core map stage dominated the whole query.
  *
  * Here each gram is hashed IN PLACE over the original UTF-8 buffer:
  * one pass records character start offsets (any byte with
  * `(b & 0xC0) != 0x80` starts a codepoint), gram `i` is the byte range
  * `[start(i), start(i+q))`, and the hash is `XXH64(bytes, seed=42)` —
  * bit-identical to `xxhash64(substring)` because Spark's `xxhash64` of a
  * string IS the xxh64 of its UTF-8 bytes at seed 42. First-occurrence
  * order, duplicates dropped (set semantics, matching the `array_distinct`
  * of the interpreted form — proven bit-exact in DedupSpec). Strings
  * shorter than q characters yield an empty array; null yields null. */
final case class CharGramHashes(child: Expression, q: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(q >= 1, s"q-gram width must be >= 1 (got $q)")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    CharGramHashes.compute(input.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CharGramHashes.compute($c, $q)")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

object CharGramHashes {
  private final val Seed = 42L

  def compute(text: UTF8String, q: Int): ArrayData = {
    val nChars = text.numChars()
    if (nChars < q)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val base = text.getBaseObject
    val off  = text.getBaseOffset
    val len  = text.numBytes
    // starts(c) = byte offset where character c begins; sentinel at the end
    val starts = new Array[Int](nChars + 1)
    var ci = 0
    var i = 0
    while (i < len) {
      if ((Platform.getByte(base, off + i) & 0xC0) != 0x80) {
        starts(ci) = i; ci += 1
      }
      i += 1
    }
    starts(nChars) = len
    val nGrams = nChars - q + 1
    val seen = new java.util.HashSet[java.lang.Long](nGrams * 2)
    val out = new Array[Long](nGrams)
    var w = 0
    var m = 0
    while (w < nGrams) {
      val s = starts(w)
      val e = starts(w + q)
      val h = XXH64.hashUnsafeBytes(base, off + s, e - s, Seed)
      if (seen.add(h)) { out(m) = h; m += 1 }
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == nGrams) out else java.util.Arrays.copyOf(out, m))
  }
}

/** Native Catalyst expression: CONTENT-DEFINED chunking of a text column —
  * gear-hash CDC (the rolling-hash family of LBFS/Rabin chunking and
  * FastCDC, Xia et al. USENIX ATC 2016). The text splits at positions
  * where a byte-driven rolling hash's top `maskBits` bits are zero, so
  * chunk boundaries
  * are a function of LOCAL CONTENT, not absolute offsets: insert a byte
  * near the front and every fixed-window scheme re-keys all downstream
  * windows, while CDC boundaries re-synchronize at the next content
  * boundary and every later chunk hashes identically — the property that
  * makes chunk-level dedup robust to shifted/edited duplication.
  *
  * Per chunk: `(hash, n_bytes)` where hash = XXH64 of the chunk's byte
  * range in place (seed 42, like every hash in this engine). The gear
  * table is derived from splitmix64 (public-domain constants) so the
  * chunking is deterministic across JVMs and engines. `maskBits` sets the
  * expected chunk size (2^maskBits bytes); `minBytes`/`maxBytes` bound
  * every chunk (the max bound force-splits pathological content that
  * never masks to zero). The rolling state is NEVER reset: a byte's
  * influence shifts out of the 64-bit state after 64 steps, so the
  * boundary predicate is a pure function of the trailing 64 content
  * bytes — shifted streams agree on every candidate boundary once the
  * edit's 64-byte horizon passes, and re-align fully at the first shared
  * boundary. */
final case class ContentChunks(child: Expression, maskBits: Int,
                               minBytes: Int, maxBytes: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(maskBits >= 1 && maskBits <= 28,
    s"maskBits must be in [1,28] (got $maskBits)")
  require(minBytes >= 1, s"minBytes must be >= 1 (got $minBytes)")
  require(maxBytes >= minBytes,
    s"maxBytes ($maxBytes) must be >= minBytes ($minBytes)")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("hash", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "content_chunks"

  override def nullSafeEval(input: Any): Any =
    ContentChunks.compute(input.asInstanceOf[UTF8String],
      maskBits, minBytes, maxBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ContentChunks.compute($c, $maskBits, $minBytes, $maxBytes)")

  override protected def withNewChildInternal(newChild: Expression): ContentChunks =
    copy(child = newChild)
}

object ContentChunks {
  private final val Seed = 42L

  /** 256 gear values from splitmix64 — deterministic, engine-portable. */
  private val Gear: Array[Long] = Array.tabulate(256) { b =>
    var z = b.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(text: UTF8String, maskBits: Int,
              minBytes: Int, maxBytes: Int): ArrayData = {
    val base = text.getBaseObject
    val off  = text.getBaseOffset
    val len  = text.numBytes
    if (len == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    // FastCDC's lesson: test the HIGH bits. With h = (h<<1)+G[b], the low
    // bits reflect only the last few bytes' gear parities — correlated on
    // a limited alphabet (real text) and measurably off the 2^-maskBits
    // boundary rate; the high bits accumulate a ~64-byte mixed history.
    val shift = 64 - maskBits
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    while (i < len) {
      h = (h << 1) + Gear(Platform.getByte(base, off + i) & 0xff)
      val size = i - start + 1
      if ((size >= minBytes && (h >>> shift) == 0L) || size >= maxBytes) {
        out += org.apache.spark.sql.catalyst.InternalRow(
          XXH64.hashUnsafeBytes(base, off + start, size, Seed), size)
        start = i + 1
        // h is NOT reset: with h = (h<<1)+G[b] a byte's influence shifts
        // out after 64 steps, so the boundary predicate is a pure function
        // of the last <=64 CONTENT bytes — two shifted streams agree on
        // every candidate boundary once 64 bytes past the edit, and the
        // min-size suppression re-aligns at the first shared boundary.
        // (Resetting per chunk would make boundaries depend on each
        // chunk's start position, and shifted streams could stay
        // desynchronized indefinitely.)
      }
      i += 1
    }
    if (start < len) {
      out += org.apache.spark.sql.catalyst.InternalRow(
        XXH64.hashUnsafeBytes(base, off + start, len - start, Seed),
        len - start)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

object TextExpressions {
  /** Codegen'd xxhash64 shingle hashes (window order, duplicates kept). */
  def shingleHashesNative(text: Column, n: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(text), n))

  /** Codegen'd gear-hash content-defined chunks: array of (hash, n_bytes). */
  def contentChunksNative(text: Column, maskBits: Int,
                          minBytes: Int, maxBytes: Int): Column =
    GraftBridge.column(ContentChunks(GraftBridge.expression(text),
      maskBits, minBytes, maxBytes))

  /** Codegen'd distinct character q-gram hashes (first-occurrence order). */
  def charGramHashesNative(text: Column, q: Int): Column =
    GraftBridge.column(CharGramHashes(GraftBridge.expression(text), q))

  /** Codegen'd k-wide MinHash signature from shingle hashes. */
  def minhashSignatureNative(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(hashes), k))

  /** Codegen'd max-multiplicity fraction of a hash array (0.0 if empty). */
  def topFreqFracNative(hashes: Column): Column =
    GraftBridge.column(TopFreqFrac(GraftBridge.expression(hashes)))
}
