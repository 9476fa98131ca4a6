package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BitwiseCount, BitwiseXor, Expression, ExpressionInfo}
import graft.functions.expressions.{CosineSimilarity, MinHashSignature, ShingleHashes}

/** SQL surface for the library's native expressions, via the standard
  * `SparkSessionExtensions` hook — the (c) tier of SURVEY §7.4's extension
  * ladder. Lets SQL-only users (`spark.sql`, thrift, notebooks) call the
  * codegen'd kernels directly:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   SELECT cosine_similarity(a.embedding, b.embedding) FROM …
  *   SELECT shingle_hashes(text, 3) FROM documents
  *   SELECT hamming64(sh_a, sh_b) FROM simhashes
  *
  * For a session that already exists (the round driver owns session
  * construction), [[GraftExtensions.register]] installs the same functions
  * as temp functions through the session's registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def one(name: String, clazz: Class[_], usage: String,
                  builder: Seq[Expression] => Expression)
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, null, name, usage, ""),
      builder)

  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.length}")

  /** The injectable function set (name, info, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    one("cosine_similarity", classOf[CosineSimilarity],
      "cosine_similarity(a, b) - cosine similarity of two float vectors " +
        "(codegen'd; 0.0 for zero-norm inputs)",
      args => { arity("cosine_similarity", 2, args)
        CosineSimilarity(args(0), args(1)) }),
    one("shingle_hashes", classOf[ShingleHashes],
      "shingle_hashes(text, n) - xxhash64 of every n-token shingle, in " +
        "window order with duplicates (n must be a literal integer)",
      args => { arity("shingle_hashes", 2, args)
        val n = args(1) match {
          case e if e.foldable => e.eval() match {
            case i: java.lang.Integer => i.intValue()
            case l: java.lang.Long    => l.intValue()
            case null => throw new IllegalArgumentException(
              "shingle_hashes: n must not be NULL")
            case other => throw new IllegalArgumentException(
              s"shingle_hashes: n must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "shingle_hashes: n must be a literal")
        }
        ShingleHashes(args(0), n) }),
    one("minhash_signature", classOf[MinHashSignature],
      "minhash_signature(hashes, k) - k-wide MinHash signature from an " +
        "array of shingle hashes (k must be a literal integer; empty " +
        "arrays yield the sentinel signature)",
      args => { arity("minhash_signature", 2, args)
        val k = args(1) match {
          case e if e.foldable => e.eval() match {
            case i: java.lang.Integer => i.intValue()
            case l: java.lang.Long    => l.intValue()
            case null => throw new IllegalArgumentException(
              "minhash_signature: k must not be NULL")
            case other => throw new IllegalArgumentException(
              s"minhash_signature: k must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "minhash_signature: k must be a literal")
        }
        MinHashSignature(args(0), k) }),
    one("hamming64", classOf[BitwiseCount],
      "hamming64(a, b) - Hamming distance between two 64-bit fingerprints " +
        "(bit_count(a ^ b))",
      args => { arity("hamming64", 2, args)
        BitwiseCount(BitwiseXor(args(0), args(1))) }),
    one("signature_agreement",
      classOf[graft.functions.expressions.SignatureAgreement],
      "signature_agreement(a, b) - fraction of positions where two " +
        "array<bigint> MinHash signatures agree (the Jaccard estimate; " +
        "codegen'd)",
      args => { arity("signature_agreement", 2, args)
        graft.functions.expressions.SignatureAgreement(args(0), args(1)) }),
    one("collect_top_k",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK],
      "collect_top_k(item, k, reverse) - bounded-heap top-k aggregate: the " +
        "k largest items under struct ordering (smallest when reverse), " +
        "sorted best-first. The engine's own kernel (public but " +
        "SQL-surface-less in Spark 4.1); see graft.operators.TopK",
      args => { arity("collect_top_k", 3, args)
        def lit[T](e: Expression, what: String, f: PartialFunction[Any, T]): T =
          if (e.foldable) f.applyOrElse(e.eval(), (o: Any) =>
            throw new IllegalArgumentException(s"collect_top_k: $what literal required, got $o"))
          else throw new IllegalArgumentException(s"collect_top_k: $what must be a literal")
        val k = lit[Int](args(1), "integer k", {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long => l.intValue() })
        val rev = lit[Boolean](args(2), "boolean reverse", {
          case b: java.lang.Boolean => b.booleanValue() })
        // `new`: the companion with `apply` is private[aggregate] in 4.1
        new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
          args(0), k, rev, 0, 0) }))

  /** Install on an EXISTING session (the extensions hook only runs at
    * session construction, which the round driver owns). */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.registerFunctions(spark, functions)
}
