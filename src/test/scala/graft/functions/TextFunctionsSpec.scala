package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def fp(texts: String*): Seq[Long] =
    texts.toDF("text").select(TextFunctions.fingerprint(col("text")))
      .as[Long].collect().toSeq

  test("fingerprint: equal strings hash equal, stays in [0, p)") {
    val Seq(a, b, c) = fp("hello world", "hello world", "hello worlD")
    assert(a === b)
    assert(a !== c)
    assert(a >= 0 && a < 1000000007L)
  }

  test("fingerprint matches a reference JVM implementation") {
    // the aggregate() expression must equal a plain fold — this is the
    // overflow-safety regression test (round 1: ANSI ARITHMETIC_OVERFLOW)
    val samples = Seq("", "a", "The quick brown fox", "x" * 500,
      "punctuation, and: spaces!  doubled")
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
    assert(fp(samples: _*) === samples.map(ref))
  }

  test("fingerprint property: deterministic, bounded, matches JVM fold") {
    // ScalaCheck-generated inputs, evaluated in ONE Spark job (a job per
    // sample would be minutes); property: expression result == JVM fold,
    // in [0, p), for arbitrary printable-ASCII strings.
    val gen = Gen.listOfN(60, Gen.asciiPrintableStr)
    val samples = gen(Gen.Parameters.default, Seed(42L)).get
    def refFold(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
    val got = fp(samples: _*)
    assert(got === samples.map(refFold))
    got.foreach(h => assert(h >= 0 && h < 1000000007L))
  }

  test("token counts and shingles are consistent") {
    val df = Seq("one two three four").toDF("text")
    assert(df.select(TextFunctions.tokenCount(col("text"))).as[Int].head() === 4)
    assert(df.select(TextFunctions.uniqueTokenCount(col("text"))).as[Int].head() === 4)
    val shingles = df.select(TextFunctions.tokenShingles(col("text"), 3))
      .as[Seq[String]].head()
    assert(shingles === Seq("one two three", "two three four"))
    // fewer tokens than n -> empty
    val short = Seq("one two").toDF("text")
      .select(TextFunctions.tokenShingles(col("text"), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("native shingle hashes == interpreted HOF form, bit for bit") {
    // ShingleHashes hashes byte RANGES of the original string; it must be
    // bit-identical to xxhash64 over the materialized joined shingle for
    // every window, including empty tokens (doubled/leading/trailing
    // spaces), multi-byte UTF-8, and the < n tokens -> empty case.
    val texts = Seq(
      "one two three four",
      "a b", // fewer tokens than n
      "", // single empty token
      "  doubled  spaces  here x", // empty tokens preserved
      "trailing space x y ",
      " leading",
      "日本語 テキスト の シングル 検証", // multi-byte UTF-8
      "same same same same same")
    for (n <- Seq(1, 2, 3, 4)) {
      val df = texts.toDF("text")
      val hof = df.select(
        transform(TextFunctions.tokenShingles(col("text"), n), s => xxhash64(s))
          .as("h")).as[Seq[Long]].collect().toSeq
      val native = df.select(
        graft.functions.expressions.TextExpressions
          .shingleHashesNative(col("text"), n).as("h"))
        .as[Seq[Long]].collect().toSeq
      assert(native === hof, s"mismatch at n=$n")
    }
    // single empty token ("" has 1 token): n=1 hashes the empty string
    val empty = Seq("").toDF("text").select(
      graft.functions.expressions.TextExpressions
        .shingleHashesNative(col("text"), 1)).as[Seq[Long]].head()
    assert(empty.length === 1)
  }

  test("native shingle hashes property: random strings match HOF form") {
    val gen = Gen.listOfN(80, Gen.asciiPrintableStr)
    val samples = gen(Gen.Parameters.default, Seed(7L)).get
    val df = samples.toDF("text")
    val hof = df.select(
      array_distinct(transform(TextFunctions.tokenShingles(col("text"), 3),
        s => xxhash64(s))).as("h")).as[Seq[Long]].collect().toSeq
    val native = df.select(TextFunctions.shingleHashes(col("text"), 3).as("h"))
      .as[Seq[Long]].collect().toSeq
    assert(native === hof)
  }

  test("repetition signals: dup token fraction and multiplicity shingles") {
    val df = Seq(
      "a b c d",          // no repeats
      "a a a a",          // all one token
      "a b a b a b",      // alternating: 4 of 6 tokens are repeats
      "x").toDF("text")
    val fr = df.select(TextFunctions.dupTokenFrac(col("text"))).as[Double]
      .collect().toSeq
    assert(fr(0) === 0.0)
    assert(math.abs(fr(1) - 0.75) < 1e-12)
    assert(math.abs(fr(2) - (4.0 / 6)) < 1e-12)
    assert(fr(3) === 0.0)
    // shingleHashesAll keeps multiplicity: "a b" appears 3× in the
    // alternating text, and the most frequent bigram fraction is 3/5
    val hs = Seq("a b a b a b").toDF("text")
      .select(TextFunctions.shingleHashesAll(col("text"), 2).as("h"))
      .as[Seq[Long]].head()
    assert(hs.length === 5)
    val top = hs.groupBy(identity).map(_._2.size).max
    assert(top === 3)
  }

  test("native TopFreqFrac == explode+groupBy mode fraction, stays codegen'd") {
    import graft.functions.expressions.TextExpressions
    // constructed edges: empty (<2 tokens) -> 0.0, all-same -> 1.0,
    // alternating "a b a b a b" -> 3/5
    val edges = Seq("x", "a a a a a", "a b a b a b").toDF("text")
      .select(TextExpressions.topFreqFracNative(
        TextFunctions.shingleHashesAll(col("text"), 2)).as("f"))
      .as[Double].collect().toSeq
    assert(edges(0) === 0.0)
    assert(edges(1) === 1.0)
    assert(math.abs(edges(2) - 0.6) < 1e-12)
    // fixture equivalence against the shuffled form the catalog replaced
    val docs = graft.Tables.documents(spark, sfTiny)
    val native = docs.select(col("doc_id"),
        TextExpressions.topFreqFracNative(
          TextFunctions.shingleHashesAll(col("text"), 2)).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val shuffled = docs
      .select(col("doc_id"),
        explode(TextFunctions.shingleHashesAll(col("text"), 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the explode form drops shingle-less docs; the native form scores them 0.0
    assert(native.size >= shuffled.size)
    shuffled.foreach { case (id, f) => assert(native(id) === f, s"doc $id") }
    native.keySet.diff(shuffled.keySet).foreach(id => assert(native(id) === 0.0))
    // and the expression must not break whole-stage codegen
    val plan = docs.select(TextExpressions.topFreqFracNative(
        TextFunctions.shingleHashesAll(col("text"), 2)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") ||
      plan.linesIterator.exists(_.trim.matches("^(\\+- |: *)?\\*\\(\\d+\\).*")),
      s"TopFreqFrac runs outside codegen:\n$plan")
  }

  test("bpe estimate >= whitespace token count, exact on known input") {
    // each token contributes >= 1
    val df = Seq("a bb cccc dddddddd", "tiny").toDF("text")
    val got = df.select(TextFunctions.bpeTokenEstimate(col("text"))).as[Long].collect()
    // a->1, bb->1, cccc->1, dddddddd->2 = 5 ; tiny->1
    assert(got === Array(5L, 1L))
  }

  test("langId picks the marker-dominant language, und when no markers") {
    val df = Seq(
      "the cat and the dog of the house",
      "der hund und die katze ist nicht da",
      "el perro es que los gatos",
      "zzz qqq www").toDF("text")
    val got = df.select(TextFunctions.langId(col("text"))).as[String].collect()
    assert(got === Array("en", "de", "es", "und"))
  }

  test("quality score stays in [0,1]") {
    val df = Seq(
      ("the of and a to in is on for it", 500L),
      ("x", 1L),
      ("!!!!!!....;;;;", 14L)).toDF("text", "n_chars")
    val got = df.select(TextFunctions.qualityScore(col("text"), col("n_chars")))
      .as[Double].collect()
    got.foreach(q => assert(q >= 0.0 && q <= 1.0))
  }

  test("PII redaction: counts and sentinels, no false hits on clean text") {
    val df = Seq(
      "mail a@b.com and c.d+e@sub.example.org then call 555-0042 " +
        "or visit https://x.example.com/p?q=1 now",
      "no pii here at all",
      "handle @mention is not an email, 555-12 too short, 555-123456 ok prefix"
    ).toDF("text")
    val got = df.select(
      TextFunctions.countMatches(col("text"), TextFunctions.emailPattern).as("e"),
      TextFunctions.countMatches(col("text"), TextFunctions.phonePattern).as("p"),
      TextFunctions.countMatches(col("text"), TextFunctions.urlPattern).as("u"),
      TextFunctions.redactPii(col("text")).as("r"))
      .collect()
    assert((got(0).getInt(0), got(0).getInt(1), got(0).getInt(2)) === ((2, 1, 1)))
    val r0 = got(0).getString(3)
    assert(r0.contains("<EMAIL>") && r0.contains("<PHONE>") && r0.contains("<URL>"))
    assert(!r0.contains("@") && !r0.contains("555-0042") && !r0.contains("https://"))
    assert(got(1).getString(3) === "no pii here at all")
    // "@mention" has no local part; "555-12" misses \b{4}; "555-123456" has
    // no trailing boundary between digit 4 and 5 — 555-1234 would need \b
    assert(got(2).getInt(0) === 0)
    assert(got(2).getInt(1) === 0)
  }

  test("content chunks: lossless, bounded, deterministic") {
    val docs = graft.Tables.documents(spark, sfTiny)
    val chunks = CorpusOps.cdcChunks(docs, maskBits = 5, minBytes = 8,
      maxBytes = 256)
    // losslessness: chunk bytes re-sum to each document's byte length
    val bad = chunks.groupBy("doc_id")
      .agg(sum(col("chunk_bytes")).as("total"))
      .join(docs.select(col("doc_id"), octet_length(col("text")).as("len")),
        "doc_id")
      .filter(col("total") =!= col("len"))
    assert(bad.count() === 0, "chunks must partition the document exactly")
    // bounds: every chunk <= max; every NON-TAIL chunk >= min
    assert(chunks.filter(col("chunk_bytes") > 256).count() === 0)
    // at most one sub-min chunk per doc (the tail)
    val subMin = chunks.filter(col("chunk_bytes") < 8)
      .groupBy("doc_id").count().filter(col("count") > 1)
    assert(subMin.count() === 0, "only a document's tail may undershoot min")
    // determinism
    val a = chunks.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val b = CorpusOps.cdcChunks(docs, maskBits = 5, minBytes = 8,
        maxBytes = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(a.toSeq.sorted === b.toSeq.sorted)
    // expected size ~ minBytes + 2^maskBits = 40; loose band for the
    // max-clip and per-doc tail effects
    val mean = chunks.agg(avg(col("chunk_bytes"))).head().getDouble(0)
    assert(mean > 20 && mean < 80, s"mean chunk size $mean implausible for 2^5")
  }

  test("content chunks re-synchronize after an insertion; fixed windows do not") {
    // varied, non-repeating text so shared chunks can only come from true
    // re-synchronization, not from content repetition
    val t = (0 until 300).map(i => s"w${(i * 37) % 991}q${i}").mkString(" ")
    val shifted = "INSERTED-PREFIX-BYTES " + t
    def cdcHashes(s: String): Seq[Long] =
      Seq(s).toDF("text").select(explode(
        graft.functions.expressions.TextExpressions
          .contentChunksNative(col("text"), 5, 8, 256)).as("c"))
        .select(col("c.hash")).as[Long].collect().toSeq
    def fixedHashes(s: String): Seq[Long] = {
      // the strawman: hash every fixed 32-byte window
      val bytes = s.getBytes("UTF-8")
      bytes.grouped(32).map(g => scala.util.hashing.MurmurHash3
        .bytesHash(g).toLong).toSeq
    }
    val base = cdcHashes(t)
    val moved = cdcHashes(shifted)
    val shared = base.toSet.intersect(moved.toSet).size.toDouble / base.size
    assert(shared > 0.8,
      f"CDC must re-synchronize after the edit (shared $shared%.2f)")
    assert(base.last === moved.last, "the tail chunk must be identical")
    val fShared = fixedHashes(t).toSet
      .intersect(fixedHashes(shifted).toSet).size.toDouble /
      fixedHashes(t).size
    assert(fShared < 0.1,
      f"fixed windows must lose alignment entirely (shared $fShared%.2f)")
  }

  test("content chunks: empty and sub-min strings degrade to one tail chunk") {
    val got = Seq("", "tiny", "x" * 300).toDF("text")
      .select(size(graft.functions.expressions.TextExpressions
        .contentChunksNative(col("text"), 5, 8, 64)).as("n"))
      .as[Int].collect()
    assert(got(0) === 0, "empty string -> no chunks")
    assert(got(1) === 1, "sub-min string -> one tail chunk")
    // 300 identical bytes never mask to zero deterministically? they MAY —
    // but every chunk is <= max, so at least ceil(300/64) chunks exist
    assert(got(2) >= 5)
  }

  test("pseudonymization: same address -> same surrogate everywhere, no leak") {
    val df = Seq(
      (1L, "mail bob@x.com and sue@y.org today"),
      (2L, "bob@x.com wrote again to bob@x.com"),
      (3L, "no addresses here")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextFunctions.pseudonymizeEmails(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(3L) === "no addresses here", "match-free text passes through")
    assert(!out.values.exists(_.contains("@")), "no address may survive")
    val sur = "user_[0-9a-f]{8}".r
    val d1 = sur.findAllIn(out(1L)).toSeq
    val d2 = sur.findAllIn(out(2L)).toSeq
    assert(d1.length === 2 && d1.distinct.length === 2,
      "distinct addresses get distinct surrogates")
    assert(d2.distinct.length === 1, "repeats collapse to one surrogate")
    assert(d2.head === d1.head,
      "the SAME address must map to the SAME surrogate across documents")
  }

  test("URL domain extraction groups by host") {
    val df = Seq(
      "a https://one.example.com/x b http://two.example.net/y?z=1 c",
      "d https://one.example.com/other e").toDF("text")
    val got = df
      .select(explode(TextFunctions.urls(col("text"))).as("url"))
      .groupBy(TextFunctions.urlDomain(col("url")).as("d"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("one.example.com" -> 2L, "two.example.net" -> 1L))
  }
}
