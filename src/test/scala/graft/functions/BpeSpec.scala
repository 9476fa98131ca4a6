package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  test("merge learning matches the hand-computed Sennrich example") {
    // the classic worked example: {low:5, lower:2, newest:6, widest:3}
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.learnFromDict(dict, nMerges = 6)
    val got = merges.map(m => (m.left, m.right))
    // pair counts: (e,s)=(s,t)=(t,</w>)=9 → lexicographic tie-break picks
    // (e,s); then the cascade es+t, est+</w>; then (l,o)/(o,w)=7 → (l,o),
    // lo+w; then the 6-tier (e,w)/(n,e)/(w,est</w>) → (e,w)
    assert(got === Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"), ("e", "w")))
    assert(merges.map(_.rank) === Seq(0, 1, 2, 3, 4, 5))
  }

  test("tokenizing an UNSEEN word applies learned merges: lowest → low|est") {
    import spark.implicits._
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.learnFromDict(dict, nMerges = 6)
    val got = Seq("lowest").toDF("text")
      .select(Bpe.tokenize(col("text"), merges)).head().getSeq[String](0)
    assert(got === Seq("low", "est"))
  }

  test("token concatenation reconstructs the lowercased word") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny)
    val merges = Bpe.learnMerges(docs, nMerges = 80)
    val words = docs.select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .select(lower(col("w")).as("w")).filter(length(col("w")) >= 1)
      .distinct().limit(300)
    val bad = words
      .select(col("w"), array_join(Bpe.tokenize(col("w"), merges), "").as("re"))
      .filter(col("w") =!= col("re"))
    assert(bad.count() === 0,
      "BPE tokens must concatenate back to the original word")
  }

  test("tokenCount == size(tokenize) and counting is deterministic") {
    val docs = Tables.documents(spark, sfTiny).limit(100)
    val merges = Bpe.learnMerges(Tables.documents(spark, sfTiny), nMerges = 50)
    val bad = docs.select(
        Bpe.tokenCount(col("text"), merges).as("n"),
        size(Bpe.tokenize(col("text"), merges)).cast("long").as("m"))
      .filter(col("n") =!= col("m"))
    assert(bad.count() === 0)
    val a = docs.select(col("doc_id"), Bpe.tokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = docs.select(col("doc_id"), Bpe.tokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("more merges never increase a document's token count") {
    val docs = Tables.documents(spark, sfTiny).limit(200)
    val corpus = Tables.documents(spark, sfTiny)
    val m10 = Bpe.learnMerges(corpus, nMerges = 10)
    val m80 = Bpe.learnMerges(corpus, nMerges = 80)
    // rank order is stable: the 80-merge table starts with the 10-merge one
    assert(m80.take(10).map(m => (m.left, m.right)) ===
      m10.map(m => (m.left, m.right)))
    val grew = docs.select(
        Bpe.tokenCount(col("text"), m10).as("n10"),
        Bpe.tokenCount(col("text"), m80).as("n80"))
      .filter(col("n80") > col("n10"))
    assert(grew.count() === 0, "extra merges can only merge further")
  }

  test("trained tokenizer beats the char baseline and the estimate tracks it") {
    val docs = Tables.documents(spark, sfTiny)
    val merges = Bpe.learnMerges(docs, nMerges = 200)
    val row = docs.select(
        avg(Bpe.tokenCount(col("text"), merges)).as("bpe"),
        avg(TextFunctions.tokenCount(col("text"))).as("words"),
        avg(length(col("text"))).as("chars")).head()
    val (bpe, words, chars) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    info(f"avg per doc: chars=$chars%.1f bpe=$bpe%.1f words=$words%.1f")
    // with 200 merges the learned tokenizer sits well below characters
    // (merges compress) and at or above whitespace words (subwords split)
    assert(bpe < chars * 0.8, "200 merges should compress well below chars")
    assert(bpe >= words, "subword count can never undercut word count")
  }

  test("empty and whitespace-only text tokenize to zero tokens, no crash") {
    import spark.implicits._
    val merges = Bpe.learnFromDict(Seq(("ab", 3L)), nMerges = 2)
    val got = Seq("", " ", "  ").toDF("text")
      .select(Bpe.tokenCount(col("text"), merges)).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(0L, 0L, 0L))
  }
}
