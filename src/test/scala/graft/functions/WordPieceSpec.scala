package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfTiny).cache()

  test("training scores by likelihood, not raw count (the anti-BPE fixture)") {
    // pair (a, ##b) occurs 6 times but its parts are ubiquitous;
    // pair (c, ##d) occurs 4 times and its parts occur NOWHERE else:
    //   score(a,##b) = 6 / (106 · 6)  ≈ 0.0094
    //   score(c,##d) = 4 / (4 · 4)    = 0.25  → WordPiece merges cd FIRST
    // (a frequency-scored BPE trainer would merge ab first)
    val dict = Seq(("ab", 6L), ("a", 100L), ("b", 100L), ("cd", 4L))
    val vocab = WordPiece.learnFromDict(dict, nMerges = 1)
    assert(vocab.contains("cd") && !vocab.contains("ab"),
      s"likelihood scoring must pick the rare-parts pair: $vocab")
    // and BPE, on the same dict shape, picks by count — the two families
    // genuinely differ (guards against WordPiece silently being BPE)
    val bpe = Bpe.learnFromDict(dict, nMerges = 1)
    assert(bpe.head.left == "a" || bpe.head.left == "b",
      s"BPE control should merge on raw frequency: ${bpe.head}")
    // alphabet precedes merges, sorted, with continuation forms
    assert(vocab.takeWhile(!_.equals("cd")).toSeq ===
      Seq("##b", "##d", "a", "b", "c"))
  }

  test("application is greedy longest-match-first; unmatchable words are one [UNK]") {
    import spark.implicits._
    val vocab = Seq("un", "##aff", "##able", "ab", "a", "##b", "##bc", "##c")
    val df = Seq("unaffable", "abc", "a", "xyz", "").toDF("text")
    val got = df.select(WordPiece.tokenize(col("text"), vocab).as("t"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) === List("un", "##aff", "##able")) // the classic example
    // greedy takes "ab" (longest first prefix) then "##c" — NOT a + ##bc
    assert(got(1) === List("ab", "##c"))
    assert(got(2) === List("a"))
    assert(got(3) === List("[UNK]")) // no partial segmentations
    assert(got(4) === Nil)           // empty word → zero tokens
  }

  test("trained vocab fully covers its training corpus; counts match tokenize") {
    val vocab = WordPiece.learnVocab(docs, nMerges = 100)
    val toks = docs.select(col("doc_id"),
      WordPiece.tokenize(col("text"), vocab).as("t"),
      WordPiece.tokenCount(col("text"), vocab).as("n"))
    // count kernel == tokenize size, row for row
    assert(toks.filter(size(col("t")) =!= col("n")).count() === 0)
    // the alphabet covers every char seen in training → zero [UNK]
    assert(toks.filter(array_contains(col("t"), WordPiece.Unk)).count() === 0)
    // reconstruction: concatenating pieces (## stripped) rebuilds the text
    val rebuilt = toks.select(col("doc_id"),
      array_join(transform(col("t"),
        p => regexp_replace(p, "^##", "")), "").as("r"))
      .join(docs.select(col("doc_id"),
        regexp_replace(lower(col("text")), " ", "").as("w")), "doc_id")
    assert(rebuilt.filter(col("r") =!= col("w")).count() === 0)
    // a char unseen in training IS [UNK]
    import spark.implicits._
    val unseen = Seq("zebrañ")  // ñ never appears in the fixture
      .toDF("text")
      .select(WordPiece.tokenize(col("text"), vocab).as("t"))
      .collect().head.getSeq[String](0)
    assert(unseen === Seq(WordPiece.Unk))
    // determinism: the same corpus learns the same vocabulary
    assert(vocab === WordPiece.learnVocab(docs, nMerges = 100))
  }

  test("merging compresses: more merges, fewer pieces, floored at word count") {
    val v0 = WordPiece.learnVocab(docs, nMerges = 0)
    val v200 = WordPiece.learnVocab(docs, nMerges = 200)
    val counts = docs.select(
      sum(WordPiece.tokenCount(col("text"), v0)).as("chars"),
      sum(WordPiece.tokenCount(col("text"), v200)).as("merged"),
      sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
        .as("words")).collect().head
    assert(counts.getLong(1) < counts.getLong(0),
      "merges must reduce piece counts")
    assert(counts.getLong(1) >= counts.getLong(2),
      "a word is never fewer than one piece")
  }
}
