package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {

  test("Viterbi picks the maximum-likelihood segmentation on a hand model") {
    import spark.implicits._
    // "unread": p(un)·p(read) must beat p(u)p(n)p(r)... and p(unre)p(ad)
    val lp = Map("un" -> math.log(0.2), "read" -> math.log(0.2),
      "u" -> math.log(0.01), "n" -> math.log(0.01), "r" -> math.log(0.01),
      "e" -> math.log(0.01), "a" -> math.log(0.01), "d" -> math.log(0.01),
      "unre" -> math.log(0.05), "ad" -> math.log(0.05))
    val vocab = Unigram.Vocab(lp, maxPieceLen = 4)
    val got = Seq("unread").toDF("text")
      .select(Unigram.tokenize(col("text"), vocab)).head().getSeq[String](0)
    assert(got === Seq("un", "read"))
  }

  test("EM training on a toy dict surfaces the shared stems as pieces") {
    val dict = Seq(("low", 5L), ("lower", 2L), ("lowest", 6L), ("slower", 3L))
    val vocab = Unigram.trainFromDict(dict, vocabSize = 14, maxPieceLen = 6)
    // coverage chars always survive; the high-mass stem must be a piece
    val pieces = vocab.logProbs.keySet
    assert(pieces.exists(p => p.contains("low") && p.length >= 3),
      s"no low-stem piece in $pieces")
    // the model is a distribution-ish table: all logprobs finite & <= 0
    assert(vocab.logProbs.values.forall(v => v <= 0 && !v.isNaN))
  }

  test("segmentation is TOTAL: every word reconstructs, unseen chars included") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny)
    val vocab = Unigram.train(docs, vocabSize = 400, maxVocab = 5000)
    val words = docs.select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .select(lower(col("w")).as("w")).filter(length(col("w")) >= 1)
      .distinct().limit(300)
      // plus words with characters the training never saw
      .unionByName(Seq("größe", "東京x", "año").toDF("w"))
    val bad = words
      .select(col("w"),
        array_join(Unigram.tokenize(col("w"), vocab), "").as("re"))
      .filter(col("w") =!= col("re"))
    assert(bad.count() === 0,
      "unigram tokens must concatenate back to the original word")
  }

  test("tokenCount == size(tokenize); training is deterministic") {
    val docs = Tables.documents(spark, sfTiny).limit(100)
    val v1 = Unigram.train(Tables.documents(spark, sfTiny), vocabSize = 300,
      maxVocab = 3000)
    val v2 = Unigram.train(Tables.documents(spark, sfTiny), vocabSize = 300,
      maxVocab = 3000)
    assert(v1 === v2, "same corpus must learn the same model")
    val bad = docs.select(
        Unigram.tokenCount(col("text"), v1).as("n"),
        size(Unigram.tokenize(col("text"), v1)).cast("long").as("m"))
      .filter(col("n") =!= col("m"))
    assert(bad.count() === 0)
  }

  test("a trained model compresses: fewer tokens than the char baseline") {
    val docs = Tables.documents(spark, sfTiny)
    val vocab = Unigram.train(docs, vocabSize = 500, maxVocab = 5000)
    val sample = docs.limit(200)
    val Seq(chars, toks) = sample.agg(
        sum(length(regexp_replace(lower(col("text")), " ", ""))).cast("double"),
        sum(Unigram.tokenCount(col("text"), vocab)).cast("double"))
      .head().toSeq.map(_.asInstanceOf[Double]).toSeq
    assert(toks < chars * 0.7,
      s"unigram model should beat chars by >30%: $toks vs $chars")
  }

  test("EM does not decrease dict likelihood across shrink-free iterations") {
    // run two trains differing only in emIters; more EM on the same seed
    // must not end at a lower likelihood — measured via total token cost
    // of the training dict itself (a monotone proxy: higher-likelihood
    // models assign cheaper segmentations)
    import spark.implicits._
    val dict = Seq(("internationalization", 4L), ("international", 6L),
      ("nation", 9L), ("nationalize", 3L), ("internal", 5L))
    val v1 = Unigram.trainFromDict(dict, vocabSize = 40, emIters = 1)
    val v4 = Unigram.trainFromDict(dict, vocabSize = 40, emIters = 6)
    def cost(v: Unigram.Vocab): Double = {
      val df = dict.toDF("w", "f")
      df.select(sum(col("f") * Unigram.tokenCount(col("w"), v)))
        .head().getLong(0).toDouble
    }
    assert(cost(v4) <= cost(v1) + 1e-9,
      "more EM must not worsen the dict segmentation cost")
  }

  test("empty and whitespace-only text tokenize to zero tokens, no crash") {
    import spark.implicits._
    val vocab = Unigram.Vocab(Map("a" -> -1.0), maxPieceLen = 2)
    val got = Seq("", "   ").toDF("text")
      .select(Unigram.tokenCount(col("text"), vocab).as("n"))
      .collect().map(_.getLong(0))
    assert(got.forall(_ === 0L))
  }
}
