package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Separable two-vocabulary fixture: positive docs speak {good, clean,
  // prose}, negative docs speak {spam, junk, noise}; one mixed doc.
  private lazy val seedDocs = Seq(
    (1L, "good clean prose good", true),
    (2L, "clean prose clean good clean", true),
    (3L, "prose good prose", true),
    (4L, "spam junk noise spam", false),
    (5L, "junk noise junk spam junk", false),
    (6L, "noise spam noise", false),
    (7L, "good spam", false) // mixed — sits between the camps
  ).toDF("doc_id", "text", "lbl")

  test("nbSeedScore separates the seed vocabularies") {
    val r = Classifier.nbSeedScore(seedDocs, col("lbl"), nBuckets = 512)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    for (p <- Seq(1L, 2L, 3L); n <- Seq(4L, 5L, 6L))
      assert(r(p) > r(n), s"pos doc $p should out-score neg doc $n")
    // the mixed doc sits strictly between the pure camps
    assert(r(7L) < Seq(1L, 2L, 3L).map(r).min)
    assert(r(7L) > Seq(4L, 5L, 6L).map(r).max)
  }

  test("nbSeedScore: token-less and null-text docs surface with zero score") {
    val docs = seedDocs.union(
      Seq((8L, null.asInstanceOf[String], false)).toDF("doc_id", "text", "lbl"))
    val r = Classifier.nbSeedScore(docs, col("lbl"))
      .filter(col("doc_id") === 8L).collect()(0)
    assert(r.getLong(2) === 0L && r.getDouble(3) === 0.0)
  }

  test("nbSeedScore: n_toks counts every token (buckets never drop one)") {
    val r = Classifier.nbSeedScore(seedDocs, col("lbl"), nBuckets = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(1L) === 4L && r(5L) === 5L)
  }

  test("nbSeedScore is deterministic across runs") {
    def run() = Classifier.nbSeedScore(
        graft.Tables.documents(spark, sfTiny), col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(run() === run())
  }

  test("nbSeedScore refuses invalid args") {
    intercept[IllegalArgumentException] {
      Classifier.nbSeedScore(seedDocs, col("lbl"), nBuckets = 0)
    }
    intercept[IllegalArgumentException] {
      Classifier.nbSeedScore(seedDocs, col("lbl"), smoothing = 0.0)
    }
    intercept[IllegalArgumentException] {
      Classifier.nbSeedScore(seedDocs, col("lbl"), wordNgrams = 4)
    }
  }

  test("nbSeedScore wordNgrams=2 widens the en/zh log-odds gap on the " +
    "transition-signal corpus") {
    // the fixture's languages share one small vocabulary and differ
    // mostly in token TRANSITIONS: bigram features must separate the
    // class means more than unigram features do
    val docs = graft.Tables.documents(spark, sfTiny)
    def gap(n: Int): Double = {
      val scored = Classifier.nbSeedScore(docs, col("lang") === "en",
          wordNgrams = n)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang").agg(avg("nb_logodds").as("m"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      scored("en") - scored("zh")
    }
    val uni = gap(1)
    val bi = gap(2)
    assert(bi > 0, s"bigram NB must separate en from zh (gap $bi)")
    assert(bi > uni * 2,
      s"bigram gap $bi should dwarf the unigram gap $uni")
  }

  test("lrSeedScore learns the separable fixture to 100% training accuracy") {
    val r = Classifier.lrSeedScore(seedDocs.filter(col("doc_id") =!= 7L),
        col("lbl"), nBuckets = 512, epochs = 30)
      .collect().map(x => (x.getLong(0), x.getBoolean(1), x.getDouble(2)))
    for ((id, pos, s) <- r)
      assert(if (pos) s > 0.5 else s < 0.5,
        s"doc $id (pos=$pos) scored $s")
  }

  test("lrSeedScore is bit-deterministic (decimal-routed gradients)") {
    def run() = Classifier.lrSeedScore(seedDocs, col("lbl"),
        nBuckets = 64, epochs = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(run() === run())
  }

  test("lrSeedScore dominates nbSeedScore's label precision on the corpus") {
    // Both classifiers score the corpus against the same seed (lang=en);
    // the gate is label-grounded: each model's top-25 "most English" set
    // is scored for en-precision against the actual lang labels, and the
    // discriminative bigram LR must (a) clear 0.9 on its own and
    // (b) dominate the generative unigram-NB yardstick. (A mutual
    // top-25-overlap gate is NOT meaningful here: both models put en
    // docs on top, but with ~200 en docs the order WITHIN the class is
    // not identifiability-constrained between a unigram-generative and
    // a bigram-discriminative model — overlap measured ≈0 while both
    // models are behaving correctly. What curation needs is that the
    // kept slice IS the seed language.)
    val docs = graft.Tables.documents(spark, sfTiny)
    val langOf = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nbTop = Classifier.nbSeedScore(docs, col("lang") === "en")
      .orderBy(desc("nb_logodds"), asc("doc_id")).limit(25)
      .select("doc_id").collect().map(_.getLong(0))
    // epochs = 8 is what the text_quality_classifier_lr catalog entry
    // ships — the spec gates the shipped hyperparameters.
    val lrTop = Classifier.lrSeedScore(docs, col("lang") === "en",
        epochs = 8)
      .orderBy(desc("lr_score"), asc("doc_id")).limit(25)
      .select("doc_id").collect().map(_.getLong(0))
    val nbPrec = nbTop.count(langOf(_) == "en")
    val lrPrec = lrTop.count(langOf(_) == "en")
    assert(lrPrec >= 23, s"LR top-25 en-precision only $lrPrec/25")
    assert(lrPrec >= nbPrec,
      s"LR top-25 en-precision $lrPrec below NB's $nbPrec")
  }

  test("lrSeedScore separates en from zh on the real fixture") {
    val docs = graft.Tables.documents(spark, sfTiny)
    // epochs = 8: same hyperparameters as the shipped catalog entry.
    val scored = Classifier.lrSeedScore(docs, col("lang") === "en",
        epochs = 8)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val means = scored.groupBy("lang").agg(avg("lr_score").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means("en") > means("zh") + 0.2,
      s"en=${means("en")} zh=${means("zh")}")
  }

  test("lrSeedScore wordNgrams=2 separates sources a bag of unigrams cannot") {
    // Two sources with IDENTICAL unigram frequency profiles but opposite
    // transition structure: positives alternate x->y, negatives y->x.
    // In unigram space the classes coincide; in bigram space they are
    // disjoint — the fastText wordNgrams signal this op exists for.
    val docs = Seq(
      (1L, "x y x y x y x y", true), (2L, "x y x y x y", true),
      (3L, "x y x y x y x y x y", true),
      (4L, "y x y x y x y x", false), (5L, "y x y x y x", false),
      (6L, "y x y x y x y x y x", false)
    ).toDF("doc_id", "text", "lbl")
    val bi = Classifier.lrSeedScore(docs, col("lbl"), nBuckets = 64,
        epochs = 10, wordNgrams = 2)
      .collect().map(r => (r.getBoolean(1), r.getDouble(2)))
    for ((pos, s) <- bi)
      assert(if (pos) s > 0.5 else s < 0.5, s"bigram LR: pos=$pos scored $s")
    // unigram-only LR sees identical feature profiles (x and y both at
    // ~50% in every doc, lengths matched pairwise) — no separation
    val uni = Classifier.lrSeedScore(docs, col("lbl"), nBuckets = 64,
        epochs = 10, wordNgrams = 1)
      .collect().map(r => (r.getBoolean(1), r.getDouble(2)))
    val uniPos = uni.filter(_._1).map(_._2).sum / 3.0
    val uniNeg = uni.filterNot(_._1).map(_._2).sum / 3.0
    assert(math.abs(uniPos - uniNeg) < 0.05,
      s"unigram LR should not separate transition-only classes " +
        s"(pos=$uniPos neg=$uniNeg)")
  }

  test("lrSeedScore refuses out-of-range wordNgrams") {
    intercept[IllegalArgumentException] {
      Classifier.lrSeedScore(seedDocs, col("lbl"), wordNgrams = 0)
    }
    intercept[IllegalArgumentException] {
      Classifier.lrSeedScore(seedDocs, col("lbl"), wordNgrams = 4)
    }
  }

  test("lrSeedScore model stays nBuckets-bounded") {
    // guards the scale contract: the per-epoch collect is the gradient
    // table, never data — bounded by nBuckets regardless of corpus size
    val r = Classifier.lrSeedScore(seedDocs, col("lbl"), nBuckets = 8,
      epochs = 2)
    assert(r.count() === 7L)
  }
}
