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

  test("lrSeedScore agrees with nbSeedScore on the fixture corpus ranking") {
    // Both classifiers score the corpus against the same seed (lang=en);
    // their top-25 "most English" sets should substantially overlap —
    // a generative/discriminative agreement gate, not bit equality.
    val docs = graft.Tables.documents(spark, sfTiny)
    val nbTop = Classifier.nbSeedScore(docs, col("lang") === "en")
      .orderBy(desc("nb_logodds"), asc("doc_id")).limit(25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lrTop = Classifier.lrSeedScore(docs, col("lang") === "en",
        epochs = 12)
      .orderBy(desc("lr_score"), asc("doc_id")).limit(25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nbTop.intersect(lrTop).size >= 15,
      s"top-25 overlap only ${nbTop.intersect(lrTop).size}")
  }

  test("lrSeedScore separates en from zh on the real fixture") {
    val docs = graft.Tables.documents(spark, sfTiny)
    val scored = Classifier.lrSeedScore(docs, col("lang") === "en",
        epochs = 12)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val means = scored.groupBy("lang").agg(avg("lr_score").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means("en") > means("zh") + 0.2,
      s"en=${means("en")} zh=${means("zh")}")
  }

  test("lrSeedScore model stays nBuckets-bounded") {
    // guards the scale contract: the per-epoch collect is the gradient
    // table, never data — bounded by nBuckets regardless of corpus size
    val r = Classifier.lrSeedScore(seedDocs, col("lbl"), nBuckets = 8,
      epochs = 2)
    assert(r.count() === 7L)
  }
}
