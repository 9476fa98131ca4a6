package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfTiny).cache()

  test("split is deterministic, content-keyed, and roughly 80/10/10") {
    val once = CorpusOps.withSplit(docs)
    val again = CorpusOps.withSplit(docs)
    assert(once.select("doc_id", "split").collect().toSet ===
      again.select("doc_id", "split").collect().toSet)
    val frac = once.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(frac("train") / n > 0.7 && frac("train") / n < 0.9)
    assert(frac.getOrElse("val", 0L) / n < 0.2)
    assert(frac.getOrElse("test", 0L) / n < 0.2)
    // content-keyed: identical texts land in the same split
    val dupSplits = once.groupBy("text")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1)
    assert(dupSplits.count() === 0)
  }

  test("contamination flags exactly the docs sharing an n-gram with the benchmark") {
    val corpus = docs.filter(col("doc_id") >= 10)
    val bench = docs.filter(col("doc_id") < 10)
    val flagged = CorpusOps.contaminated(corpus, bench, n = 4)
    // cross-check one flagged doc really shares a 4-gram
    val row = flagged.orderBy(desc("n_shared_shingles")).head()
    val docShingles = corpus.filter(col("doc_id") === row.getLong(0))
      .select(explode(TextFunctions.tokenShingles(col("text"), 4)).as("g"))
      .collect().map(_.getString(0)).toSet
    val benchShingles = bench
      .select(explode(TextFunctions.tokenShingles(col("text"), 4)).as("g"))
      .collect().map(_.getString(0)).toSet
    val shared = docShingles.intersect(benchShingles)
    assert(shared.size.toLong === row.getLong(1))
    // a doc made of fresh vocabulary is never flagged
    import spark.implicits._
    val clean = Seq((9999L, "zz yy xx ww vv uu tt ss")).toDF("doc_id", "text")
    assert(CorpusOps.contaminated(clean, bench, n = 4).count() === 0)
  }
}
