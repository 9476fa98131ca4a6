package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {

  import spark.implicits._

  test("bm25: tf monotonicity, df discounting, length normalization") {
    // equal-length docs; d1 repeats the query term more often
    val docs = Seq(
      (1L, "apple pear plum kiwi apple apple"),
      (2L, "apple pear plum kiwi mango grape"),
      (3L, "mango grape fig date plum cherry"),
      // a long document diluting one hit
      (4L, "apple " + (1 to 40).map(i => s"filler$i").mkString(" ")))
      .toDF("doc_id", "text")
    val queries = Seq((1, "apple")).toDF("query_id", "query_text")
    val r = Search.bm25TopK(docs, queries, k = 10)
      .orderBy(col("rank")).collect()
    // doc 3 has no hit -> absent entirely
    assert(r.map(_.getLong(1)).toSeq === Seq(1L, 2L, 4L))
    // tf monotone: 3 hits beat 1 hit at equal length; length norm: the
    // 41-token doc ranks below the 6-token doc with the same tf
    val scores = r.map(x => x.getLong(1) -> x.getDouble(2)).toMap
    assert(scores(1L) > scores(2L))
    assert(scores(2L) > scores(4L))
    assert(scores.values.forall(_ > 0.0))
  }

  test("bm25: multi-term queries sum per-term scores; rank ties by doc id") {
    val docs = Seq(
      (10L, "red blue"), (11L, "red blue"), // exact ties
      (12L, "red green"), (13L, "yellow green"))
      .toDF("doc_id", "text")
    val queries = Seq((7, "red blue")).toDF("query_id", "query_text")
    val r = Search.bm25TopK(docs, queries, k = 3)
      .orderBy(col("rank")).collect()
    assert(r.length === 3)
    // both-term docs beat the one-term doc; the tie resolves low-id-first
    assert(r.map(_.getLong(1)).toSeq === Seq(10L, 11L, 12L))
    assert(r(0).getDouble(2) === r(1).getDouble(2))
    assert(r.map(_.getLong(3)).toSeq === Seq(1L, 2L, 3L))
  }

  test("bm25: query terms are a set (repeated term counts once)") {
    val docs = Seq((1L, "ping pong ping"), (2L, "ping other other"))
      .toDF("doc_id", "text")
    val once = Search.bm25TopK(docs,
      Seq((1, "ping")).toDF("query_id", "query_text"), k = 5)
    val twice = Search.bm25TopK(docs,
      Seq((1, "ping ping")).toDF("query_id", "query_text"), k = 5)
    assert(once.orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
      .toSeq === twice.orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("bm25: k bounds every query's results on real data; plan broadcasts") {
    val docs = Tables.documents(spark, sfTiny)
    val queries = Seq((1, "hash join"), (2, "window agg"))
      .toDF("query_id", "query_text")
    val r = Search.bm25TopK(docs, queries, k = 5)
    val counts = r.groupBy("query_id").count().collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(counts.values.forall(_ <= 5))
    assert(counts.values.exists(_ > 0))
    // scale shape: the corpus-side joins are broadcasts (query terms, df,
    // scalars) — no shuffle-join of the postings against anything
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"),
      s"postings should never shuffle-join a broadcast-sized side:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
