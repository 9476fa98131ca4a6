package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text retrieval over the corpus — the IR primitive a training-data
  * pipeline runs for retrieval-based decontamination ("which training docs
  * would a benchmark query pull up?"), eval-set nearest-text lookup, and
  * corpus exploration. Classic Okapi BM25 (Robertson et al., TREC-3), the
  * public-default ranking function of Lucene/Elasticsearch.
  *
  * Scale shape (the query set is dimension-sized — tens to thousands of
  * queries — while the corpus is the 100 TB side):
  *  1. the corpus explodes to tokens but is immediately semi-joined against
  *     the BROADCAST query-term set, so non-matching tokens die inside the
  *     scan stage; only matching (doc, term) postings pay a shuffle, and
  *     that shuffle is partial-aggregated map-side (tf counts).
  *  2. document length rides along from the scan (computed scan-locally),
  *     so no second corpus-sized join is needed.
  *  3. df per query term and the (N, avgdl) scalars aggregate down to a
  *     query-term-sized / 1-row frame and come back as broadcasts.
  *  4. the final per-query ranking is a rank-limited window (Spark's
  *     WindowGroupLimit pushes k into the sort), never a global sort.
  * Nothing in the plan is ever quadratic in the corpus and nothing
  * data-sized reaches the driver.
  */
object Search {

  /** Top-`k` documents per query by BM25.
    *
    * `queries` must carry (`queryIdCol`, `queryTextCol`); query terms are
    * deduplicated per query (BM25 treats the query as a term set). Scoring:
    * `idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))` with the
    * smoothed `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`; `df` counts
    * documents containing the term, `avgdl` is the mean token count over
    * the corpus. Defaults k1=1.2, b=0.75 are the published Okapi values.
    *
    * Ranking order is made reproducible by quantizing the score to 1e-6
    * before ordering: documents with an identical (tf, dl) profile for the
    * query terms are MATHEMATICALLY tied, but float summation order
    * (partition order, engine) perturbs their scores at ~1e-16, so a raw
    * `ORDER BY score DESC` would rank them differently run to run. At 1e-6
    * granularity real ties land on the same key and resolve by ascending
    * doc id (total order, engine-portable); the emitted `score` column
    * stays unquantized.
    *
    * Output: (queryIdCol, idCol, score, rank) with rank in 1..k. A query
    * whose terms hit no document returns no rows.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               idCol: String = "doc_id", textCol: String = "text",
               queryIdCol: String = "query_id",
               queryTextCol: String = "query_text"): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(k1 >= 0.0, s"k1 must be >= 0 (got $k1)")
    require(b >= 0.0 && b <= 1.0, s"b must be in [0,1] (got $b)")

    val queryTerms = queries.select(col(queryIdCol),
      explode(array_distinct(TextFunctions.tokens(col(queryTextCol))))
        .as("term"))
    val wanted = queryTerms.select(col("term")).distinct()

    // corpus pass: tokens die against the broadcast term set inside the
    // scan; dl rides along so matched postings never re-join the corpus.
    // The matched-postings table feeds TWO consumers (the df aggregate and
    // the scoring join) and Spark would otherwise recompute the whole
    // tokenize + explode + semi-join + aggregate pipeline per consumer —
    // one localCheckpoint makes it one corpus pass (guide §5, the
    // DedupIndex delta pattern). Size note for 100 TB: postings are
    // query-term-bounded (|docs matching any query term| × |query terms|),
    // the standard BM25 intermediate — orders of magnitude below the
    // corpus; the lineage cut means an executor loss re-runs the query
    // instead of recomputing blocks, the accepted trade for bounded
    // intermediates.
    val postings = docs
      .select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("dl"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .join(broadcast(wanted), "term")
      .groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()

    val df = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val scalars = docs.agg(
      count(lit(1)).as("n_docs"),
      avg(TextFunctions.tokenCount(col(textCol)).cast("double")).as("avgdl"))

    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("dl").cast("double") / col("avgdl")))
    val scored = postings
      .join(broadcast(df), "term")
      .crossJoin(broadcast(scalars))
      .select(col(idCol), col("term"), (idf * tfNorm).as("term_score"))

    val perQuery = scored
      .join(broadcast(queryTerms), "term")
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("term_score")).as("score"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol))
      .orderBy(round(col("score"), 6).desc, col(idCol).asc)
    perQuery.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
