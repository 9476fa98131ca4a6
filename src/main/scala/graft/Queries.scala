package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.CdcEnvelope
import graft.operators.{Batching, Enrichment, Filters, PartitionKeys}
import graft.functions.{Dedup, Multimodal, Similarity, TextFunctions => TF}

/** The operator catalog as verifiable queries — one entry per operator from
  * SURVEY.md §2 plus the LLM-pipeline extensions (§7.4). Each query is a
  * deterministic DataFrame program over the driver's parquet tables with,
  * where SQL-expressible, a DuckDB oracle that must hash-match.
  *
  * Determinism rules used throughout (so oracle hash-compare is exact):
  *  - double SUMs go through DECIMAL(38,s) so accumulation order is
  *    irrelevant, then one cast back to double;
  *  - every window/top-k has a total order (explicit id tiebreak);
  *  - timestamps are µs-truncated identically in both engines (Tables.events).
  */
object Queries
    extends QueryDomain
    with QueriesCdc
    with QueriesSinks
    with QueriesStreaming
    with QueriesRelational
    with QueriesText
    with QueriesDedup
    with QueriesMultimodal
    with QueriesSimilarity {

  // --------------------------------------------------------------------------

  def all: Map[String, QueryFn] = reg.toMap
  def oracles: Map[String, String] = sql.toMap

  /** Entries whose bench time is dominated by a WRITE-ONCE cost — a
    * layout/index/summary-state build inside the entry, or iterative
    * model training — rather than by per-row throughput. `graft.Bench`
    * sums the two classes separately so pair-trend analysis and the
    * baseline-throughput gate read scan/join/agg performance without
    * build noise (the build class scales with ITERATIONS × model size,
    * not rows; at 100 TB it amortizes over every query that reuses the
    * artifact). Criterion: the entry persists an index/layout/state/model
    * before its measured query, or trains over multiple passes. */
  val fixedCost: Set[String] = Set(
    // summary-state folds + MV rewrites (IncrementalAgg.applyDelta × batches)
    "agg_mv_rewrite", "agg_mv_rewrite_avg", "agg_mv_rewrite_avg_decimal",
    "agg_mv_rewrite_minmax",
    "agg_mv_rewrite_distinct", "agg_mv_rewrite_expr", "agg_mv_rewrite_join",
    "agg_mv_rewrite_star", "agg_mv_rewrite_catalog",
    "cdc_incremental_agg", "cdc_replica_table",
    // layout + manifest builds (bloom/zone/bucketing/catalog)
    "join_bloom_pruned", "join_bloom_pruned_auto",
    "join_bloom_pruned_composite", "join_bloom_zone_composed",
    "join_zone_pruned_range",
    "layout_zonemap_events", "layout_zonemap_metaonly",
    "layout_bloom_pointlookup", "layout_zonemap_auto_range",
    "layout_bloom_auto_pointlookup", "layout_catalog_fresh_session",
    "agg_meta_profile", "agg_meta_range", "agg_meta_grouped",
    "agg_meta_distinct", "agg_meta_grouped_expr", "agg_meta_join_dim",
    "agg_meta_join_dim_grouped", "agg_meta_sketch_profile",
    "agg_meta_join_star", "agg_meta_grouped_part", "agg_meta_sketch_semijoin",
    "agg_meta_part_filter", "agg_meta_join_semi", "agg_meta_sketch_by",
    "agg_meta_sketch_semijoin_by", "agg_meta_sketch_banded",
    "agg_meta_topk_by", "agg_meta_overlap_days",
    "sink_bucketed_colocated_join", "sink_compact_small_files",
    "dedup_incremental_index",
    // ANN index train + build (k-means / codebooks persisted, then probed)
    "embed_ann_ivf_indexed", "embed_ann_ivfpq", "embed_ann_pq",
    // tokenizer / classifier training (iterative or multi-pass)
    "text_bpe_vocab", "text_unigram_tokens", "text_wordpiece_tokens",
    "text_quality_classifier", "text_quality_classifier_bigram",
    "text_quality_classifier_lr",
    // iterative graph computation
    "graph_pagerank_trade")

  /** Flagship end-to-end slice (SURVEY §7.1): envelope → op filter →
    * partition keys → per-op/hour counts. */
  def flagship(spark: SparkSession, dir: String): DataFrame =
    PartitionKeys.withTimeColumns(
        Filters.byOperations(
          CdcEnvelope.fromEvents(Tables.events(spark, dir)),
          Seq("purchase", "signup", "click", "view")))
      .groupBy("collection", "operation", "year", "month", "day", "hour")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
}
