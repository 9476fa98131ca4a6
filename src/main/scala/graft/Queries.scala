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
object Queries {

  private type QueryFn = (SparkSession, String) => DataFrame

  private val reg = scala.collection.mutable.LinkedHashMap[String, QueryFn]()
  private val sql = scala.collection.mutable.LinkedHashMap[String, String]()

  private def register(name: String, oracle: Option[String])(fn: QueryFn): Unit = {
    reg(name) = fn
    oracle.foreach(o => sql(name) = o)
  }

  private def envelope(s: SparkSession, dir: String): DataFrame =
    CdcEnvelope.fromEvents(Tables.events(s, dir))

  /** Decimal-routed deterministic sum of a double column. */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 4) =
    sum(c.cast(s"decimal(38,$scale)")).cast("double")

  // ==========================================================================
  // CDC / reference-surface operators (SURVEY §2)
  // ==========================================================================

  register("cdc_envelope_project", Some(
    """SELECT event_type AS operation, 'testdb' AS "database",
      |  'c_' || CAST(user_id % 8 AS VARCHAR) AS collection,
      |  ts AS cluster_time,
      |  '{"_id":' || CAST(event_id AS VARCHAR) || '}' AS document_key,
      |  props AS full_document,
      |  '{"_data":' || CAST(event_id AS VARCHAR) || '}' AS resume_token
      |FROM events""".stripMargin)) { (s, dir) =>
    CdcEnvelope.envelopeOnly(envelope(s, dir))
  }

  register("cdc_filter_ops", Some(
    """SELECT event_type AS operation,
      |  'c_' || CAST(user_id % 8 AS VARCHAR) AS collection,
      |  ts AS cluster_time, event_id, value
      |FROM events
      |WHERE event_type IN ('purchase','signup') AND value >= 100""".stripMargin)) { (s, dir) =>
    Filters.byOperations(envelope(s, dir), Seq("purchase", "signup"))
      .filter(col("value") >= 100)
      .select(col("operation"), col("collection"), col("cluster_time"),
        col("event_id"), col("value"))
  }

  register("cdc_filter_json_field", Some(
    """SELECT event_id, event_type AS operation,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50""".stripMargin)) { (s, dir) =>
    Filters.byJsonField(envelope(s, dir), "full_document", "$.k",
        v => v.cast("long") >= 50)
      .select(col("event_id"), col("operation"),
        get_json_object(col("full_document"), "$.k").cast("long").as("k"))
  }

  register("cdc_op_counts", Some(
    """SELECT event_type AS operation, count(*) AS n_events
      |FROM events GROUP BY 1""".stripMargin)) { (s, dir) =>
    Batching.perOpCounts(envelope(s, dir))
  }

  register("cdc_partition_keys_hive", Some(
    """SELECT 'c_' || CAST(user_id % 8 AS VARCHAR) AS collection,
      |  CAST(year(ts) AS INT) AS year, CAST(month(ts) AS INT) AS month,
      |  CAST(day(ts) AS INT) AS day, CAST(hour(ts) AS INT) AS hour,
      |  count(*) AS n_events
      |FROM events GROUP BY 1,2,3,4,5""".stripMargin)) { (s, dir) =>
    PartitionKeys.withTimeColumns(envelope(s, dir))
      .groupBy("collection", "year", "month", "day", "hour")
      .agg(count(lit(1)).as("n_events"))
  }

  register("cdc_group_by_collection", Some(
    """SELECT 'c_' || CAST(user_id % 8 AS VARCHAR) AS collection,
      |  count(*) AS n_events, min(ts) AS first_time, max(ts) AS last_time,
      |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1""".stripMargin)) { (s, dir) =>
    Batching.groupByCollection(envelope(s, dir))
  }

  register("cdc_dedup_latest", Some(
    """SELECT user_id, event_type AS operation, ts AS cluster_time, event_id, value
      |FROM events
      |QUALIFY row_number() OVER
      |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin)) { (s, dir) =>
    Batching.dedupLatestByKey(envelope(s, dir), Seq("user_id"))
      .select(col("user_id"), col("operation"), col("cluster_time"),
        col("event_id"), col("value"))
  }

  register("cdc_scd2_history", Some(
    """SELECT user_id, event_type AS operation, value,
      |  ts AS effective_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to,
      |  CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    IS NULL THEN 1 ELSE 0 END AS is_current
      |FROM events""".stripMargin)) { (s, dir) =>
    // SCD2 history materialization from the change stream: every change
    // becomes a validity interval [effective_from, effective_to), the open
    // interval marking the current version — what a warehouse keeps so
    // point-in-time joins ("state as of T") stay a range lookup instead of
    // a log replay. One window keyed by the document key (a single
    // user-keyed shuffle at any scale); (ts, event_id) makes the version
    // order total.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("cluster_time"), col("event_id"))
    envelope(s, dir).select(
      col("user_id"), col("operation"), col("value"),
      col("cluster_time").as("effective_from"),
      lead(col("cluster_time"), 1).over(w).as("effective_to"),
      when(lead(col("cluster_time"), 1).over(w).isNull, lit(1))
        .otherwise(lit(0)).as("is_current"))
  }

  register("cdc_materialize_state", Some(
    """SELECT user_id, operation, cluster_time, event_id, value FROM (
      |  SELECT user_id, event_type AS operation, ts AS cluster_time,
      |    event_id, value,
      |    row_number() OVER
      |      (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1 AND operation <> 'error'""".stripMargin)) { (s, dir) =>
    // CDC table materialization, batch form (the oracled twin of
    // streaming.Materializer): replaying the op log leaves each key's
    // LATEST row, and a key whose latest op is delete-class ('error'
    // plays that role on the synthetic feed) is ABSENT from the final
    // state — not merely deprioritized. One shuffle keyed by document
    // key; the delete filter runs after the keyed window, since an
    // earlier delete must not resurrect an older row.
    Batching.dedupLatestByKey(envelope(s, dir), Seq("user_id"))
      .filter(col("operation") =!= "error")
      .select(col("user_id"), col("operation"), col("cluster_time"),
        col("event_id"), col("value"))
  }

  register("cdc_batch_time_windows", Some(
    """SELECT date_trunc('hour', ts) AS window_start, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1""".stripMargin)) { (s, dir) =>
    Batching.timeWindows(envelope(s, dir), "1 hour")
  }

  register("cdc_batch_count", Some(
    """SELECT batch_id, count(*) AS n_events,
      |  min(event_id) AS first_event, max(event_id) AS last_event
      |FROM (
      |  SELECT event_id, CAST(FLOOR((row_number() OVER (ORDER BY ts, event_id) - 1) / 500) AS BIGINT) AS batch_id
      |  FROM events)
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    Batching.countBatches(envelope(s, dir), 500)
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
  }

  register("cdc_enrich_join", Some(
    """SELECT c.c_mktsegment AS mktsegment, count(*) AS n_events,
      |  count(DISTINCT e.user_id) AS n_users,
      |  CAST(SUM(CAST(e.value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    Enrichment.enrich(envelope(s, dir), Tables.customer(s, dir),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("sum_value"))
  }

  register("cdc_order_by_time", Some(
    """SELECT event_id, ts AS cluster_time, event_type AS operation
      |FROM events ORDER BY ts, event_id LIMIT 100""".stripMargin)) { (s, dir) =>
    envelope(s, dir)
      .orderBy(col("cluster_time"), col("event_id"))
      .limit(100)
      .select(col("event_id"), col("cluster_time"), col("operation"))
  }

  register("cdc_json_roundtrip", Some(
    """SELECT event_id, event_type AS operation, value FROM events""".stripMargin)) { (s, dir) =>
    // T1 serialize → parse back: proves the JSON-lines envelope round-trips
    // losslessly (reference: serde_json JSONL, s3/destination.rs:194-208).
    // from_json parses each line ONCE into a struct; the earlier
    // 3×get_json_object form re-parsed the same line per extracted field.
    val line = to_json(struct(col("event_id"), col("operation"), col("value")))
    envelope(s, dir)
      .select(line.as("json"))
      .select(from_json(col("json"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id bigint, operation string, value double")).as("r"))
      .select(col("r.event_id").as("event_id"),
        col("r.operation").as("operation"), col("r.value").as("value"))
  }

  register("cdc_invalidate_split", Some(
    """SELECT 'c_' || CAST(user_id % 8 AS VARCHAR) AS collection, count(*) AS n_invalidate
      |FROM events WHERE event_type = 'error' GROUP BY 1""".stripMargin)) { (s, dir) =>
    val (_, invalidations) = Filters.splitInvalidate(envelope(s, dir), Seq("error"))
    invalidations.groupBy("collection").agg(count(lit(1)).as("n_invalidate"))
  }

  register("cdc_event_size", Some(
    """SELECT event_id,
      |  'testdb.c_' || CAST(user_id % 8 AS VARCHAR) AS full_name,
      |  CAST(octet_length(encode(event_type)) + octet_length(encode('testdb'))
      |    + octet_length(encode('c_' || CAST(user_id % 8 AS VARCHAR)))
      |    + octet_length(encode('{"_id":' || CAST(event_id AS VARCHAR) || '}'))
      |    + octet_length(encode(props))
      |    + octet_length(encode('{"_data":' || CAST(event_id AS VARCHAR) || '}'))
      |    + 50 AS BIGINT) AS est_size_bytes
      |FROM events""".stripMargin)) { (s, dir) =>
    // §1.1 helpers: full_name (event.rs:196-200) + batching size estimate
    // (event.rs:397-432) — the per-event inputs of size-based batching.
    envelope(s, dir).select(
      col("event_id"),
      CdcEnvelope.fullName().as("full_name"),
      CdcEnvelope.estimatedSizeBytes().as("est_size_bytes"))
  }

  register("cdc_update_description", Some(
    """SELECT event_id, props AS updated_fields,
      |  'legacy_field' AS removed_fields,
      |  CAST(event_id % 10 AS INT) AS trunc_new_size
      |FROM events WHERE event_type = 'purchase'""".stripMargin)) { (s, dir) =>
    // update_description envelope completeness (event.rs:206-230): flatten
    // the struct back to scalars so the oracle can check every component.
    envelope(s, dir)
      .filter(col("update_description").isNotNull)
      .select(
        col("event_id"),
        col("update_description.updatedFields").as("updated_fields"),
        array_join(col("update_description.removedFields"), ",")
          .as("removed_fields"),
        element_at(col("update_description.truncatedArrays"), 1)
          .getField("newSize").as("trunc_new_size"))
  }

  register("cdc_variant_extract", Some(
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |  count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Spark 4's VariantType path for the schemaless document body (SURVEY
    // §1.2): parse_json ONCE into a binary variant, then typed
    // variant_get extractions — the modern alternative to repeated
    // get_json_object string re-parses for multi-field access.
    envelope(s, dir)
      .select(parse_json(col("full_document")).as("v"), col("value"))
      .select(variant_get(col("v"), "$.k", "bigint").as("k"), col("value"))
      .filter(col("k") >= 50)
      .groupBy(pmod(col("k"), lit(10)).as("k_mod"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
  }

  register("cdc_preimage_diff", Some(
    """SELECT event_id,
      |  props AS full_document,
      |  '{"k": ' || CAST((CAST(json_extract_string(props, '$.k') AS BIGINT) * 7
      |      + event_id) % 100 AS VARCHAR) || '}' AS full_document_before,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT)
      |    - (CAST(json_extract_string(props, '$.k') AS BIGINT) * 7
      |      + event_id) % 100 AS k_delta
      |FROM events WHERE event_type = 'purchase'""".stripMargin)) { (s, dir) =>
    // S6 pre-images (full_document_before_change, stream.rs:483-501): the
    // consumer-facing use case — compute per-field diffs from the
    // before/after document pair. Scan-local: two JSON extracts, no shuffle.
    CdcEnvelope.fromEvents(Tables.events(s, dir), preImages = true)
      .filter(col(CdcEnvelope.preImageColumn).isNotNull)
      .select(
        col("event_id"),
        col("full_document"),
        col(CdcEnvelope.preImageColumn),
        (get_json_object(col("full_document"), "$.k").cast("long") -
          get_json_object(col(CdcEnvelope.preImageColumn), "$.k").cast("long"))
          .as("k_delta"))
  }

  register("cdc_replica_table", Some(
    """SELECT user_id, operation, cluster_time, event_id, value FROM (
      |  SELECT user_id, event_type AS operation, ts AS cluster_time,
      |    event_id, value,
      |    row_number() OVER
      |      (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1 AND operation <> 'error'""".stripMargin)) {
    (s, dir) =>
      // The PERSISTED replica: "apply the change stream to a lake table".
      // Three delta batches fold through ReplicaTable.applyBatch — and the
      // chunks are split by event_id % 3, i.e. NOT in time order, so the
      // versioned last-writer-wins merge (not arrival order) must decide
      // every key, with retained tombstones keeping delete-class wins
      // dead across batches. The oracle is the one-shot latest-per-key
      // replay (same as cdc_materialize_state): incremental == one-shot
      // is the replica-correctness claim under the hash gate. State is
      // hash-bucketed parquet; each batch rewrites only touched buckets.
      val env = envelope(s, dir).select(col("user_id"), col("operation"),
        col("cluster_time"), col("event_id"), col("value"))
      val path = s"$sinkRoot/cdc_replica_table-${
        dir.replaceAll("[^0-9.]", "")}"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      (0L to 2L).foreach { i =>
        graft.streaming.ReplicaTable.applyBatch(s, path,
          env.filter(pmod(col("event_id"), lit(3)) === i),
          keyCols = Seq("user_id"),
          versionCols = Seq("cluster_time", "event_id"),
          deleteWhen = col("operation") === "error",
          nBuckets = 8, batchId = i)
      }
      graft.streaming.ReplicaTable.read(s, path)
        .select(col("user_id"), col("operation"), col("cluster_time"),
          col("event_id"), col("value"))
  }

  register("cdc_incremental_agg", Some(
    """WITH d AS (
      |  SELECT user_id, event_type, event_id,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events
      |  WHERE user_id IS NOT NULL AND event_type <> 'error'),
      |x AS (
      |  SELECT user_id,
      |    CASE WHEN event_type = 'purchase'
      |         THEN k - (k * 7 + event_id) % 100
      |         ELSE k END AS dk,
      |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS dn
      |  FROM d)
      |SELECT user_id, CAST(sum(dn) AS BIGINT) AS n_docs,
      |  CAST(sum(dk) AS BIGINT) AS sum_k
      |FROM x GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Incremental materialized-aggregate maintenance: the per-user
    // (n_docs, sum_k) view is built by folding THREE successive delta
    // batches through IncrementalAgg.applyDelta — insert-class ops
    // contribute (+1, +k), the update-class op (purchase) contributes
    // (0, k_new − k_old) from its PRE-IMAGE — and the oracle recomputes
    // the same view from the full history in one shot: incremental ==
    // one-shot is exactly the IVM correctness claim, here under the hash
    // gate. State is hash-bucketed parquet; each application prunes to
    // and dynamically overwrites only the buckets its batch touches
    // (IncrementalAggSpec proves untouched bucket dirs stay byte-still).
    val env = CdcEnvelope.fromEvents(Tables.events(s, dir), preImages = true)
      .filter(col("user_id").isNotNull && col("operation") =!= "error")
    val k = get_json_object(col("full_document"), "$.k").cast("long")
    val kOld = get_json_object(col(CdcEnvelope.preImageColumn), "$.k")
      .cast("long")
    val deltas = env.select(col("user_id"),
      when(col("operation") === "purchase", k - kOld).otherwise(k)
        .as("sum_k"),
      when(col("operation") === "purchase", 0L).otherwise(1L).as("n_docs"),
      pmod(col("event_id"), lit(3)).as("__chunk"))
    val path = s"$sinkRoot/cdc_incremental_agg-${
      dir.replaceAll("[^0-9.]", "")}"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    (0L to 2L).foreach { i =>
      graft.streaming.IncrementalAgg.applyDelta(s, path,
        deltas.filter(col("__chunk") === i).drop("__chunk"),
        keyCols = Seq("user_id"), sumCols = Seq("sum_k", "n_docs"),
        nBuckets = 8, batchId = i)
    }
    graft.streaming.IncrementalAgg.read(s, path)
      .select(col("user_id"), col("n_docs"), col("sum_k"))
  }

  register("agg_mv_rewrite", Some(
    """SELECT lang, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  count(*) AS n_docs
      |FROM documents WHERE source <> 'web' GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Materialized-view REWRITE, proven end-to-end: an IncrementalAgg
    // summary keyed (lang, source) is maintained from three delta batches;
    // SummaryViews.register + install then make a plain GROUP BY over the
    // BASE parquet silently re-plan onto the summary — a COARSER roll-up
    // (lang ⊂ keys, sums of sums) under a key-column filter (source <>
    // 'web', pushed onto the summary scan). The entry REQUIRES the rewrite
    // to have fired (the optimized plan must read the state dir, asserted
    // below) and materializes the result while the rule is installed, so
    // the rows the driver hashes against DuckDB-over-the-raw-table came
    // from the summary: exactness of maintenance + rewrite + roll-up in
    // one gate. At 100 TB the query pays O(distinct lang×source), not a
    // base scan.
    val base = Tables.path(dir, "documents")
    val path = s"$sinkRoot/agg_mv_rewrite-${dir.replaceAll("[^0-9.]", "")}"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val deltas = s.read.parquet(base).select(col("lang"), col("source"),
      col("n_chars").cast("long").as("n_chars"), lit(1L).as("n_docs"),
      pmod(col("doc_id"), lit(3)).as("__chunk"))
    (0L to 2L).foreach { i =>
      graft.streaming.IncrementalAgg.applyDelta(s, path,
        deltas.filter(col("__chunk") === i).drop("__chunk"),
        keyCols = Seq("lang", "source"), sumCols = Seq("n_chars", "n_docs"),
        nBuckets = 8, batchId = i)
    }
    graft.plans.SummaryViews.register(graft.plans.SummaryViews.View(
      base, path, Seq("lang", "source"), Set("n_chars"), Some("n_docs")))
    graft.plans.SummaryViews.install(s)
    try {
      val q = s.read.parquet(base)
        .where(col("source") =!= "web")
        .groupBy("lang")
        .agg(sum(col("n_chars")).as("sum_chars"),
          count(lit(1)).as("n_docs"))
      val readsState = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.exists(p =>
                p.toString.contains("agg_mv_rewrite") &&
                  p.toString.endsWith("/state"))
            case _ => false
          }
      }.exists(identity)
      require(readsState,
        "agg_mv_rewrite: the summary rewrite did not fire — the optimized " +
          "plan still reads the base table")
      // eager: the hashed rows are computed NOW, under the installed rule
      q.localCheckpoint()
    } finally {
      graft.plans.SummaryViews.uninstall(s)
      graft.plans.SummaryViews.unregister(base)
    }
  }

  register("agg_mv_rewrite_avg", Some(
    """SELECT source, avg(n_chars) AS avg_chars,
      |  count(n_chars) AS n_vals
      |FROM documents WHERE lang <> 'en' GROUP BY 1""".stripMargin)) { (s, dir) =>
    // The extended MV-rewrite shapes: AVG(col) re-planned as
    // SUM(sums)/SUM(non-null counts) and COUNT(col) as SUM(non-null
    // counts), over a summary keyed (lang, source) — here rolled up to
    // source under a key filter on lang (the OTHER key than agg_mv_rewrite
    // exercises). The maintained nn column is SUM(IF(n_chars IS NULL,0,1))
    // per key; the entry requires the rewrite to have fired and hashes the
    // summary-served rows against DuckDB over the raw table.
    val base = Tables.path(dir, "documents")
    val path = s"$sinkRoot/agg_mv_rewrite_avg-${dir.replaceAll("[^0-9.]", "")}"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val deltas = s.read.parquet(base).select(col("lang"), col("source"),
      col("n_chars").cast("long").as("n_chars"), lit(1L).as("n_docs"),
      when(col("n_chars").isNotNull, 1L).otherwise(0L).as("n_chars_nn"),
      pmod(col("doc_id"), lit(3)).as("__chunk"))
    (0L to 2L).foreach { i =>
      graft.streaming.IncrementalAgg.applyDelta(s, path,
        deltas.filter(col("__chunk") === i).drop("__chunk"),
        keyCols = Seq("lang", "source"),
        sumCols = Seq("n_chars", "n_docs", "n_chars_nn"),
        nBuckets = 8, batchId = i)
    }
    graft.plans.SummaryViews.register(graft.plans.SummaryViews.View(
      base, path, Seq("lang", "source"), Set("n_chars"), Some("n_docs"),
      nnCounts = Map("n_chars" -> "n_chars_nn")))
    graft.plans.SummaryViews.install(s)
    try {
      val q = s.read.parquet(base)
        .where(col("lang") =!= "en")
        .groupBy("source")
        .agg(avg(col("n_chars")).as("avg_chars"),
          count(col("n_chars")).as("n_vals"))
      val readsState = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.exists(p =>
                p.toString.contains("agg_mv_rewrite_avg") &&
                  p.toString.endsWith("/state"))
            case _ => false
          }
      }.exists(identity)
      require(readsState,
        "agg_mv_rewrite_avg: the AVG/COUNT(col) rewrite did not fire — " +
          "the optimized plan still reads the base table")
      q.localCheckpoint()
    } finally {
      graft.plans.SummaryViews.uninstall(s)
      graft.plans.SummaryViews.unregister(base)
    }
  }

  register("agg_mv_rewrite_avg_decimal", Some(
    """SELECT source,
      |  CAST(avg(CAST(n_chars AS DECIMAL(12,2))) AS DOUBLE) AS avg_price,
      |  CAST(sum(CAST(n_chars AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM documents WHERE lang <> 'en' GROUP BY 1""".stripMargin)) { (s, dir) =>
    // DECIMAL AVG through the MV rewrite — the type the money columns
    // actually have at 100 TB. The rewrite replicates Spark's own decimal
    // Average formula over the re-summed partials (DecimalDivideWith-
    // OverflowCheck into decimal(p+4,s+4) — SummaryViews.decimalAvg), so
    // the served value is bit-equal to the base query's. Both output
    // columns are CAST(agg AS DOUBLE) — CollapseProject folds those casts
    // into the Aggregate's own output list, so this entry also gates the
    // Alias(Cast(agg)) serving shape. The base is an owned COPY of
    // `documents` with the decimal column materialized (same rows, so the
    // DuckDB oracle over the raw table still matches).
    val tag = dir.replaceAll("[^0-9.]", "")
    val baseCopy = s"$sinkRoot/agg_mv_avg_dec_base-$tag"
    val path = s"$sinkRoot/agg_mv_avg_dec_state-$tag"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars").cast("decimal(12,2)").as("price"))
      .write.mode("overwrite").parquet(baseCopy)
    // decimal deltas pre-widened to precision 28 (IncrementalAgg's stable
    // decimal(38,s) fold contract); nn column enables the AVG divisor
    val deltas = s.read.parquet(baseCopy).select(col("lang"), col("source"),
      col("price").cast("decimal(28,2)").as("price"), lit(1L).as("n_docs"),
      when(col("price").isNotNull, 1L).otherwise(0L).as("price_nn"),
      pmod(col("doc_id"), lit(3)).as("__chunk"))
    (0L to 2L).foreach { i =>
      graft.streaming.IncrementalAgg.applyDelta(s, path,
        deltas.filter(col("__chunk") === i).drop("__chunk"),
        keyCols = Seq("lang", "source"),
        sumCols = Seq("price", "n_docs", "price_nn"),
        nBuckets = 8, batchId = i)
    }
    graft.plans.SummaryViews.register(graft.plans.SummaryViews.View(
      baseCopy, path, Seq("lang", "source"), Set("price"), Some("n_docs"),
      nnCounts = Map("price" -> "price_nn")))
    graft.plans.SummaryViews.install(s)
    try {
      val q = s.read.parquet(baseCopy)
        .where(col("lang") =!= "en")
        .groupBy("source")
        .agg(avg(col("price")).cast("double").as("avg_price"),
          sum(col("price")).cast("double").as("sum_price"))
      val readsState = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.exists(p =>
                p.toString.contains("agg_mv_avg_dec_state") &&
                  p.toString.endsWith("/state"))
            case _ => false
          }
      }.exists(identity)
      require(readsState,
        "agg_mv_rewrite_avg_decimal: the decimal-AVG rewrite did not " +
          "fire — the optimized plan still reads the base table")
      q.localCheckpoint()
    } finally {
      graft.plans.SummaryViews.uninstall(s)
      graft.plans.SummaryViews.unregister(baseCopy)
    }
  }

  register("agg_mv_rewrite_minmax", Some(
    """SELECT lang, min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE source <> 'web' GROUP BY 1""".stripMargin)) { (s, dir) =>
    // MIN/MAX through the MV rewrite (append-only contract): per-key
    // extrema maintained by IncrementalAgg's re-min/re-max merge, rolled
    // up to lang under a key filter — mins of mins alongside a SUM in the
    // same rewritten Aggregate. The entry requires the rewrite fired and
    // hashes the summary-served rows against DuckDB over the raw table.
    val base = Tables.path(dir, "documents")
    val path = s"$sinkRoot/agg_mv_rewrite_minmax-${dir.replaceAll("[^0-9.]", "")}"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val deltas = s.read.parquet(base).select(col("lang"), col("source"),
      col("n_chars").cast("long").as("n_chars"),
      col("n_chars").cast("long").as("n_chars_min"),
      col("n_chars").cast("long").as("n_chars_max"),
      pmod(col("doc_id"), lit(3)).as("__chunk"))
    (0L to 2L).foreach { i =>
      graft.streaming.IncrementalAgg.applyDelta(s, path,
        deltas.filter(col("__chunk") === i).drop("__chunk"),
        keyCols = Seq("lang", "source"), sumCols = Seq("n_chars"),
        nBuckets = 8, batchId = i,
        minCols = Seq("n_chars_min"), maxCols = Seq("n_chars_max"))
    }
    graft.plans.SummaryViews.register(graft.plans.SummaryViews.View(
      base, path, Seq("lang", "source"), Set("n_chars"), None,
      minCols = Map("n_chars" -> "n_chars_min"),
      maxCols = Map("n_chars" -> "n_chars_max")))
    graft.plans.SummaryViews.install(s)
    try {
      val q = s.read.parquet(base)
        .where(col("source") =!= "web")
        .groupBy("lang")
        .agg(min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(col("n_chars")).as("sum_chars"))
      val readsState = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.exists(p =>
                p.toString.contains("agg_mv_rewrite_minmax") &&
                  p.toString.endsWith("/state"))
            case _ => false
          }
      }.exists(identity)
      require(readsState,
        "agg_mv_rewrite_minmax: the MIN/MAX rewrite did not fire — the " +
          "optimized plan still reads the base table")
      q.localCheckpoint()
    } finally {
      graft.plans.SummaryViews.uninstall(s)
      graft.plans.SummaryViews.unregister(base)
    }
  }

  register("agg_mv_rewrite_distinct", Some(
    """SELECT lang, count(DISTINCT source) AS n_sources,
      |  count(*) AS n_docs
      |FROM documents GROUP BY 1""".stripMargin)) { (s, dir) =>
    // COUNT(DISTINCT key-col) through the MV rewrite: each LIVE summary
    // row is one distinct (lang, source) combination, so distinct sources
    // per lang = distinct summary key values among rows whose maintained
    // count is positive. The liveness filter is load-bearing and this
    // entry proves it: batches 3-4 insert then fully DELETE a synthetic
    // ('zz','ghost') group, leaving a net-zero state row that a naive
    // rewrite would resurrect as a ghost group (and a ghost distinct
    // source) — the raw-table oracle has no 'zz' rows, so the hash gate
    // fails unless emptied groups are excluded. At 100 TB the distinct
    // count costs O(lang×source) summary rows, zero base I/O.
    val base = Tables.path(dir, "documents")
    val path = s"$sinkRoot/agg_mv_rewrite_distinct-${
      dir.replaceAll("[^0-9.]", "")}"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val deltas = s.read.parquet(base).select(col("lang"), col("source"),
      lit(1L).as("n_docs"), pmod(col("doc_id"), lit(3)).as("__chunk"))
    (0L to 2L).foreach { i =>
      graft.streaming.IncrementalAgg.applyDelta(s, path,
        deltas.filter(col("__chunk") === i).drop("__chunk"),
        keyCols = Seq("lang", "source"), sumCols = Seq("n_docs"),
        nBuckets = 8, batchId = i)
    }
    // insert 5 ghost rows, then delete all 5: net count 0, row persists
    val ghost = s.range(5).select(lit("zz").as("lang"),
      lit("ghost").as("source"), lit(1L).as("n_docs"))
    graft.streaming.IncrementalAgg.applyDelta(s, path, ghost,
      keyCols = Seq("lang", "source"), sumCols = Seq("n_docs"),
      nBuckets = 8, batchId = 3L)
    graft.streaming.IncrementalAgg.applyDelta(s, path,
      ghost.withColumn("n_docs", lit(-1L)),
      keyCols = Seq("lang", "source"), sumCols = Seq("n_docs"),
      nBuckets = 8, batchId = 4L)
    graft.plans.SummaryViews.register(graft.plans.SummaryViews.View(
      base, path, Seq("lang", "source"), Set.empty, Some("n_docs")))
    graft.plans.SummaryViews.install(s)
    try {
      val q = s.read.parquet(base)
        .groupBy("lang")
        .agg(countDistinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"))
      val readsState = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.exists(p =>
                p.toString.contains("agg_mv_rewrite_distinct") &&
                  p.toString.endsWith("/state"))
            case _ => false
          }
      }.exists(identity)
      require(readsState,
        "agg_mv_rewrite_distinct: the summary rewrite did not fire — the " +
          "optimized plan still reads the base table")
      q.localCheckpoint()
    } finally {
      graft.plans.SummaryViews.uninstall(s)
      graft.plans.SummaryViews.unregister(base)
    }
  }

  register("agg_mv_rewrite_expr", Some(
    """SELECT upper(lang) AS lang_uc, substring(source, 1, 2) AS src2,
      |  count(*) AS n_docs, count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    // MV rewrite under KEY-DERIVED grouping expressions — the dashboard
    // shape (`GROUP BY date_trunc('day', k)` / `substring(k, …)`): a
    // deterministic expression whose references are all key columns
    // evaluates over the summary's key VALUES to exactly its value over
    // the base rows of that key, so the rewrite merges summary groups
    // under the derived values and still answers exactly (the hash gate
    // runs the same expressions over the RAW table in DuckDB). The
    // rewrite firing is REQUIREd; refusal paths (non-key references,
    // non-determinism) are pinned in SummaryViewsSpec. At 100 TB the
    // query reads O(lang×source) summary rows, zero base I/O.
    val base = Tables.path(dir, "documents")
    val path = s"$sinkRoot/agg_mv_rewrite_expr-${
      dir.replaceAll("[^0-9.]", "")}"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val deltas = s.read.parquet(base).select(col("lang"), col("source"),
      lit(1L).as("n_docs"), pmod(col("doc_id"), lit(2)).as("__chunk"))
    (0L to 1L).foreach { i =>
      graft.streaming.IncrementalAgg.applyDelta(s, path,
        deltas.filter(col("__chunk") === i).drop("__chunk"),
        keyCols = Seq("lang", "source"), sumCols = Seq("n_docs"),
        nBuckets = 8, batchId = i)
    }
    graft.plans.SummaryViews.register(graft.plans.SummaryViews.View(
      base, path, Seq("lang", "source"), Set.empty, Some("n_docs")))
    graft.plans.SummaryViews.install(s)
    try {
      val q = s.read.parquet(base)
        .groupBy(upper(col("lang")).as("lang_uc"),
          substring(col("source"), 1, 2).as("src2"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"))
      val readsState = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.exists(p =>
                p.toString.contains("agg_mv_rewrite_expr") &&
                  p.toString.endsWith("/state"))
            case _ => false
          }
      }.exists(identity)
      require(readsState,
        "agg_mv_rewrite_expr: the summary rewrite did not fire on the " +
          "expression-grouped query — the optimized plan still reads the " +
          "base table")
      q.localCheckpoint()
    } finally {
      graft.plans.SummaryViews.uninstall(s)
      graft.plans.SummaryViews.unregister(base)
    }
  }

  register("agg_mv_rewrite_join", Some(
    """WITH dim AS (SELECT DISTINCT lang AS d_lang,
      |  substring(lang, 1, 1) AS tier FROM documents)
      |SELECT d.tier, CAST(sum(f.n_chars) AS BIGINT) AS sum_chars,
      |  count(*) AS n_docs
      |FROM documents f JOIN dim d ON f.lang = d.d_lang
      |WHERE f.source <> 'web'
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // STAR-SCHEMA MV rewrite, end-to-end: an aggregate over
    // `fact ⋈ dim` grouped by a DIM attribute is served from
    // `Join(summary, dim)` — exact because every fact-side reference
    // (join key, WHERE, groupings) resolves to view KEY columns, so all
    // rows of a key group pass the join together and the summary row
    // stands in for the group (N:M-safe; see SummaryViews scaladoc). The
    // dim here is itself a DISTINCT over the base — served by the
    // single-base rewrite — so the REQUIRE below demands the optimized
    // plan read the summary state and NOT touch the base table at all:
    // two rewrite tiers compose in one plan, and the driver hashes the
    // result against DuckDB over the raw table. At 100 TB the dashboard
    // join pays O(keys), zero base I/O.
    val base = Tables.path(dir, "documents")
    val path = s"$sinkRoot/agg_mv_rewrite_join-${
      dir.replaceAll("[^0-9.]", "")}"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val deltas = s.read.parquet(base).select(col("lang"), col("source"),
      col("n_chars").cast("long").as("n_chars"), lit(1L).as("n_docs"),
      pmod(col("doc_id"), lit(2)).as("__chunk"))
    (0L to 1L).foreach { i =>
      graft.streaming.IncrementalAgg.applyDelta(s, path,
        deltas.filter(col("__chunk") === i).drop("__chunk"),
        keyCols = Seq("lang", "source"), sumCols = Seq("n_chars", "n_docs"),
        nBuckets = 8, batchId = i)
    }
    graft.plans.SummaryViews.register(graft.plans.SummaryViews.View(
      base, path, Seq("lang", "source"), Set("n_chars"), Some("n_docs")))
    graft.plans.SummaryViews.install(s)
    try {
      val f = s.read.parquet(base)
      val dim = s.read.parquet(base)
        .select(col("lang").as("d_lang"),
          substring(col("lang"), 1, 1).as("tier"))
        .distinct()
      val q = f.where(col("source") =!= "web")
        .join(dim, f("lang") === dim("d_lang"))
        .groupBy("tier")
        .agg(sum(col("n_chars")).as("sum_chars"),
          count(lit(1)).as("n_docs"))
      val rels = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case hf: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              hf.location.rootPaths.map(_.toString)
            case _ => Nil
          }
      }.flatten
      require(rels.exists(p => p.contains("agg_mv_rewrite_join") &&
          p.endsWith("/state")),
        "agg_mv_rewrite_join: the star-schema rewrite did not fire")
      require(!rels.exists(_.contains("documents")),
        "agg_mv_rewrite_join: the plan still reads the BASE table — " +
          "both rewrite tiers must compose to summary-only I/O")
      q.localCheckpoint()
    } finally {
      graft.plans.SummaryViews.uninstall(s)
      graft.plans.SummaryViews.unregister(base)
    }
  }

  register("agg_mv_rewrite_star", Some(
    """WITH d1 AS (SELECT DISTINCT lang AS d_lang,
      |  substring(lang, 1, 1) AS tier FROM documents),
      |d2 AS (SELECT DISTINCT source AS d_src,
      |  upper(source) AS src_u FROM documents)
      |SELECT d1.tier, d2.src_u,
      |  CAST(sum(f.n_chars) AS BIGINT) AS sum_chars, count(*) AS n_docs
      |FROM documents f
      |JOIN d1 ON f.lang = d1.d_lang
      |JOIN d2 ON f.source = d2.d_src
      |GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    // MULTI-DIM star rewrite end-to-end: an aggregate over
    // fact ⋈ dim1 ⋈ dim2 grouped by both dims' attributes — the NESTED
    // join tree (column-pruning Projects between the join nodes included)
    // is served with the fact leg replaced by the summary and both dim
    // subtrees verbatim. Both dims here are DISTINCTs over the base, each
    // served by the single-base rewrite, so the REQUIRE demands the final
    // plan read summary state and NO base table anywhere: three rewrite
    // firings compose in one plan, hashed against DuckDB over raw tables.
    val base = Tables.path(dir, "documents")
    val path = s"$sinkRoot/agg_mv_rewrite_star-${
      dir.replaceAll("[^0-9.]", "")}"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val deltas = s.read.parquet(base).select(col("lang"), col("source"),
      col("n_chars").cast("long").as("n_chars"), lit(1L).as("n_docs"),
      pmod(col("doc_id"), lit(2)).as("__chunk"))
    (0L to 1L).foreach { i =>
      graft.streaming.IncrementalAgg.applyDelta(s, path,
        deltas.filter(col("__chunk") === i).drop("__chunk"),
        keyCols = Seq("lang", "source"), sumCols = Seq("n_chars", "n_docs"),
        nBuckets = 8, batchId = i)
    }
    graft.plans.SummaryViews.register(graft.plans.SummaryViews.View(
      base, path, Seq("lang", "source"), Set("n_chars"), Some("n_docs")))
    graft.plans.SummaryViews.install(s)
    try {
      val f = s.read.parquet(base)
      val d1 = s.read.parquet(base)
        .select(col("lang").as("d_lang"),
          substring(col("lang"), 1, 1).as("tier")).distinct()
      val d2 = s.read.parquet(base)
        .select(col("source").as("d_src"),
          upper(col("source")).as("src_u")).distinct()
      val q = f.join(d1, f("lang") === d1("d_lang"))
        .join(d2, f("source") === d2("d_src"))
        .groupBy("tier", "src_u")
        .agg(sum(col("n_chars")).as("sum_chars"),
          count(lit(1)).as("n_docs"))
      val rels = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case hf: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              hf.location.rootPaths.map(_.toString)
            case _ => Nil
          }
      }.flatten
      require(rels.exists(p => p.contains("agg_mv_rewrite_star") &&
          p.endsWith("/state")),
        "agg_mv_rewrite_star: the multi-dim star rewrite did not fire")
      require(!rels.exists(_.contains("documents")),
        "agg_mv_rewrite_star: the plan still reads the BASE table — " +
          "all three rewrite firings must compose to summary-only I/O")
      q.localCheckpoint()
    } finally {
      graft.plans.SummaryViews.uninstall(s)
      graft.plans.SummaryViews.unregister(base)
    }
  }

  register("join_bloom_pruned", Some(
    """SELECT l.l_returnflag, count(*) AS n_items,
      |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderkey IN (SELECT o_orderkey FROM orders
      |                       ORDER BY o_totalprice DESC, o_orderkey
      |                       LIMIT 5)
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Dim-driven fact FILE skipping under the oracle: lineitem persists
    // key-bucketed (repartition by l_orderkey — one order's items land in
    // one file, but key RANGES still overlap across every file, so a zone
    // map stays blind) with per-file Bloom filters on l_orderkey; the
    // dim's distinct keys (the 5 biggest orders, deterministic tie-break)
    // probe the manifest and the join scans only firing files. The oracle
    // recomputes the plain join on the raw tables — skipping must be
    // invisible. The entry REQUIRES pruning to have engaged (the fact side
    // lists fewer files than the layout holds: ≤5 key files + fpp noise of
    // 16). At 100 TB this is the star-join point-lookup shape: a filtered
    // dimension touches a sliver of fact files, scan cost follows the
    // sliver, the model-sized dim broadcasts — no shuffle anywhere.
    val path = s"$sinkRoot/join_bloom_pruned-${dir.replaceAll("[^0-9.]", "")}"
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
      .repartition(16, col("l_orderkey"))
      .write.mode("overwrite").parquet(path)
    graft.sources.BloomIndex.write(s, path, Seq("l_orderkey"),
      expectedItemsPerFile = 200000, fpp = 0.01)
    val dim = Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5).select("o_orderkey")
    val joined = graft.sources.BloomIndex.prunedJoin(
      s, path, "l_orderkey", dim, "o_orderkey")
    val totalFiles = s.read.parquet(s"$path/_bloomindex").count()
    val factFiles = joined.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
              if f.location.rootPaths.exists(_.toString.contains(
                "join_bloom_pruned")) =>
            f.location.rootPaths.length.toLong
          case _ => 0L
        }
    }.sum
    require(factFiles > 0 && factFiles < totalFiles,
      s"join_bloom_pruned: expected file skipping to engage " +
        s"($factFiles of $totalFiles files)")
    joined.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("revenue"))
  }

  register("join_bloom_pruned_auto", Some(
    """SELECT l.l_returnflag, count(*) AS n_items,
      |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderkey IN (SELECT o_orderkey FROM orders
      |                       ORDER BY o_totalprice DESC, o_orderkey
      |                       LIMIT 5)
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // The OPTIMIZER-tier sibling of join_bloom_pruned: the user writes a
    // PLAIN join — no BloomIndex API in sight — and the registered
    // graft.plans.BloomJoins rule routes the fact scan through the
    // manifest probe (same move SummaryViews makes for IncrementalAgg).
    // Same layout, same oracle; the entry REQUIRES that the optimized
    // plan's fact side reads fewer files than the layout holds.
    val path = s"$sinkRoot/join_bloom_pruned_auto-${
      dir.replaceAll("[^0-9.]", "")}"
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
      .repartition(16, col("l_orderkey"))
      .write.mode("overwrite").parquet(path)
    graft.sources.BloomIndex.write(s, path, Seq("l_orderkey"),
      expectedItemsPerFile = 200000, fpp = 0.01)
    graft.plans.BloomJoins.register(graft.plans.BloomJoins.Layout(
      path, "l_orderkey"))
    graft.plans.BloomJoins.install(s)
    try {
      val fact = s.read.parquet(path)
      val dim = Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(5).select("o_orderkey")
      val joined = fact.join(dim,
        fact("l_orderkey") === dim("o_orderkey")) // the PLAIN spelling
      val totalFiles = s.read.parquet(s"$path/_bloomindex").count()
      val factFiles = joined.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if f.location.rootPaths.exists(_.toString.contains(
                  "join_bloom_pruned_auto")) =>
              // count the FILE LISTING, not rootPaths — an un-rewritten
              // directory scan has one root path over all 16 files
              f.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(factFiles > 0 && factFiles < totalFiles,
        s"join_bloom_pruned_auto: expected the RULE to skip files " +
          s"($factFiles of $totalFiles)")
      joined.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
            .as("revenue"))
        .localCheckpoint()
    } finally {
      graft.plans.BloomJoins.uninstall(s)
      graft.plans.BloomJoins.unregister(path)
    }
  }

  register("join_bloom_pruned_composite", Some(
    """SELECT l.l_returnflag, count(*) AS n_items,
      |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN (SELECT l_orderkey AS k1, l_partkey AS k2 FROM lineitem
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_partkey
      |      LIMIT 5) d
      |  ON l.l_orderkey = d.k1 AND l.l_partkey = d.k2
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // COMPOSITE-key bloom pruning under the oracle: the layout carries
    // per-file filters on BOTH join columns, the two-key equi-join probes
    // each and INTERSECTS the candidate sets (each set is a superset of
    // the files holding its column's matches, so the intersection is a
    // superset of the files holding rows matching both — sound). The dim
    // is a top-5 whose ordering includes both keys — the Limit carve-out
    // certifies each collected key set. REQUIREs fewer files read than
    // the layout holds.
    val path = s"$sinkRoot/join_bloom_composite-${
      dir.replaceAll("[^0-9.]", "")}"
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_returnflag",
        "l_extendedprice", "l_discount")
      .repartition(16, col("l_orderkey"))
      .write.mode("overwrite").parquet(path)
    graft.sources.BloomIndex.write(s, path,
      Seq("l_orderkey", "l_partkey"),
      expectedItemsPerFile = 200000, fpp = 0.01)
    graft.plans.BloomJoins.register(graft.plans.BloomJoins.Layout(
      path, "l_orderkey"))
    graft.plans.BloomJoins.register(graft.plans.BloomJoins.Layout(
      path, "l_partkey"))
    graft.plans.BloomJoins.install(s)
    try {
      val fact = s.read.parquet(path)
      val dim = Tables.lineitem(s, dir)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_partkey"))
        .limit(5)
        .select(col("l_orderkey").as("k1"), col("l_partkey").as("k2"))
      val joined = fact.join(dim,
        fact("l_orderkey") === dim("k1") &&
          fact("l_partkey") === dim("k2")) // the PLAIN two-key spelling
      val totalFiles = s.read.parquet(s"$path/_bloomindex").count()
      val factFiles = joined.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if f.location.rootPaths.exists(_.toString.contains(
                  "join_bloom_composite")) =>
              f.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(factFiles > 0 && factFiles < totalFiles,
        s"join_bloom_pruned_composite: expected the two-key RULE to skip " +
          s"files ($factFiles of $totalFiles)")
      joined.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
            .as("revenue"))
        .localCheckpoint()
    } finally {
      graft.plans.BloomJoins.uninstall(s)
      graft.plans.BloomJoins.unregister(path)
    }
  }

  register("join_zone_pruned_range", Some(
    """SELECT d.doc_id, d.lang, d.n_chars FROM documents d
      |WHERE d.doc_id IN (SELECT doc_id FROM documents
      |                   ORDER BY doc_id LIMIT 8)
      |ORDER BY d.doc_id""".stripMargin)) { (s, dir) =>
    // ZONE-driven join pruning — no bloom index anywhere: the fact is
    // range-CLUSTERED on the join key and carries only the cheap zone
    // manifest; the dim-driven semi-join probes with the dim's
    // [min, max] and scans only the files whose zone intersects. This is
    // the natural 100 TB plan for time-bucketed / id-sorted layouts,
    // where building per-file blooms on the clustering key would be
    // wasted bytes. The top-8 dim is a Limit above a Sort ON the key —
    // the certified limit shape. REQUIREs file skipping; rows hash
    // against DuckDB over the raw table.
    val path = s"$sinkRoot/join_zone_pruned-${dir.replaceAll("[^0-9.]", "")}"
    val docs = Tables.table(s, dir, "documents")
    docs.select("doc_id", "lang", "n_chars")
      .repartitionByRange(16, col("doc_id"))
      .write.mode("overwrite").parquet(path)
    graft.sources.ZoneMap.write(s, path, Seq("doc_id"))
    // registration arrives via the writer's self-description + discovery
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.BloomJoins.install(s)
    try {
      val f = s.read.parquet(path)
      val dim = docs.orderBy(col("doc_id")).limit(8)
        .select(col("doc_id").as("id"))
      val q = f.join(dim, f("doc_id") === dim("id"), "left_semi")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
      val totalFiles = s.read.parquet(s"$path/_zonemap").count()
      val factFiles = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if f.location.rootPaths.exists(_.toString.contains(
                  "join_zone_pruned")) =>
              f.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(factFiles > 0 && factFiles < totalFiles,
        s"join_zone_pruned_range: expected the dim [min,max] to zone-skip " +
          s"files ($factFiles of $totalFiles)")
      q.localCheckpoint()
    } finally {
      graft.plans.BloomJoins.uninstall(s)
      graft.plans.BloomJoins.clear()
    }
  }

  register("join_bloom_zone_composed", Some(
    """SELECT d.doc_id, d.lang, d.n_chars FROM documents d
      |WHERE d.n_chars >= 300
      |  AND d.doc_id IN (SELECT doc_id FROM documents
      |                   ORDER BY n_chars DESC, doc_id LIMIT 5)
      |ORDER BY d.doc_id""".stripMargin)) { (s, dir) =>
    // The two pruning tiers COMPOSED on one scan: the fact carries BOTH a
    // bloom index on doc_id (hash-spread — only membership skips) and a
    // zone map on n_chars (range-clustered — only zones skip); the query
    // is a dim-driven semi-join AND a plain range filter, and the rule
    // intersects the two candidate sets before swapping the scan — files
    // outside the range are skipped even when their bloom filter fires,
    // and in-range files without the keys are skipped even though the
    // zone intersects. The top-5 dim is a Limit above a Sort whose
    // ordering includes the KEY (n_chars DESC, doc_id), the one limit
    // shape the determinism contract certifies. REQUIREs file skipping;
    // rows hash against DuckDB over the raw table.
    val path = s"$sinkRoot/join_bloom_zone-${dir.replaceAll("[^0-9.]", "")}"
    val docs = Tables.table(s, dir, "documents")
    docs.select("doc_id", "lang", "n_chars")
      .repartitionByRange(16, col("n_chars"), col("doc_id"))
      .write.mode("overwrite").parquet(path)
    graft.sources.BloomIndex.write(s, path, Seq("doc_id"),
      expectedItemsPerFile = 100000, fpp = 0.01)
    graft.sources.ZoneMap.write(s, path, Seq("n_chars"))
    // registrations arrive via the writers' self-description: clear the
    // registries to the fresh-session state and let DISCOVERY fill them
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.BloomJoins.install(s)
    try {
      val f = s.read.parquet(path).where(col("n_chars") >= 300L)
      // the dim reads the ORIGINAL table (same rows), so the file-count
      // REQUIRE below measures the fact layout alone
      val dim = docs
        .orderBy(col("n_chars").desc, col("doc_id"))
        .limit(5).select(col("doc_id").as("id"))
      val q = f.join(dim, f("doc_id") === dim("id"), "left_semi")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
      val totalFiles = s.read.parquet(s"$path/_zonemap").count()
      val factFiles = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if f.location.rootPaths.exists(_.toString.contains(
                  "join_bloom_zone")) =>
              f.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(factFiles > 0 && factFiles < totalFiles,
        s"join_bloom_zone_composed: expected the composed rule to skip " +
          s"files ($factFiles of $totalFiles)")
      q.localCheckpoint()
    } finally {
      graft.plans.BloomJoins.uninstall(s)
      graft.plans.BloomJoins.clear()
    }
  }

  // ==========================================================================
  // Serializer / sink round-trips (SURVEY §2.3 T1-T7 + §2.8): each writes
  // the envelope through a real DataFrameWriter (format × compression ×
  // key strategy), reads the files back, and aggregates — the oracle runs
  // the same aggregate on the ORIGINAL events, so a pass proves the write
  // path is lossless end-to-end (the reference's s3_integration_test
  // contract, one query per format family).
  // ==========================================================================

  private val sinkRoot = "/root/repo/target/graft-out"

  private def envelopeDDL =
    "operation string, database string, collection string, " +
      "cluster_time timestamp, document_key string, full_document string, " +
      "resume_token string"

  private def writeReadBack(s: SparkSession, dir: String, name: String,
                            fmt: graft.sources.OutFormat,
                            comp: graft.sources.OutCompression,
                            strategy: graft.operators.KeyStrategy): DataFrame = {
    val env = CdcEnvelope.envelopeOnly(envelope(s, dir))
    val path = s"$sinkRoot/$name-${dir.replaceAll("[^0-9.]", "")}"
    graft.sources.Writers.write(env, path, fmt, comp, strategy)
    graft.sources.Writers.read(s, path, fmt, Some(envelopeDDL))
  }

  private val sinkOracle =
    """SELECT 'c_' || CAST(user_id % 8 AS VARCHAR) AS collection,
      |  count(*) AS n_events, count(DISTINCT event_id) AS n_ids,
      |  min(ts) AS first_time, max(ts) AS last_time
      |FROM events GROUP BY 1""".stripMargin

  private def sinkAggregate(back: DataFrame): DataFrame =
    back.groupBy("collection").agg(
      count(lit(1)).as("n_events"),
      countDistinct(get_json_object(col("document_key"), "$._id").cast("long"))
        .as("n_ids"),
      min(col("cluster_time")).as("first_time"),
      max(col("cluster_time")).as("last_time"))

  // Partition granularity note: hourly Hive keys are the STREAMING layout
  // (each micro-batch covers a few hours — see CdcPipeline/WritersSpec);
  // for a bulk 90-day dump they mean ~4,700 partition dirs and a
  // small-files explosion (measured 10× slower), so the bulk queries here
  // use date / collection granularity — the layout a real bulk export
  // would pick.
  register("sink_jsonl_gzip_date", Some(sinkOracle)) { (s, dir) =>
    sinkAggregate(writeReadBack(s, dir, "sink_jsonl_gzip_date",
      graft.sources.OutFormat.Jsonl, graft.sources.OutCompression.Gzip,
      graft.operators.KeyStrategy.DatePartitioned))
  }

  register("sink_jsonl_zstd_collection", Some(sinkOracle)) { (s, dir) =>
    // JSON + ZSTD is the reference's FASTEST sink config (performance.md:
    // 7.57 ms/1000 events, beats gzip by 13%) — benched here in the same
    // shape so the baseline comparison covers the best case, through the
    // custom ZstdCodec (no native-hadoop in this build).
    sinkAggregate(writeReadBack(s, dir, "sink_jsonl_zstd_collection",
      graft.sources.OutFormat.Jsonl, graft.sources.OutCompression.Zstd,
      graft.operators.KeyStrategy.CollectionBased))
  }

  register("sink_csv_gzip_collection", Some(sinkOracle)) { (s, dir) =>
    sinkAggregate(writeReadBack(s, dir, "sink_csv_gzip_collection",
      graft.sources.OutFormat.Csv, graft.sources.OutCompression.Gzip,
      graft.operators.KeyStrategy.CollectionBased))
  }

  register("sink_parquet_zstd_collection", Some(sinkOracle)) { (s, dir) =>
    sinkAggregate(writeReadBack(s, dir, "sink_parquet_zstd_collection",
      graft.sources.OutFormat.Parquet, graft.sources.OutCompression.Zstd,
      graft.operators.KeyStrategy.CollectionBased))
  }

  register("sink_avro_zstd_flat", Some(sinkOracle)) { (s, dir) =>
    sinkAggregate(writeReadBack(s, dir, "sink_avro_zstd_flat",
      graft.sources.OutFormat.Avro, graft.sources.OutCompression.Zstd,
      graft.operators.KeyStrategy.Flat))
  }

  register("sink_compact_small_files", Some(sinkOracle)) { (s, dir) =>
    // The lakehouse OPTIMIZE pass on the streaming-sink failure mode:
    // write the envelope DELIBERATELY fragmented (filesPerKeyHint = 16 —
    // what a 30 s-trigger sink leaves behind), then Compaction.compact
    // bin-packs each collection dir to ceil(measured_bytes / target)
    // files — here 1 — rewriting ONLY fragmented dirs under the
    // duplicates-never-loss swap. The oracle proves the rewrite is
    // lossless end-to-end; WritersSpec pins the file counts, report
    // arithmetic, idempotence, and selectivity.
    val env = CdcEnvelope.envelopeOnly(envelope(s, dir))
    val path = s"$sinkRoot/sink_compact_small_files-${
      dir.replaceAll("[^0-9.]", "")}"
    graft.sources.Writers.write(env, path, graft.sources.OutFormat.Parquet,
      graft.sources.OutCompression.Zstd,
      graft.operators.KeyStrategy.CollectionBased,
      filesPerKeyHint = Some(16))
    graft.sources.Compaction.compact(s, path,
      graft.sources.OutFormat.Parquet, graft.sources.OutCompression.Zstd,
      targetFileBytes = 64L << 20)
    sinkAggregate(graft.sources.Writers.read(s, path,
      graft.sources.OutFormat.Parquet, Some(envelopeDDL)))
  }

  register("join_salted_segment_revenue", Some(
    """SELECT c.c_mktsegment, count(*) AS n_orders,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue
      |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // The salt/replicate skew rewrite UNDER THE ORACLE: the oracle is the
    // PLAIN join's SQL, so the correctness gate itself proves salting is
    // output-invisible (no row changes join partners; the salt only
    // sub-divides each key's shuffle partition). salt=8 splits a hot
    // custkey across 8 tasks at the cost of replicating the customer side
    // 8× — the tier between broadcast and AQE's runtime split for keys
    // too hot for either.
    val o = Tables.orders(s, dir)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val c = Tables.customer(s, dir)
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    graft.operators.Skew.saltedJoin(o, c, "custkey", salt = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
  }

  register("events_skew_profile", Some(
    """WITH c AS (SELECT user_id AS key, count(*) AS n_rows
      |           FROM events GROUP BY 1),
      |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total,
      |             count(*) AS n_keys FROM c)
      |SELECT key, n_rows,
      |  round(CAST(n_rows AS DOUBLE) / total, 6) AS share,
      |  round(CAST(n_rows AS DOUBLE) * n_keys / total, 6) AS skew_ratio
      |FROM c, t
      |ORDER BY n_rows DESC, key ASC NULLS FIRST LIMIT 15""".stripMargin)) {
    (s, dir) =>
      // The skew DIAGNOSTIC feeding the salting/AQE decision: heaviest keys
      // with row share and multiple-of-mean load. One key-keyed partial-agg
      // count + a broadcast 1-row total + a TakeOrdered top-N with a total
      // order — one pass at any scale, topN rows out.
      graft.operators.Skew.profile(Tables.events(s, dir), "user_id", topN = 15)
  }

  register("join_cardinality_forecast", Some(
    """WITH c AS (SELECT l_partkey AS join_key, count(*) AS n
      |           FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
      |p AS (SELECT join_key, n AS rows_left, n AS rows_right,
      |             n * n AS out_rows FROM c),
      |t AS (SELECT CAST(sum(out_rows) AS BIGINT) AS total FROM p)
      |SELECT join_key, CAST(rows_left AS BIGINT) AS rows_left,
      |  CAST(rows_right AS BIGINT) AS rows_right,
      |  CAST(out_rows AS BIGINT) AS out_rows,
      |  round(CAST(out_rows AS DOUBLE) / total, 6) AS share
      |FROM p, t ORDER BY out_rows DESC, join_key LIMIT 10""".stripMargin)) { (s, dir) =>
    // Join-output forecast for the partsupp-derivation self-join the
    // TPC-H suite actually runs (lineitem ⋈ lineitem ON l_partkey): per
    // key, EXACT output rows = rows_left·rows_right, total, share — the
    // pre-flight answer to "how big is this join, and is one key about to
    // carry it?", computed from two key-count tables joined to each other
    // (inputs scanned once, never joined). The decision consumer is
    // Skew.saltedJoin / AQE skew handling; at 100 TB this costs two
    // partial-aggregated passes where the real join costs the shuffle of
    // both corpora.
    val li = Tables.lineitem(s, dir)
    graft.operators.Skew.joinForecast(li, li, "l_partkey", topN = 10)
      .withColumnRenamed("key", "join_key")
  }

  register("quality_profile_columns", Some(
    """WITH s AS (SELECT count(*) AS n_rows,
      |  count(l_orderkey) AS nn_ok, count(DISTINCT l_orderkey) AS nd_ok,
      |  CAST(min(l_orderkey) AS VARCHAR) AS mn_ok,
      |  CAST(max(l_orderkey) AS VARCHAR) AS mx_ok,
      |  CAST(sum(CAST(l_orderkey AS DECIMAL(38,6))) AS DOUBLE)
      |    / count(l_orderkey) AS av_ok,
      |  count(l_quantity) AS nn_q, count(DISTINCT l_quantity) AS nd_q,
      |  CAST(min(l_quantity) AS VARCHAR) AS mn_q,
      |  CAST(max(l_quantity) AS VARCHAR) AS mx_q,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
      |    / count(l_quantity) AS av_q,
      |  count(l_discount) AS nn_d, count(DISTINCT l_discount) AS nd_d,
      |  CAST(min(l_discount) AS VARCHAR) AS mn_d,
      |  CAST(max(l_discount) AS VARCHAR) AS mx_d,
      |  CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE)
      |    / count(l_discount) AS av_d,
      |  count(l_returnflag) AS nn_rf, count(DISTINCT l_returnflag) AS nd_rf,
      |  CAST(min(l_returnflag) AS VARCHAR) AS mn_rf,
      |  CAST(max(l_returnflag) AS VARCHAR) AS mx_rf,
      |  count(l_shipdate) AS nn_sd, count(DISTINCT l_shipdate) AS nd_sd,
      |  CAST(min(l_shipdate) AS VARCHAR) AS mn_sd,
      |  CAST(max(l_shipdate) AS VARCHAR) AS mx_sd
      |  FROM lineitem)
      |SELECT col_name, n_rows, n_nulls,
      |  round(CAST(n_nulls AS DOUBLE) / n_rows, 6) AS null_frac,
      |  n_distinct, min_value, max_value, round(avg_value, 6) AS avg_value
      |FROM (
      |  SELECT 'l_orderkey' AS col_name, n_rows, n_rows - nn_ok AS n_nulls,
      |    nd_ok AS n_distinct, mn_ok AS min_value, mx_ok AS max_value,
      |    av_ok AS avg_value FROM s
      |  UNION ALL SELECT 'l_quantity', n_rows, n_rows - nn_q, nd_q,
      |    mn_q, mx_q, av_q FROM s
      |  UNION ALL SELECT 'l_discount', n_rows, n_rows - nn_d, nd_d,
      |    mn_d, mx_d, av_d FROM s
      |  UNION ALL SELECT 'l_returnflag', n_rows, n_rows - nn_rf, nd_rf,
      |    mn_rf, mx_rf, CAST(NULL AS DOUBLE) FROM s
      |  UNION ALL SELECT 'l_shipdate', n_rows, n_rows - nn_sd, nd_sd,
      |    mn_sd, mx_sd, CAST(NULL AS DOUBLE) FROM s)
      |ORDER BY col_name""".stripMargin)) { (s, dir) =>
    // Deequ-style ingest profile: every per-column statistic (null count/
    // fraction, exact distinct, native-typed min/max, decimal-routed avg)
    // folds into ONE no-grouping aggregate over ONE scan, melted to one
    // row per column — the scan count never grows with the column count.
    // Exact distinct is the oracled mode and costs an ×n_cols row expand
    // before the partial agg; at 100 TB Quality.profile(exact = false)
    // swaps in HLL sketches (one expansion-free pass, ±2.3%).
    graft.operators.Quality.profile(Tables.lineitem(s, dir),
      Seq("l_orderkey", "l_quantity", "l_discount", "l_returnflag",
        "l_shipdate"))
  }

  register("quality_constraint_checks", Some(
    """WITH scan AS (
      |  SELECT
      |    sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS v_nn,
      |    sum(CASE WHEN l_quantity IS NOT NULL
      |             AND (l_quantity < 1 OR l_quantity > 30)
      |             THEN 1 ELSE 0 END) AS v_range,
      |    sum(CASE WHEN l_returnflag IS NOT NULL
      |             AND l_returnflag NOT IN ('A', 'N')
      |             THEN 1 ELSE 0 END) AS v_acc
      |  FROM lineitem),
      |uniq AS (
      |  SELECT coalesce(sum(n - 1), 0) AS v FROM (
      |    SELECT count(*) AS n FROM lineitem
      |    GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)),
      |fk AS (
      |  SELECT count(*) AS v FROM lineitem
      |  WHERE l_orderkey IS NOT NULL
      |    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
      |r AS (
      |  SELECT 'not_null:l_orderkey' AS "check", v_nn AS violations FROM scan
      |  UNION ALL SELECT 'range:l_quantity[1.0,30.0]', v_range FROM scan
      |  UNION ALL SELECT 'accepted:l_returnflag{A,N}', v_acc FROM scan
      |  UNION ALL SELECT 'unique:l_orderkey,l_linenumber', v FROM uniq
      |  UNION ALL SELECT 'fk:l_orderkey', v FROM fk)
      |SELECT "check", CAST(violations AS BIGINT) AS violations,
      |  CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
      |FROM r ORDER BY "check"""".stripMargin)) { (s, dir) =>
    // Declarative constraint gate: all scan-local checks (not-null, range,
    // accepted-values) fold into ONE conditional-sum aggregate over ONE
    // scan; the uniqueness check is one keyed partial-agg count; the
    // FK check is one anti-join whose parent key side Catalyst broadcasts
    // at dimension size. Output is checks-many rows regardless of input
    // size. The range/accepted bounds here are deliberately TIGHTER than
    // the fixture (quantity ≤ 30, flags {A,N}) so the violation counters
    // are exercised with non-zero mass, not just all-pass zeros.
    import graft.operators.Quality._
    graft.operators.Quality.runChecks(Tables.lineitem(s, dir), Seq(
        NotNull("l_orderkey"),
        InRange("l_quantity", 1, 30),
        AcceptedValues("l_returnflag", Seq("A", "N")),
        Unique(Seq("l_orderkey", "l_linenumber")),
        ForeignKey("l_orderkey", Tables.orders(s, dir), "o_orderkey")))
      .orderBy(col("check"))
  }

  // shared verbatim by quality_drift_psi AND its streaming leg
  // stream_drift_psi: the incremental monitor must read exactly what the
  // batch monitor reads
  private val driftPsiOracle =
    """WITH cur AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |mm AS (SELECT CAST(min(value) AS DOUBLE) mnv, CAST(max(value) AS DOUBLE) mxv,
      |              CAST(min(user_id) AS DOUBLE) mnu, CAST(max(user_id) AS DOUBLE) mxu
      |       FROM events),
      |bref AS (
      |  SELECT 'value' AS col_name,
      |    CASE WHEN e.value IS NULL THEN -1
      |         ELSE least(greatest(CAST(floor((CAST(e.value AS DOUBLE) - mm.mnv)
      |           / ((mm.mxv - mm.mnv) / 10)) AS INT), 0), 9) END AS bucket
      |  FROM events e, mm
      |  UNION ALL
      |  SELECT 'user_id',
      |    CASE WHEN e.user_id IS NULL THEN -1
      |         ELSE least(greatest(CAST(floor((CAST(e.user_id AS DOUBLE) - mm.mnu)
      |           / ((mm.mxu - mm.mnu) / 10)) AS INT), 0), 9) END
      |  FROM events e, mm),
      |bcur AS (
      |  SELECT 'value' AS col_name,
      |    CASE WHEN e.value IS NULL THEN -1
      |         ELSE least(greatest(CAST(floor((CAST(e.value AS DOUBLE) - mm.mnv)
      |           / ((mm.mxv - mm.mnv) / 10)) AS INT), 0), 9) END AS bucket
      |  FROM cur e, mm
      |  UNION ALL
      |  SELECT 'user_id',
      |    CASE WHEN e.user_id IS NULL THEN -1
      |         ELSE least(greatest(CAST(floor((CAST(e.user_id AS DOUBLE) - mm.mnu)
      |           / ((mm.mxu - mm.mnu) / 10)) AS INT), 0), 9) END
      |  FROM cur e, mm),
      |cr AS (SELECT col_name, bucket, count(*) AS n_ref FROM bref GROUP BY 1, 2),
      |cc AS (SELECT col_name, bucket, count(*) AS n_cur FROM bcur GROUP BY 1, 2),
      |j AS (SELECT coalesce(cr.col_name, cc.col_name) AS col_name,
      |             coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
      |      FROM cr FULL OUTER JOIN cc
      |        ON cr.col_name = cc.col_name AND cr.bucket = cc.bucket),
      |t AS (SELECT col_name, n_ref, n_cur,
      |             CAST(sum(n_ref) OVER (PARTITION BY col_name) AS BIGINT) AS tr,
      |             CAST(sum(n_cur) OVER (PARTITION BY col_name) AS BIGINT) AS tc
      |      FROM j),
      |p AS (SELECT col_name, tr, tc,
      |             greatest(CAST(n_ref AS DOUBLE) / tr, 0.0001) AS pr,
      |             greatest(CAST(n_cur AS DOUBLE) / tc, 0.0001) AS pc FROM t)
      |SELECT col_name,
      |  round(CAST(sum(CAST((pc - pr) * ln(pc / pr) AS DECIMAL(38,12)))
      |    AS DOUBLE), 6) AS psi,
      |  max(tr) AS n_ref, max(tc) AS n_cur
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  register("quality_drift_psi", Some(driftPsiOracle)) { (s, dir) =>
    // Distribution DRIFT as the population stability index — the
    // between-ingest monitoring question ("is today's feed still
    // yesterday's distribution?"): reference = the full events history,
    // current = the purchase slice (a deliberately CONDITIONED
    // distribution, so the entry exercises non-zero drift, not just 0).
    // Reference pins the equal-width binning (the published recipe);
    // NULLs bucket separately; ε-smoothing keeps empty buckets finite;
    // decimal-routed term sum so accumulation order can't move the
    // reported PSI. DuckDB replays the identical binning + smoothing.
    val events = Tables.events(s, dir)
    graft.operators.Quality.driftPsi(events,
        events.filter(col("event_type") === "purchase"),
        Seq("value", "user_id"), nBuckets = 10)
      .orderBy(col("col_name"))
  }

  register("quality_drift_ks", Some(
    """WITH cur AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |mr AS (
      |  SELECT 'value' AS col_name, CAST(value AS DOUBLE) AS v
      |  FROM events WHERE value IS NOT NULL
      |  UNION ALL
      |  SELECT 'user_id', CAST(user_id AS DOUBLE)
      |  FROM events WHERE user_id IS NOT NULL),
      |mc AS (
      |  SELECT 'value' AS col_name, CAST(value AS DOUBLE) AS v
      |  FROM cur WHERE value IS NOT NULL
      |  UNION ALL
      |  SELECT 'user_id', CAST(user_id AS DOUBLE)
      |  FROM cur WHERE user_id IS NOT NULL),
      |cr AS (SELECT col_name, v, count(*) AS n_ref FROM mr GROUP BY 1, 2),
      |cc AS (SELECT col_name, v, count(*) AS n_cur FROM mc GROUP BY 1, 2),
      |j AS (SELECT coalesce(cr.col_name, cc.col_name) AS col_name,
      |             coalesce(cr.v, cc.v) AS v,
      |             coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
      |      FROM cr FULL OUTER JOIN cc
      |        ON cr.col_name = cc.col_name AND cr.v = cc.v),
      |w AS (SELECT col_name,
      |        CAST(sum(n_ref) OVER (PARTITION BY col_name
      |          ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rcum,
      |        CAST(sum(n_cur) OVER (PARTITION BY col_name
      |          ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ccum,
      |        CAST(sum(n_ref) OVER (PARTITION BY col_name) AS BIGINT) AS tr,
      |        CAST(sum(n_cur) OVER (PARTITION BY col_name) AS BIGINT) AS tc
      |      FROM j)
      |SELECT col_name,
      |  round(max(abs(CAST(rcum AS DOUBLE) / tr - CAST(ccum AS DOUBLE) / tc)),
      |    6) AS ks,
      |  max(tr) AS n_ref, max(tc) AS n_cur
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, dir) =>
    // Two-sample Kolmogorov–Smirnov drift — the binning-free sibling of
    // quality_drift_psi over the SAME reference/current pair, so the two
    // monitors are directly comparable on one feed: KS reports the
    // worst-case CDF gap anywhere (catching a shift inside one PSI
    // bucket), with no binning hyper-parameter. The shuffle carries one
    // count row per distinct value per column — never data rows; NULLs
    // are excluded (null-rate drift is PSI's bucket −1 job). Integer
    // counts + exact rational CDFs keep the statistic engine-portable.
    val events = Tables.events(s, dir)
    graft.operators.Quality.driftKs(events,
        events.filter(col("event_type") === "purchase"),
        Seq("value", "user_id"))
      .orderBy(col("col_name"))
  }

  register("quality_drift_ks_sketch", None) { (s, dir) =>
    // The continuous-column scale path quality_drift_ks documents: KS
    // estimated from one mergeable KLL sketch per side per column —
    // shuffle carries KB sketch partials instead of per-distinct-value
    // counts, no per-column sort, and persisted per-partition sketches
    // answer drift over ANY date range later (the agg_kll_mergeable
    // architecture applied to monitoring). KLL compaction is randomized
    // → no_oracle by nature; QualitySpec gates |approx − exact| ≤ 0.05
    // against the exact statistic, and the entry carries both readings
    // side by side on the SAME pair the exact entry monitors.
    val events = Tables.events(s, dir)
    val cur = events.filter(col("event_type") === "purchase")
    val approx = graft.operators.Quality.driftKsSketch(
      events, cur, Seq("value", "user_id"))
    val exact = graft.operators.Quality.driftKs(
        events, cur, Seq("value", "user_id"))
      .select(col("col_name"), col("ks").as("ks_exact"))
    approx.join(exact, "col_name")
      .select(col("col_name"), col("ks_approx"), col("ks_exact"),
        col("n_ref"), col("n_cur"))
      .orderBy(col("col_name"))
  }

  register("quality_histogram_equidepth", Some(
    """WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
      |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |q AS (SELECT quantile_cont(x,
      |        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs FROM v),
      |b AS (SELECT
      |    CAST(x > bs[1] AS INT) + CAST(x > bs[2] AS INT) +
      |    CAST(x > bs[3] AS INT) + CAST(x > bs[4] AS INT) +
      |    CAST(x > bs[5] AS INT) + CAST(x > bs[6] AS INT) +
      |    CAST(x > bs[7] AS INT) + CAST(x > bs[8] AS INT) +
      |    CAST(x > bs[9] AS INT) AS bucket, x
      |  FROM v, q)
      |SELECT bucket, count(*) AS n,
      |  round(min(x), 6) AS lo, round(max(x), 6) AS hi
      |FROM b GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Equi-depth histogram (the profiler's missing shape statistic, and
    // the boundary artifact selectivity estimation is built on): one
    // exact-percentile pass pins 9 interior boundaries, bucket = count
    // of boundaries below the value (ties land low — pinned,
    // engine-replayable), compiled as a codegen'd comparison sum; one
    // grouped count/min/max pass finishes. DuckDB replays boundary
    // interpolation and the tie rule exactly.
    graft.operators.Quality.histogram(
        Tables.lineitem(s, dir), "l_extendedprice", nBuckets = 10)
      .orderBy(col("bucket"))
  }

  register("quality_outliers_mad", Some(
    """WITH v AS (SELECT event_type, CAST(value AS DOUBLE) AS x
      |           FROM events WHERE value IS NOT NULL),
      |m AS (SELECT event_type, quantile_cont(x, 0.5) AS med
      |      FROM v GROUP BY 1),
      |d AS (SELECT v.event_type, v.x, m.med, abs(v.x - m.med) AS dev
      |      FROM v JOIN m USING (event_type)),
      |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
      |       FROM d GROUP BY 1)
      |SELECT d.event_type,
      |  count(*) AS n,
      |  round(max(d.med), 6) AS median,
      |  round(max(md.mad), 6) AS mad,
      |  count(CASE WHEN CASE WHEN md.mad > 0
      |      THEN d.dev / (1.4826 * md.mad) > 3.5
      |      ELSE d.dev > 0 END THEN 1 END) AS n_outliers
      |FROM d JOIN md USING (event_type)
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Robust outlier gate (modified z-score over median/MAD, Iglewicz &
    // Hoaglin): per event_type, how many values deviate beyond 3.5
    // robust sigmas — the mean/stddev rule's 50%-breakdown replacement
    // (one wild value can't drag the center or inflate the scale until
    // nothing flags). Two grouped exact-percentile passes + one counting
    // pass; the group-stats tables broadcast back (dimension-sized).
    // DuckDB replays it exactly: Spark percentile == quantile_cont.
    graft.operators.Quality.outliersMad(
        Tables.events(s, dir), "value", "event_type")
      .orderBy(col("event_type"))
  }

  register("quality_drift_by_group", Some(
    """WITH cur AS (SELECT * FROM events
      |             WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
      |mm AS (SELECT CAST(min(value) AS DOUBLE) mn,
      |              CAST(max(value) AS DOUBLE) mx FROM events),
      |br AS (SELECT coalesce(e.event_type, '∅') AS g,
      |  CASE WHEN e.value IS NULL THEN -1
      |       ELSE least(greatest(CAST(floor((CAST(e.value AS DOUBLE) - mm.mn)
      |         / ((mm.mx - mm.mn) / 10)) AS INT), 0), 9) END AS bucket
      |  FROM events e, mm),
      |bc AS (SELECT coalesce(e.event_type, '∅') AS g,
      |  CASE WHEN e.value IS NULL THEN -1
      |       ELSE least(greatest(CAST(floor((CAST(e.value AS DOUBLE) - mm.mn)
      |         / ((mm.mx - mm.mn) / 10)) AS INT), 0), 9) END AS bucket
      |  FROM cur e, mm),
      |cr AS (SELECT g, bucket, count(*) AS n_ref FROM br GROUP BY 1, 2),
      |cc AS (SELECT g, bucket, count(*) AS n_cur FROM bc GROUP BY 1, 2),
      |j AS (SELECT coalesce(cr.g, cc.g) AS g,
      |             coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
      |      FROM cr FULL OUTER JOIN cc
      |        ON cr.g = cc.g AND cr.bucket = cc.bucket),
      |t AS (SELECT g, n_ref, n_cur,
      |             CAST(sum(n_ref) OVER (PARTITION BY g) AS BIGINT) AS tr,
      |             CAST(sum(n_cur) OVER (PARTITION BY g) AS BIGINT) AS tc
      |      FROM j),
      |p AS (SELECT g, tr, tc,
      |             greatest(CAST(n_ref AS DOUBLE) / tr, 0.0001) AS pr,
      |             greatest(CAST(n_cur AS DOUBLE) / tc, 0.0001) AS pc FROM t)
      |SELECT g AS event_type,
      |  round(CAST(sum(CAST((pc - pr) * ln(pc / pr) AS DECIMAL(38,12)))
      |    AS DOUBLE), 6) AS psi,
      |  max(tr) AS n_ref, max(tc) AS n_cur
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, dir) =>
    // Segment-resolution drift — "WHICH event type moved in the second
    // half of the month?": globally-pinned binning (groups share
    // comparable buckets) with a full-resolution PSI per group; shuffle
    // carries groups·12 count rows. The group key rides psiFromCounts
    // where the column name rode — one finisher, three monitors
    // (per-column, streaming, per-group). DuckDB replays binning,
    // smoothing and grouping identically.
    val events = Tables.events(s, dir)
    graft.operators.Quality.driftPsiByGroup(events,
        events.filter(col("ts") >= lit("2024-01-16 00:00:00").cast("timestamp")),
        valueCol = "value", groupCol = "event_type")
      .orderBy(col("event_type"))
  }

  register("quality_fd_discovery", Some(
    """WITH m AS (
      |  SELECT 'c_custkey' AS determinant, 'c_nationkey' AS dependent,
      |         coalesce(CAST(c_custkey AS VARCHAR), '∅') AS lhs,
      |         coalesce(CAST(c_nationkey AS VARCHAR), '∅') AS rhs FROM customer
      |  UNION ALL
      |  SELECT 'c_nationkey', 'c_mktsegment',
      |         coalesce(CAST(c_nationkey AS VARCHAR), '∅'),
      |         coalesce(c_mktsegment, '∅') FROM customer
      |  UNION ALL
      |  SELECT 'c_mktsegment', 'c_nationkey',
      |         coalesce(c_mktsegment, '∅'),
      |         coalesce(CAST(c_nationkey AS VARCHAR), '∅') FROM customer),
      |cells AS (SELECT determinant, dependent, lhs, rhs, count(*) AS cnt
      |          FROM m GROUP BY 1, 2, 3, 4),
      |grp AS (SELECT determinant, dependent, lhs, count(*) AS nd,
      |               CAST(sum(cnt) AS BIGINT) AS n, max(cnt) AS modal
      |        FROM cells GROUP BY 1, 2, 3)
      |SELECT determinant, dependent, count(*) AS n_groups,
      |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS violating_groups,
      |  CAST(sum(n - modal) AS BIGINT) AS violation_rows,
      |  CAST(sum(n) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) = 0 AS holds,
      |  CAST(1.0 AS DOUBLE) - CAST(sum(n - modal) AS DOUBLE)
      |    / CAST(sum(n) AS DOUBLE) AS strength
      |FROM grp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { (s, dir) =>
    // Schema-trust audit before a pipeline leans on a column as a key:
    // c_custkey → c_nationkey holds (key determinant), the two
    // nationkey/mktsegment directions are broken with a measured g3
    // strength. One exploded scan, shuffle carries distinct value cells;
    // DuckDB replays the same three-level reduction.
    graft.operators.Quality.fdProfile(Tables.table(s, dir, "customer"),
        Seq("c_custkey" -> "c_nationkey", "c_nationkey" -> "c_mktsegment",
          "c_mktsegment" -> "c_nationkey"))
      .orderBy(col("determinant"), col("dependent"))
  }

  register("quality_drift_timeline", None) { (s, dir) =>
    // Day-over-day drift timeline — the persisted-sketch monitoring
    // architecture composed: one KLL sketch per ingest day (the artifact
    // a 100 TB pipeline persists beside the day's partition, as
    // agg_kll_mergeable persists weekly rollups), consecutive days'
    // curves differenced for approximate KS — "which ingest day broke
    // the feed?" answered with one pass over the table (zero passes when
    // sketches are persisted) + arithmetic on one row per day. KLL is
    // randomized → no_oracle; QualitySpec gates the timeline against the
    // exact per-day-pair statistic (synthetic broken-day fixture reads
    // ~1 on the broken day, ~0 on quiet days).
    graft.operators.Quality
      .driftTimeline(Tables.events(s, dir), "value", "ts")
      .orderBy(col("day"))
  }

  register("quality_drift_categorical", Some(
    """WITH cur AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
      |mr AS (SELECT 'lang' AS col_name, coalesce(lang, '∅') AS cat
      |       FROM documents
      |       UNION ALL
      |       SELECT 'source', coalesce(source, '∅') FROM documents),
      |mc AS (SELECT 'lang' AS col_name, coalesce(lang, '∅') AS cat FROM cur
      |       UNION ALL
      |       SELECT 'source', coalesce(source, '∅') FROM cur),
      |cr AS (SELECT col_name, cat, count(*) AS n_ref FROM mr GROUP BY 1, 2),
      |cc AS (SELECT col_name, cat, count(*) AS n_cur FROM mc GROUP BY 1, 2),
      |j AS (SELECT coalesce(cr.col_name, cc.col_name) AS col_name,
      |             coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
      |      FROM cr FULL OUTER JOIN cc
      |        ON cr.col_name = cc.col_name AND cr.cat = cc.cat),
      |t AS (SELECT col_name, n_ref, n_cur,
      |        CAST(sum(n_ref) OVER (PARTITION BY col_name) AS BIGINT) AS tr,
      |        CAST(sum(n_cur) OVER (PARTITION BY col_name) AS BIGINT) AS tc,
      |        count(*) OVER (PARTITION BY col_name) AS k
      |      FROM j),
      |p AS (SELECT col_name, n_cur, tr, tc, k,
      |        greatest(CAST(n_ref AS DOUBLE) / tr, 0.0001) AS pr,
      |        greatest(CAST(n_cur AS DOUBLE) / tc, 0.0001) AS pc,
      |        (CAST(tc AS DOUBLE) * (CAST(n_ref AS DOUBLE) + 0.5)) /
      |          (CAST(tr AS DOUBLE) + 0.5 * CAST(k AS DOUBLE)) AS e
      |      FROM t)
      |SELECT col_name,
      |  round(CAST(sum(CAST((pc - pr) * ln(pc / pr) AS DECIMAL(38,12)))
      |    AS DOUBLE), 6) AS psi,
      |  round(CAST(sum(CAST((CAST(n_cur AS DOUBLE) - e) *
      |      (CAST(n_cur AS DOUBLE) - e) / e AS DECIMAL(38,12)))
      |    AS DOUBLE), 6) AS chi2,
      |  CAST(max(k) AS BIGINT) AS n_categories,
      |  max(tr) AS n_ref, max(tc) AS n_cur
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, dir) =>
    // Categorical mix drift — the discrete third leg of the drift suite:
    // PSI over category proportions + add-half-smoothed chi-square, per
    // string column, reference = the full corpus vs current = a
    // deterministic doc_id%3 slice (near-zero drift by construction —
    // the entry pins the SMOOTHED zero-ish regime, while QualitySpec
    // pins hard mix changes). NULL is a first-class category (sentinel
    // ∅); the shuffle carries one count row per category per column.
    val docs = Tables.documents(s, dir)
    graft.operators.Quality.driftCategorical(docs,
        docs.filter(col("doc_id") % 3 === 0),
        Seq("lang", "source"))
      .orderBy(col("col_name"))
  }

  register("quality_correlations", Some(
    """WITH s AS (SELECT
      |  count(*) AS n,
      |  sum(CAST(l_quantity AS DECIMAL(38,8))) AS s_q,
      |  sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS s_e,
      |  sum(CAST(l_discount AS DECIMAL(38,8))) AS s_d,
      |  sum(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS s_qq,
      |  sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS s_ee,
      |  sum(CAST(l_discount * l_discount AS DECIMAL(38,8))) AS s_dd,
      |  sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8))) AS s_qe,
      |  sum(CAST(l_quantity * l_discount AS DECIMAL(38,8))) AS s_qd,
      |  sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,8))) AS s_ed
      |  FROM lineitem),
      |p AS (
      |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
      |    CAST(s_q AS DOUBLE) AS sx, CAST(s_e AS DOUBLE) AS sy,
      |    CAST(s_qq AS DOUBLE) AS sxx, CAST(s_ee AS DOUBLE) AS syy,
      |    CAST(s_qe AS DOUBLE) AS sxy FROM s
      |  UNION ALL
      |  SELECT 'l_quantity', 'l_discount', n,
      |    CAST(s_q AS DOUBLE), CAST(s_d AS DOUBLE), CAST(s_qq AS DOUBLE),
      |    CAST(s_dd AS DOUBLE), CAST(s_qd AS DOUBLE) FROM s
      |  UNION ALL
      |  SELECT 'l_extendedprice', 'l_discount', n,
      |    CAST(s_e AS DOUBLE), CAST(s_d AS DOUBLE), CAST(s_ee AS DOUBLE),
      |    CAST(s_dd AS DOUBLE), CAST(s_ed AS DOUBLE) FROM s)
      |SELECT col_a, col_b, n,
      |  round((CAST(n AS DOUBLE) * sxy - sx * sy) /
      |    sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
      |      * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr
      |FROM p""".stripMargin)) { (s, dir) =>
    // Pairwise Pearson over the fact table's numeric columns — the
    // drift/leakage smell test a feature pipeline runs per ingest (a
    // correlation that jumps between snapshots means a schema or
    // semantics change upstream). All six moments of all three pairs
    // fold into ONE aggregate pass; decimal-routed sums make the final
    // double expression engine-exact, where built-in corr()'s
    // double-folded accumulators drift in the last ulps across engines.
    graft.operators.Quality.correlations(Tables.lineitem(s, dir),
      Seq("l_quantity", "l_extendedprice", "l_discount"))
  }

  register("quality_quarantine_rows", Some(
    """WITH q AS (SELECT
      |  CASE
      |    WHEN l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 30)
      |      THEN 'range:l_quantity[1.0,30.0]'
      |    WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N')
      |      THEN 'accepted:l_returnflag{A,N}'
      |    ELSE NULL END AS quarantine_reason
      |  FROM lineitem)
      |SELECT quarantine_reason, count(*) AS n_rows
      |FROM q GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin)) { (s, dir) =>
    // The row-level gate behind the summary checks: every row tagged with
    // its FIRST failing check in declaration order (NULL = clean — here
    // the majority class), then counted by reason. The tagging itself is
    // a narrow scan-local projection (no shuffle, no state) — the same
    // expression drops into a streaming transform to fork a dead-letter
    // path; the count here only makes the result assertable.
    import graft.operators.Quality._
    graft.operators.Quality.quarantine(Tables.lineitem(s, dir), Seq(
        InRange("l_quantity", 1, 30),
        AcceptedValues("l_returnflag", Seq("A", "N"))))
      .groupBy(col("quarantine_reason"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("quarantine_reason").asc_nulls_first)
  }

  register("layout_zonemap_events", Some(
    """SELECT count(*) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      |FROM events WHERE value >= 100 AND value <= 200""".stripMargin)) {
    (s, dir) =>
      // File-level zone-map skipping: range-cluster the layout on `value`,
      // build the per-file min/max manifest in ONE distributed pass
      // (input_file_name groupBy — no footer loops), then answer a value-
      // band query by scanning ONLY the files whose zone intersects. The
      // oracle checks the ANSWER against the raw table — file skipping
      // must be invisible to results; ZoneMapSpec proves the skipping
      // itself (candidate files < total, == full-filter rows, and the
      // width_share diagnostic separating clustered from random layouts).
      val path = s"$sinkRoot/layout_zonemap_events-${
        dir.replaceAll("[^0-9.]", "")}"
      Tables.events(s, dir).repartitionByRange(16, col("value"))
        .write.mode("overwrite").parquet(path)
      graft.sources.ZoneMap.write(s, path, Seq("value"))
      graft.sources.ZoneMap.prunedRead(s, path, "value", 100.0, 200.0)
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          dsum(col("value")).as("sum_value"))
  }

  register("layout_zonemap_metaonly", Some(
    """SELECT count(*) AS n_rows,
      |  min(value) AS value_min, max(value) AS value_max,
      |  CAST(count(*) - count(value) AS BIGINT) AS value_nulls,
      |  min(user_id) AS user_id_min, max(user_id) AS user_id_max,
      |  CAST(count(*) - count(user_id) AS BIGINT) AS user_id_nulls
      |FROM events""".stripMargin)) { (s, dir) =>
    // Metadata-only aggregation: the count/min/max/nulls dashboard query
    // answered from the zone-map manifest ALONE — these four statistics
    // compose losslessly from per-file zones (count = Σ, min = min of
    // mins …), so the answer costs a files-sized metadata scan, never the
    // 100 TB data scan. The oracle runs the SAME aggregate on the raw
    // table; ZoneMapSpec proves zero-data-files by answering AFTER the
    // data files are deleted out from under the manifest.
    val path = s"$sinkRoot/layout_zonemap_metaonly-${
      dir.replaceAll("[^0-9.]", "")}"
    Tables.events(s, dir).repartition(8)
      .write.mode("overwrite").parquet(path)
    graft.sources.ZoneMap.write(s, path, Seq("value", "user_id"))
    graft.sources.ZoneMap.metaProfile(s, path, Seq("value", "user_id"))
  }

  register("layout_bloom_pointlookup", Some(
    """SELECT doc_id, source, lang, n_chars FROM documents
      |WHERE doc_id IN (SELECT doc_id FROM documents
      |                 ORDER BY doc_id LIMIT 5)
      |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    // File-level BLOOM skipping — the point-lookup complement of the zone
    // map: the layout is hash-spread (doc_id ranges overlap in every
    // file, a min/max zone prunes nothing), but each file's Bloom filter
    // still answers "can doc_id = X live here?", so an IN-list lookup
    // opens only the files whose filters fire. The oracle checks the
    // ANSWER against the raw table — skipping must be invisible;
    // BloomIndexSpec proves the pruning itself (candidates ≪ files on
    // the random layout where the zone map stays blind, no false
    // negatives, replay reaping via the shared Manifests protocol).
    val path = s"$sinkRoot/layout_bloom_pointlookup-${
      dir.replaceAll("[^0-9.]", "")}"
    val docs = Tables.table(s, dir, "documents")
    docs.repartition(16)
      .write.mode("overwrite").parquet(path)
    graft.sources.BloomIndex.write(s, path, Seq("doc_id"),
      expectedItemsPerFile = 100000, fpp = 0.01)
    val ids = docs.select(col("doc_id")).orderBy(col("doc_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    graft.sources.BloomIndex.prunedRead(s, path, "doc_id", ids)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  register("layout_zonemap_auto_range", Some(
    """SELECT count(*) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      |FROM events WHERE value >= 100 AND value <= 200""".stripMargin)) {
    (s, dir) =>
      // The OPTIMIZER-tier sibling of layout_zonemap_events: the user
      // writes a PLAIN range filter — no ZoneMap API — and the registered
      // graft.plans.BloomJoins zone rule swaps the scan for the files
      // whose min/max zone intersects (the two BETWEEN conjuncts probe
      // independently and their candidate sets intersect; the Filter
      // stays above, so zone false-positives re-filter exactly).
      // REQUIREs that the optimized plan reads fewer files than the
      // layout holds.
      val path = s"$sinkRoot/layout_zonemap_auto_range-${
        dir.replaceAll("[^0-9.]", "")}"
      Tables.events(s, dir).repartitionByRange(16, col("value"))
        .write.mode("overwrite").parquet(path)
      // the WRITE is the only setup: ZoneMap.write SELF-DESCRIBES the
      // layout in _graft_catalog.json, and the fresh-session state below
      // (registries + discovery cache cleared) REQUIREs the pruning to
      // arrive purely through catalog DISCOVERY — zero register() calls
      graft.sources.ZoneMap.write(s, path, Seq("value"))
      graft.plans.BloomJoins.clear()
      graft.plans.GraftCatalog.clearCache()
      graft.plans.BloomJoins.install(s)
      try {
        val q = s.read.parquet(path)
          .where(col("value") >= 100.0 && col("value") <= 200.0) // PLAIN
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            dsum(col("value")).as("sum_value"))
        val totalFiles = s.read.parquet(s"$path/_zonemap").count()
        val factFiles = q.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            r.relation match {
              case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                  if f.location.rootPaths.exists(_.toString.contains(
                    "layout_zonemap_auto_range")) =>
                f.location.inputFiles.length.toLong
              case _ => 0L
            }
        }.sum
        require(factFiles > 0 && factFiles < totalFiles,
          s"layout_zonemap_auto_range: expected the RULE to skip files " +
            s"($factFiles of $totalFiles)")
        q.localCheckpoint()
      } finally {
        graft.plans.BloomJoins.uninstall(s)
        graft.plans.BloomJoins.clear()
      }
  }

  register("layout_bloom_auto_pointlookup", Some(
    """SELECT doc_id, source, lang, n_chars FROM documents
      |WHERE doc_id IN (SELECT doc_id FROM documents
      |                 ORDER BY doc_id LIMIT 5)
      |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    // The OPTIMIZER-tier sibling of layout_bloom_pointlookup: the user
    // writes a PLAIN IN-list filter — no BloomIndex API — and the
    // registered graft.plans.BloomJoins rule swaps the scan for the
    // candidate files (the Filter stays above, so fpp noise re-filters
    // exactly). REQUIREs that the optimized plan reads fewer files than
    // the layout holds.
    val path = s"$sinkRoot/layout_bloom_auto_pl-${
      dir.replaceAll("[^0-9.]", "")}"
    val docs = Tables.table(s, dir, "documents")
    docs.repartition(16)
      .write.mode("overwrite").parquet(path)
    // the WRITE is the only setup: BloomIndex.write SELF-DESCRIBES the
    // layout in _graft_catalog.json; registries + discovery cache are
    // then cleared (a brand-new session's state), so the file skipping
    // REQUIREd below arrives purely through catalog DISCOVERY
    graft.sources.BloomIndex.write(s, path, Seq("doc_id"),
      expectedItemsPerFile = 100000, fpp = 0.01)
    val ids = docs.select(col("doc_id")).orderBy(col("doc_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.BloomJoins.install(s)
    try {
      val q = s.read.parquet(path)
        .where(col("doc_id").isin(ids: _*)) // the PLAIN spelling
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
      val totalFiles = s.read.parquet(s"$path/_bloomindex").count()
      val factFiles = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if f.location.rootPaths.exists(_.toString.contains(
                  "layout_bloom_auto_pl")) =>
              f.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(factFiles > 0 && factFiles < totalFiles,
        s"layout_bloom_auto_pointlookup: expected DISCOVERY of the " +
          s"self-written catalog to skip files ($factFiles of $totalFiles)")
      q.localCheckpoint()
    } finally {
      graft.plans.BloomJoins.uninstall(s)
      graft.plans.BloomJoins.clear()
    }
  }

  register("layout_catalog_fresh_session", Some(
    """SELECT doc_id, source, lang, n_chars FROM documents
      |WHERE doc_id IN (SELECT doc_id FROM documents
      |                 ORDER BY doc_id DESC LIMIT 5)
      |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    // The PERSISTED-registry path, end-to-end: the bloom layout
    // registration is written beside the data (GraftCatalog.save) and
    // every in-memory registry plus the discovery cache is then cleared —
    // exactly the state a brand-new session starts from. The plain
    // IN-list query must file-skip purely through catalog DISCOVERY
    // (REQUIREd below: no register() call stands when it plans), and the
    // rows the driver hashes against DuckDB come from that discovered
    // pruned plan.
    val path = s"$sinkRoot/layout_catalog_fs-${
      dir.replaceAll("[^0-9.]", "")}"
    val docs = Tables.table(s, dir, "documents")
    docs.repartition(16)
      .write.mode("overwrite").parquet(path)
    graft.sources.BloomIndex.write(s, path, Seq("doc_id"),
      expectedItemsPerFile = 100000, fpp = 0.01)
    val ids = docs.select(col("doc_id")).orderBy(col("doc_id").desc)
      .limit(5).collect().map(_.getLong(0)).toSeq
    graft.plans.BloomJoins.register(graft.plans.BloomJoins.Layout(
      path, "doc_id"))
    graft.plans.GraftCatalog.save(s, path)
    // the fresh-session state: registries and discovery memory emptied
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.BloomJoins.install(s)
    try {
      val q = s.read.parquet(path)
        .where(col("doc_id").isin(ids: _*)) // the PLAIN spelling
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
      val totalFiles = s.read.parquet(s"$path/_bloomindex").count()
      val factFiles = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if f.location.rootPaths.exists(_.toString.contains(
                  "layout_catalog_fs")) =>
              f.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(factFiles > 0 && factFiles < totalFiles,
        s"layout_catalog_fresh_session: expected DISCOVERY to let the " +
          s"rule skip files ($factFiles of $totalFiles)")
      q.localCheckpoint()
    } finally {
      graft.plans.BloomJoins.uninstall(s)
      graft.plans.BloomJoins.clear()
    }
  }

  register("agg_meta_profile", Some(
    """SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  count(n_chars) AS chars_cnt,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM documents""".stripMargin)) { (s, dir) =>
    // MANIFEST-SERVED aggregates (graft.plans.MetaAgg) — the zero-scan
    // tier: the whole-corpus profile (count / sum / min / max / count(c))
    // over a zone-mapped layout is answered from the `_zonemap` manifest
    // ALONE. The write is the only setup (ZoneMap.write self-describes in
    // _graft_catalog.json); registries and the discovery cache are then
    // cleared, so the rewrite fires purely through DISCOVERY, and the
    // REQUIRE pins that ZERO data files of the layout are read — at
    // 100 TB the dashboard never touches the data. Rows hash-checked
    // against DuckDB over the raw table.
    val path = s"$sinkRoot/agg_meta_profile-${dir.replaceAll("[^0-9.]", "")}"
    Tables.table(s, dir, "documents")
      .repartitionByRange(8, col("doc_id"))
      .write.mode("overwrite").parquet(path)
    graft.sources.ZoneMap.write(s, path, Seq("doc_id", "n_chars"))
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.MetaAgg.install(s)
    try {
      val fired0 = graft.plans.MetaAgg.served.get()
      val q = s.read.parquet(path).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        count(col("n_chars")).as("chars_cnt"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      val dataFiles = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if f.location.rootPaths.exists(p =>
                  p.toString.contains("agg_meta_profile") &&
                    !p.toString.contains("_zonemap")) =>
              f.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(graft.plans.MetaAgg.served.get() > fired0 && dataFiles == 0L,
        s"agg_meta_profile: expected a manifest-only plan " +
          s"(fired=${graft.plans.MetaAgg.served.get() - fired0}, " +
          s"dataFiles=$dataFiles)")
      q.localCheckpoint()
    } finally {
      graft.plans.MetaAgg.uninstall(s)
      graft.plans.BloomJoins.clear()
    }
  }

  register("agg_meta_range", Some(
    """SELECT count(*) AS n_events, count(user_id) AS users_cnt,
      |  min(value) AS value_min, max(value) AS value_max
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-20 00:00:00'""".stripMargin)) {
    (s, dir) =>
      // The covered/boundary split of the manifest-served tier: the feed
      // layout is range-clustered on `ts`, and a plain 12-day-window
      // aggregate serves every INTERIOR file from the manifest while
      // scanning only the boundary files whose zone straddles a window
      // edge (REQUIREd below: fewer data files than the layout holds).
      // The exactness burden sits in the rule: covered files certify
      // zone ⊆ window AND zero nulls; boundary files re-apply the exact
      // filter. At 100 TB this is the daily-dashboard shape — cost
      // follows the two boundary files, not the window width.
      val path = s"$sinkRoot/agg_meta_range-${dir.replaceAll("[^0-9.]", "")}"
      Tables.events(s, dir).repartitionByRange(16, col("ts"))
        .write.mode("overwrite").parquet(path)
      graft.sources.ZoneMap.write(s, path, Seq("ts", "user_id", "value"))
      graft.plans.BloomJoins.clear()
      graft.plans.GraftCatalog.clearCache()
      graft.plans.MetaAgg.install(s)
      try {
        val fired0 = graft.plans.MetaAgg.served.get()
        val q = s.read.parquet(path)
          .where(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
          .agg(count(lit(1)).as("n_events"),
            count(col("user_id")).as("users_cnt"),
            min(col("value")).as("value_min"),
            max(col("value")).as("value_max"))
        val totalFiles = s.read.parquet(s"$path/_zonemap").count()
        val dataFiles = q.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            r.relation match {
              case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                  if f.location.rootPaths.exists(p =>
                    p.toString.contains("agg_meta_range") &&
                      !p.toString.contains("_zonemap")) =>
                f.location.inputFiles.length.toLong
              case _ => 0L
            }
        }.sum
        require(graft.plans.MetaAgg.served.get() > fired0 &&
            dataFiles < totalFiles,
          s"agg_meta_range: expected boundary-only scanning " +
            s"($dataFiles of $totalFiles)")
        q.localCheckpoint()
      } finally {
        graft.plans.MetaAgg.uninstall(s)
        graft.plans.BloomJoins.clear()
      }
  }

  register("agg_meta_grouped", Some(
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM documents GROUP BY 1""".stripMargin)) { (s, dir) =>
    // GROUPED manifest serving: the layout is range-clustered on
    // (lang, doc_id), so most files are HOMOGENEOUS in lang (zone
    // min == max, zero nulls) and the per-language roll-up is served from
    // their manifest rows alone; only the boundary files where two
    // languages meet are scanned, grouped, and folded in. REQUIREs fewer
    // data files than the layout holds — at 100 TB this is the
    // per-source/per-day ingest dashboard on a sorted lake: cost follows
    // cluster boundaries, not corpus size.
    val path = s"$sinkRoot/agg_meta_grouped-${dir.replaceAll("[^0-9.]", "")}"
    Tables.table(s, dir, "documents")
      .repartitionByRange(8, col("lang"), col("doc_id"))
      .write.mode("overwrite").parquet(path)
    graft.sources.ZoneMap.write(s, path, Seq("lang", "n_chars", "doc_id"))
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.MetaAgg.install(s)
    try {
      val fired0 = graft.plans.MetaAgg.served.get()
      val q = s.read.parquet(path).groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      val totalFiles = s.read.parquet(s"$path/_zonemap").count()
      val dataFiles = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if f.location.rootPaths.exists(p =>
                  p.toString.contains("agg_meta_grouped") &&
                    !p.toString.contains("_zonemap")) =>
              f.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(graft.plans.MetaAgg.served.get() > fired0 &&
          dataFiles < totalFiles,
        s"agg_meta_grouped: expected homogeneous files served from the " +
          s"manifest ($dataFiles of $totalFiles)")
      q.localCheckpoint()
    } finally {
      graft.plans.MetaAgg.uninstall(s)
      graft.plans.BloomJoins.clear()
    }
  }

  register("agg_meta_grouped_expr", Some(
    """SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
      |  count(*) AS n_events, count(user_id) AS users_cnt,
      |  min(value) AS value_min, max(value) AS value_max
      |FROM events GROUP BY 1""".stripMargin)) { (s, dir) =>
    // KEY-DERIVED grouped manifest serving — the dashboard shape on a
    // time-clustered lake: GROUP BY date_trunc('week', ts) over a layout
    // range-clustered on ts. date_trunc is on the rule's MONOTONE
    // whitelist, so every file whose ts range falls inside one week
    // (f(min) == f(max)) serves straight from its manifest row; only the
    // files straddling a week boundary are scanned, grouped and folded
    // in. REQUIREs both that the rewrite fired AND that fewer data files
    // than the layout holds were read — at 100 TB the weekly roll-up
    // costs the boundary files, not the weeks between. Rows hash-matched
    // against DuckDB over the raw table (Monday-based weeks in both
    // engines).
    val path =
      s"$sinkRoot/agg_meta_grouped_expr-${dir.replaceAll("[^0-9.]", "")}"
    Tables.events(s, dir).repartitionByRange(16, col("ts"))
      .write.mode("overwrite").parquet(path)
    graft.sources.ZoneMap.write(s, path, Seq("ts", "user_id", "value"))
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.MetaAgg.install(s)
    try {
      val fired0 = graft.plans.MetaAgg.served.get()
      val q = s.read.parquet(path)
        .groupBy(to_date(date_trunc("week", col("ts"))).as("wk"))
        .agg(count(lit(1)).as("n_events"),
          count(col("user_id")).as("users_cnt"),
          min(col("value")).as("value_min"),
          max(col("value")).as("value_max"))
      val totalFiles = s.read.parquet(s"$path/_zonemap").count()
      val dataFiles = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if f.location.rootPaths.exists(p =>
                  p.toString.contains("agg_meta_grouped_expr") &&
                    !p.toString.contains("_zonemap")) =>
              f.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(graft.plans.MetaAgg.served.get() > fired0 &&
          dataFiles < totalFiles,
        s"agg_meta_grouped_expr: expected week-homogeneous files served " +
          s"from the manifest ($dataFiles of $totalFiles)")
      q.localCheckpoint()
    } finally {
      graft.plans.MetaAgg.uninstall(s)
      graft.plans.BloomJoins.clear()
    }
  }

  register("agg_meta_distinct", Some(
    """SELECT DISTINCT lang FROM documents""".stripMargin)) { (s, dir) =>
    // DISTINCT through the manifest tier: on a lang-clustered layout a
    // file HOMOGENEOUS in lang contributes its one value straight from
    // the manifest — "which languages exist" costs the manifest plus the
    // boundary files where two languages meet. The count(DISTINCT lang)
    // sibling runs through the same legs and is REQUIREd to serve too;
    // both REQUIRE fewer data files than the layout holds. At 100 TB
    // this is the catalog-discovery question (which days / sources /
    // languages does this lake hold) answered without touching data.
    val path = s"$sinkRoot/agg_meta_distinct-${dir.replaceAll("[^0-9.]", "")}"
    Tables.table(s, dir, "documents")
      .repartitionByRange(16, col("lang"), col("doc_id"))
      .write.mode("overwrite").parquet(path)
    graft.sources.ZoneMap.write(s, path, Seq("lang"))
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.MetaAgg.install(s)
    try {
      val fired0 = graft.plans.MetaAgg.served.get()
      val qd = s.read.parquet(path).select(col("lang")).distinct()
      val qc = s.read.parquet(path)
        .agg(countDistinct(col("lang")).as("n_langs"))
      val nLangs = qc.collect().head.getLong(0)
      val totalFiles = s.read.parquet(s"$path/_zonemap").count()
      val dataFiles = qd.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if f.location.rootPaths.exists(p =>
                  p.toString.contains("agg_meta_distinct") &&
                    !p.toString.contains("_zonemap")) =>
              f.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(graft.plans.MetaAgg.served.get() - fired0 >= 2 &&
          dataFiles < totalFiles,
        s"agg_meta_distinct: expected distinct values served from the " +
          s"manifest ($dataFiles of $totalFiles)")
      require(nLangs == qd.count(),
        "count(DISTINCT lang) must agree with the distinct row set")
      qd.localCheckpoint()
    } finally {
      graft.plans.MetaAgg.uninstall(s)
      graft.plans.BloomJoins.clear()
    }
  }

  register("agg_meta_join_dim", Some(
    """SELECT count(*) AS n_events, count(user_id) AS users_cnt,
      |  min(value) AS v_min, max(value) AS v_max
      |FROM events e JOIN (
      |  SELECT DISTINCT event_type FROM events
      |  WHERE event_type IN ('purchase', 'signup')) d
      |ON e.event_type = d.event_type""".stripMargin)) { (s, dir) =>
    // MANIFEST-SERVED aggregates UNDER A DIM-DRIVEN JOIN — the
    // dashboard-with-a-dimension shape: the fact layout is clustered by
    // the join key (event_type), so most files are KEY-HOMOGENEOUS and
    // their manifest rows join the dim AS WHOLE FILES (multiplicity
    // included); only the files where two types meet scan raw and replay
    // the original join. The dim is an arbitrary deterministic sub-plan
    // (here a filtered DISTINCT over the raw feed — it executes in both
    // legs). REQUIREs the dim-join rewrite fired AND fewer fact files
    // than the layout holds were read. At 100 TB: "count the events of
    // the dim-selected types" costs the dim plus the type-boundary
    // files, not a fact scan. Rows hash-matched against DuckDB replaying
    // the same join on the raw tables.
    val path =
      s"$sinkRoot/agg_meta_join_dim-${dir.replaceAll("[^0-9.]", "")}"
    Tables.events(s, dir)
      .repartitionByRange(8, col("event_type"), col("event_id"))
      .write.mode("overwrite").parquet(path)
    graft.sources.ZoneMap.write(s, path,
      Seq("event_type", "user_id", "value"))
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.MetaAgg.install(s)
    try {
      val fired0 = graft.plans.MetaAgg.servedJoin.get()
      val dim = Tables.events(s, dir)
        .where(col("event_type").isin("purchase", "signup"))
        .select(col("event_type").as("d_type")).distinct()
      val f = s.read.parquet(path)
      val q = f.join(dim, f("event_type") === dim("d_type"))
        .agg(count(lit(1)).as("n_events"),
          count(col("user_id")).as("users_cnt"),
          min(col("value")).as("v_min"),
          max(col("value")).as("v_max"))
      val totalFiles = s.read.parquet(s"$path/_zonemap").count()
      val dataFiles = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case fr: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if fr.location.rootPaths.exists(p =>
                  p.toString.contains("agg_meta_join_dim") &&
                    !p.toString.contains("_zonemap")) =>
              fr.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(graft.plans.MetaAgg.servedJoin.get() > fired0 &&
          dataFiles < totalFiles,
        s"agg_meta_join_dim: expected key-homogeneous files served under " +
          s"the join ($dataFiles of $totalFiles)\n" +
          q.queryExecution.optimizedPlan.toString)
      q.localCheckpoint()
    } finally {
      graft.plans.MetaAgg.uninstall(s)
      graft.plans.BloomJoins.clear()
    }
  }

  register("agg_meta_sketch_profile", None) { (s, dir) =>
    // The manifest's SKETCH tier: ZoneMap.write(sketchCols=…) records one
    // mergeable KLL (quantiles) + HLL (distincts) blob per file per
    // column beside the zones, and metaApproxProfile answers the
    // approx-profile dashboard (p50/p99 of value, distinct users) from
    // the manifest ALONE — zero data files, at any layout size; cost
    // follows file count. No DuckDB oracle (sketch estimates are
    // engine-specific; a rewrite of the built-in approx functions would
    // CHANGE answers, so this is an explicit API — see the scaladoc);
    // the REQUIREs below gate the contracts instead, against exact
    // answers computed from the raw feed: KLL rank error ≤ 2·1.65%
    // per quantile, HLL relative error ≤ 5% (lgK=12), n_rows exact.
    // ZoneMapSpec pins the exact regime (order statistics, equality).
    val path =
      s"$sinkRoot/agg_meta_sketch_profile-${dir.replaceAll("[^0-9.]", "")}"
    val ev = Tables.events(s, dir)
    ev.repartitionByRange(16, col("ts"))
      .write.mode("overwrite").parquet(path)
    graft.sources.ZoneMap.write(s, path, Seq("ts", "value", "user_id"),
      updateCatalog = false, sketchCols = Seq("value", "user_id"))
    val prof = graft.sources.ZoneMap.metaApproxProfile(
      s, path, Seq("value", "user_id"), Seq(0.5, 0.99)).head()
    val n = prof.getAs[Long]("n_rows")
    val p50 = prof.getAs[Double]("value_p50")
    val p99 = prof.getAs[Double]("value_p99")
    val du = prof.getAs[Long]("user_id_approx_distinct")
    val exact = ev.agg(count(lit(1)).as("n"),
      countDistinct(col("user_id")).as("du"),
      (count(when(col("value") <= p50, 1)) / count(col("value")))
        .as("rank50"),
      (count(when(col("value") <= p99, 1)) / count(col("value")))
        .as("rank99")).head()
    require(n == exact.getAs[Long]("n"),
      "n_rows rides the exact zone tier")
    require(math.abs(exact.getAs[Double]("rank50") - 0.5) <= 0.033 &&
        math.abs(exact.getAs[Double]("rank99") - 0.99) <= 0.033,
      s"KLL rank contract violated: rank(p50)=${exact.getAs[Double]("rank50")}" +
        s", rank(p99)=${exact.getAs[Double]("rank99")}")
    val exactDu = exact.getAs[Long]("du")
    require(math.abs(du - exactDu).toDouble / exactDu <= 0.05,
      s"HLL estimate off: $du vs $exactDu")
    // the deliverable row: the manifest-served profile beside the exact
    // yardsticks it was gated against
    import s.implicits._
    Seq((n, p50, p99, du, exactDu))
      .toDF("n_rows", "value_p50", "value_p99",
        "approx_users", "exact_users")
  }

  register("agg_mv_rewrite_catalog", Some(
    """SELECT lang, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  count(*) AS n_docs
      |FROM documents GROUP BY 1""".stripMargin)) { (s, dir) =>
    // The summary tier's SELF-DESCRIPTION loop, end-to-end — the
    // layout_catalog_fresh_session gate one tier up: the maintenance fold
    // ITSELF (IncrementalAgg.applyDelta describeView) registers the view
    // and merge-writes _graft_catalog.json beside the BASE table; every
    // registry and the discovery cache are then cleared (a brand-new
    // session's state), and the plain GROUP BY below must re-plan onto
    // the summary purely through catalog DISCOVERY (REQUIREd below) —
    // rows hashed against DuckDB over the raw table. Maintenance,
    // self-description, discovery and rewrite under one oracle; at
    // 100 TB this is "the dashboard is fast in every session, nobody
    // ever called register()".
    val tag = dir.replaceAll("[^0-9.]", "")
    val baseCopy = s"$sinkRoot/agg_mv_catalog_base-$tag"
    val path = s"$sinkRoot/agg_mv_catalog_state-$tag"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    // a base WE own: the catalog lives beside the base table, and the
    // driver's testdata is read-only — same rows, so the DuckDB oracle
    // over the raw `documents` still matches
    Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(baseCopy)
    val view = graft.plans.SummaryViews.View(
      baseCopy, path, Seq("lang", "source"), Set("n_chars"), Some("n_docs"))
    val deltas = s.read.parquet(baseCopy).select(col("lang"), col("source"),
      col("n_chars").cast("long").as("n_chars"), lit(1L).as("n_docs"),
      pmod(col("doc_id"), lit(3)).as("__chunk"))
    (0L to 2L).foreach { i =>
      graft.streaming.IncrementalAgg.applyDelta(s, path,
        deltas.filter(col("__chunk") === i).drop("__chunk"),
        keyCols = Seq("lang", "source"), sumCols = Seq("n_chars", "n_docs"),
        nBuckets = 8, batchId = i, describeView = Some(view))
    }
    // the fresh-session state: registries and discovery memory emptied
    graft.plans.SummaryViews.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.SummaryViews.install(s)
    try {
      val q = s.read.parquet(baseCopy)
        .groupBy("lang")
        .agg(sum(col("n_chars")).as("sum_chars"),
          count(lit(1)).as("n_docs"))
      val readsState = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.exists(p =>
                p.toString.contains("agg_mv_catalog_state") &&
                  p.toString.endsWith("/state"))
            case _ => false
          }
      }.exists(identity)
      require(readsState,
        "agg_mv_rewrite_catalog: expected DISCOVERY of the fold-written " +
          "catalog to route the aggregate onto the summary")
      q.localCheckpoint()
    } finally {
      graft.plans.SummaryViews.uninstall(s)
      graft.plans.SummaryViews.clear()
    }
  }

  register("layout_hilbert_events", Some(
    s"""WITH zin AS (
       |  SELECT (user_id & 255) AS a,
       |    (CAST(floor(value) AS BIGINT) & 255) AS b
       |  FROM events
       |  WHERE user_id IS NOT NULL AND value IS NOT NULL),
       |${graft.sources.ZOrder.hilbertOracleCtes("a", "b", 8, "FROM zin")}
       |SELECT d >> 4 AS h_bucket, count(*) AS n_events
       |FROM h8 GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Hilbert-curve clustering index — the locality-SUPERIOR sibling of
    // layout_zorder_events: consecutive Hilbert indexes are always
    // grid-adjacent (no Morton diagonal jumps across power-of-2 seams),
    // so contiguous index ranges cover compact rectangles and both
    // dimensions' file/row-group stats stay tighter (ZOrderSpec measures
    // the adjacency property and the bijection; the bucket histogram
    // here puts the MAPPING itself — 8 unrolled rotate/accumulate
    // levels — under the DuckDB oracle, CTE stage by CTE stage).
    // NULL coords are filtered on BOTH sides: the native expression is
    // null-safe (NULL in → NULL out) but the CTE ladder's CASE WHEN treats
    // NULL bit-tests as false and would collapse NULLs to concrete d
    // values — a latent oracle mismatch if the fixture ever carries them.
    Tables.events(s, dir)
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(graft.sources.ZOrder.hilbert2(
        col("user_id").bitwiseAND(lit(255L)),
        floor(col("value")).cast("long").bitwiseAND(lit(255L)),
        order = 8).as("h"))
      .groupBy(shiftright(col("h"), 4).as("h_bucket"))
      .agg(count(lit(1)).as("n_events"))
  }

  register("layout_zorder_events", Some(
    """WITH zin AS (
      |  SELECT (user_id & 65535) AS za,
      |    (CAST(floor(value) AS BIGINT) & 65535) AS zb
      |  FROM events),
      |s1 AS (SELECT ((za | (za << 8)) & 16711935) AS a1,
      |              ((zb | (zb << 8)) & 16711935) AS b1 FROM zin),
      |s2 AS (SELECT ((a1 | (a1 << 4)) & 252645135) AS a2,
      |              ((b1 | (b1 << 4)) & 252645135) AS b2 FROM s1),
      |s3 AS (SELECT ((a2 | (a2 << 2)) & 858993459) AS a3,
      |              ((b2 | (b2 << 2)) & 858993459) AS b3 FROM s2),
      |s4 AS (SELECT ((a3 | (a3 << 1)) & 1431655765) AS a4,
      |              ((b3 | (b3 << 1)) & 1431655765) AS b4 FROM s3)
      |SELECT (a4 | (b4 << 1)) >> 10 AS z_bucket, count(*) AS n_events
      |FROM s4 GROUP BY 1""".stripMargin)) { (s, dir) =>
    // The z-value mapping under the oracle: the Morton spread/interleave is
    // plain bitwise arithmetic, so DuckDB replays it step-for-step (staged
    // CTEs mirror the expression ladder). The LAYOUT benefit — narrow
    // row-group stats on BOTH dimensions — is proven in ZOrderSpec from
    // parquet footers (4/16 groups touched for a value band vs 14/14 under
    // a single-dimension sort).
    Tables.events(s, dir)
      .select(graft.sources.ZOrder.zValue2(
        col("user_id"), floor(col("value")).cast("long")).as("z"))
      .groupBy(shiftright(col("z"), 10).as("z_bucket"))
      .agg(count(lit(1)).as("n_events"))
  }

  register("sink_bucketed_colocated_join", Some(
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4)))
      |    AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Bucketed-layout lifecycle: orders and lineitem are REWRITTEN
    // co-bucketed on orderkey (the write pays the one shuffle), then the
    // join between the bucketed tables plans bucket-local — the ONLY
    // exchange in the read plan is the final 5-group aggregate, asserted
    // by PlanAuditSpec. This is the warehouse layout decision that deletes
    // the per-query fact-to-fact shuffle at 100 TB; the oracle verifies
    // the bucketed round-trip loses no rows and joins identically.
    val tag = dir.replaceAll("[^0-9]", "")
    val (ot, lt) = (s"graft_orders_b_$tag", s"graft_lineitem_b_$tag")
    graft.sources.Bucketing.writeBucketed(
      Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
      ot, "o_orderkey", 16, s"$sinkRoot/bucketed-orders-$tag")
    graft.sources.Bucketing.writeBucketed(
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount"),
      lt, "l_orderkey", 16, s"$sinkRoot/bucketed-lineitem-$tag")
    graft.sources.Bucketing.colocatedJoin(s, ot, "o_orderkey", lt, "l_orderkey")
      .groupBy("o_orderpriority")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  // ==========================================================================
  // Streaming runtime (SURVEY §7.2 step 4): the SAME event feed pushed
  // through readStream → CdcPipeline → foreachBatch destination under
  // Trigger.AvailableNow, then read back — batch/stream unification means
  // the DuckDB batch oracle verifies the streaming run. This is the
  // flagship lifecycle of the reference (pipeline.rs:1101-1282) under the
  // correctness gate.
  // ==========================================================================

  /** Stage the envelope feed as JSONL source files. The feed is a pure
    * function of the fixture, so a COMPLETE prior staging is reused — the
    * bench then times the PIPELINE, not the test harness re-serializing its
    * own input on every invocation. Returns true when this call actually
    * staged; the caller then appends any sentinel rows and MUST finish with
    * [[markStaged]]. Reuse is gated on the dedicated _STAGED marker (written
    * last), NOT on the json writer's own _SUCCESS — a crash between the
    * source write and the sentinel append would otherwise leave a poisoned
    * directory that every later run happily reuses, sentinel-less. */
  private def stageStreamSource(s: SparkSession, dir: String, path: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/_STAGED"))) false
    else {
      CdcEnvelope.fromEvents(Tables.events(s, dir))
        .drop("update_description")
        .repartition(4).write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(path)
      true
    }
  }

  /** Seal a staging directory: written only after source + sentinels are all
    * on disk, so a half-staged directory is re-staged, never reused. */
  private def markStaged(s: SparkSession, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$path/_STAGED"), true).close()
  }

  /** ONE shared staged copy of the plain envelope feed per sf dir: every
    * entry whose source is the feed VERBATIM (no appended sentinel rows)
    * reads this directory instead of staging its own identical copy —
    * the first entry of a cold run stages once, the other four reuse it,
    * trimming pure fixed cost from every bench pair. Entries that append
    * sentinels keep private dirs (their content differs). Read-only after
    * [[markStaged]] seals it, so sharing across sequential entries (and
    * their streaming checkpoints, which key on their OWN checkpoint dirs)
    * is safe. */
  private def sharedStreamSource(s: SparkSession, dir: String): String = {
    val src = s"$sinkRoot/stream-source-shared-${dir.replaceAll("[^0-9.]", "")}"
    if (stageStreamSource(s, dir, src)) markStaged(s, src)
    src
  }

  private val streamDDL =
    "operation string, database string, collection string, " +
      "cluster_time timestamp, document_key string, full_document string, " +
      "resume_token string, event_id long, user_id long, value double"

  register("stream_pipeline_roundtrip", Some(
    """SELECT 'c_' || CAST(user_id % 8 AS VARCHAR) AS collection,
      |  count(*) AS n_events, count(DISTINCT event_id) AS n_ids,
      |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_type IN ('purchase','signup')
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    import graft.streaming._
    val tag = dir.replaceAll("[^0-9.]", "")
    val base = s"$sinkRoot/stream-pipeline-$tag"
    val src = sharedStreamSource(s, dir)
    // fresh checkpoint/output per invocation => deterministic full replay
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    Seq("checkpoint", "out").foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/$d"), true))
    val dest = new FileDestination(s"$base/out", graft.sources.OutFormat.Jsonl,
      graft.sources.OutCompression.Gzip, graft.operators.KeyStrategy.CollectionBased)
    val cfg = PipelineConfig(sourceDir = src, schemaDDL = streamDDL,
      checkpointDir = s"$base/checkpoint", queryName = s"stream-rt-$tag",
      triggerInterval = None, // AvailableNow: drain-and-stop
      transform = df => graft.operators.Filters
        .byOperations(df, Seq("purchase", "signup")))
    val q = CdcPipeline.start(s, cfg, dest)
    q.awaitTermination(300000)
    dest.readBack(s, Some(streamDDL))
      .groupBy("collection")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_id")).as("n_ids"),
        dsum(col("value")).as("sum_value"))
  }

  register("stream_catalog_pointlookup", Some(
    """SELECT event_id, event_type AS operation, user_id
      |FROM events WHERE event_id IN (1, 2, 3, 4, 5)
      |ORDER BY event_id""".stripMargin)) { (s, dir) =>
    import graft.streaming._
    // The FULL self-describing-layout loop under the oracle: the feed
    // streams through CdcPipeline into a parquet FileDestination that
    // maintains a bloom index per batch AND writes the layout catalog at
    // first batch; every in-memory registry is then cleared (the state a
    // brand-new session starts from) and a plain IN-query over the sink's
    // output must file-skip purely through catalog DISCOVERY (REQUIREd) —
    // rows hashed against DuckDB over the ORIGINAL events table, so
    // exactly-once delivery, index maintenance, catalog persistence and
    // discovery-driven pruning all sit under one gate.
    val tag = dir.replaceAll("[^0-9.]", "")
    val base = s"$sinkRoot/stream-catalog-$tag"
    val src = sharedStreamSource(s, dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    Seq("checkpoint", "out").foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/$d"), true))
    val out = s"$base/out"
    val dest = new FileDestination(out, graft.sources.OutFormat.Parquet,
      graft.sources.OutCompression.Snappy,
      graft.operators.KeyStrategy.CollectionBased,
      bloomIndexCols = Seq("event_id"),
      bloomExpectedItemsPerFile = 200000)
    val cfg = PipelineConfig(sourceDir = src, schemaDDL = streamDDL,
      checkpointDir = s"$base/checkpoint", queryName = s"stream-cat-$tag",
      triggerInterval = None) // AvailableNow: drain-and-stop
    val q = CdcPipeline.start(s, cfg, dest)
    q.awaitTermination(300000)
    // the fresh-session state: registries + discovery memory emptied —
    // only the catalog the SINK wrote can make the query prune
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.BloomJoins.install(s)
    try {
      val qq = s.read.parquet(out)
        .where(col("event_id").isin(1L, 2L, 3L, 4L, 5L))
        .select(col("event_id"), col("operation"), col("user_id"))
        .orderBy("event_id")
      val totalFiles = s.read.parquet(s"$out/_bloomindex").count()
      val factFiles = qq.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if f.location.rootPaths.exists(_.toString.contains(
                  "stream-catalog")) =>
              f.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(factFiles > 0 && factFiles < totalFiles,
        s"stream_catalog_pointlookup: the sink-written catalog must let a " +
          s"fresh session prune ($factFiles of $totalFiles files)")
      qq.localCheckpoint()
    } finally {
      graft.plans.BloomJoins.uninstall(s)
      graft.plans.BloomJoins.clear()
      graft.plans.GraftCatalog.clearCache()
    }
  }

  register("stream_windowed_counts", Some(
    """SELECT date_trunc('hour', ts) AS window_start,
      |  event_type AS operation, count(*) AS n_events
      |FROM events GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    import graft.streaming._
    val tag = dir.replaceAll("[^0-9.]", "")
    val base = s"$sinkRoot/stream-window-$tag"
    val src = s"$base/source"
    val staged = stageStreamSource(s, dir, src)
    // Event-time tumbling-window aggregation ON THE STREAM (A2 in its
    // native trigger form), in APPEND mode through a FileDestination —
    // the shape that scales: only watermark-closed windows leave the
    // state store, each exactly once, and nothing accumulates on the
    // driver (the previous complete-mode memory sink re-emitted the whole
    // result every batch and collected it driver-side).
    //
    // Append mode only emits a window once the watermark passes its end,
    // so a drained bounded source would otherwise hold the LAST window in
    // state forever. One sentinel event 2 hours past the newest real event
    // advances the watermark over every real window. The sentinel is NOT
    // filtered out in the stream: a pre-aggregation filter on `operation`
    // gets pushed below the EventTimeWatermark node by Catalyst, dropping
    // the sentinel before its timestamp is observed (verified: the final
    // real window then never closes). Instead the sentinel self-excludes —
    // its own window's end lies beyond the final watermark, so it stays in
    // state and is never emitted; the read-back filter is belt-and-braces.
    val sentinel = "__watermark_sentinel__"
    if (staged) {
      val maxTs = Tables.events(s, dir)
        .agg(max(col("ts")).cast("long")).head().getLong(0)
      s.range(1).select(
          lit(sentinel).as("operation"),
          (lit(maxTs) + lit(7200L)).cast("timestamp").as("cluster_time"))
        .write.mode("append")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(src)
      markStaged(s, src) // seal only once source AND sentinel are on disk
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    Seq("checkpoint", "out").foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/$d"), true))
    val dest = new FileDestination(s"$base/out", graft.sources.OutFormat.Jsonl,
      graft.sources.OutCompression.Gzip, graft.operators.KeyStrategy.Flat)
    val cfg = PipelineConfig(sourceDir = src, schemaDDL = streamDDL,
      checkpointDir = s"$base/checkpoint", queryName = s"stream-win-$tag",
      triggerInterval = None,
      // keyed state at this feed volume is MBs: 8 fat state stores beat 32
      // per-trigger store open/commit cycles (see PipelineConfig scaladoc)
      statePartitions = Some(8), // AvailableNow: drain, then evict closed state
      transform = df => df
        .withWatermark("cluster_time", "0 seconds")
        .groupBy(window(col("cluster_time"), "1 hour").as("w"), col("operation"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").as("window_start"), col("operation"),
          col("n_events")))
    val q = CdcPipeline.start(s, cfg, dest)
    q.awaitTermination(300000)
    dest.readBack(s,
        Some("window_start timestamp, operation string, n_events long"))
      .filter(col("operation") =!= sentinel)
      .select(col("window_start"), col("operation"), col("n_events"))
  }

  register("stream_interval_join", Some(
    """SELECT v.user_id, v.event_id AS view_event, p.event_id AS purchase_event,
      |  CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS secs_to_purchase
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON v.user_id = p.user_id
      | AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 30 MINUTE""".stripMargin)) { (s, dir) =>
    import graft.streaming._
    // STREAM-STREAM interval join (click-to-purchase attribution): both
    // sides of the SAME change feed, watermarked, joined on user within a
    // 30-minute event-time band. The interval bound + two watermarks is
    // what bounds join state on an unbounded stream — the engine evicts a
    // buffered row once the watermark clears its reachable join range, so
    // state is O(events within the band), not O(stream). Inner matches
    // emit as they arrive (no sentinel needed; only outer-null emission
    // waits on the watermark). The batch DuckDB range-join oracle proves
    // stream==batch on the real feed; StreamingSpec proves the same shape
    // on a hand-built fixture with a known answer.
    // `secs_to_purchase` = epoch-second floors on both engines: Spark's
    // cast(ts as long) and DuckDB's date_diff('second') both count whole
    // seconds (verified identical over every matched pair).
    val tag = dir.replaceAll("[^0-9.]", "")
    val base = s"$sinkRoot/stream-ssjoin-$tag"
    val src = sharedStreamSource(s, dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    Seq("checkpoint", "out").foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/$d"), true))
    val dest = new FileDestination(s"$base/out", graft.sources.OutFormat.Jsonl,
      graft.sources.OutCompression.Gzip, graft.operators.KeyStrategy.Flat)
    val cfg = PipelineConfig(sourceDir = src, schemaDDL = streamDDL,
      checkpointDir = s"$base/checkpoint", queryName = s"stream-ssj-$tag",
      triggerInterval = None,
      // keyed state at this feed volume is MBs: 8 fat state stores beat 32
      // per-trigger store open/commit cycles (see PipelineConfig scaladoc)
      statePartitions = Some(8), // AvailableNow: drain-and-stop
      transform = df => {
        val views = df.filter(col("operation") === "view")
          .select(col("user_id").as("v_user"), col("event_id").as("view_event"),
            col("cluster_time").as("view_time"))
          .withWatermark("view_time", "0 seconds")
        val buys = df.filter(col("operation") === "purchase")
          .select(col("user_id").as("p_user"),
            col("event_id").as("purchase_event"),
            col("cluster_time").as("purchase_time"))
          .withWatermark("purchase_time", "0 seconds")
        views.join(buys, expr(
          """v_user = p_user AND
            |purchase_time >= view_time AND
            |purchase_time < view_time + INTERVAL 30 MINUTES""".stripMargin))
          .select(col("v_user").as("user_id"), col("view_event"),
            col("purchase_event"),
            (col("purchase_time").cast("long") - col("view_time").cast("long"))
              .as("secs_to_purchase"))
      })
    val q = CdcPipeline.start(s, cfg, dest)
    q.awaitTermination(300000)
    dest.readBack(s, Some("user_id long, view_event long, " +
        "purchase_event long, secs_to_purchase long"))
      .select(col("user_id"), col("view_event"), col("purchase_event"),
        col("secs_to_purchase"))
  }

  register("stream_drift_psi", Some(driftPsiOracle)) { (s, dir) =>
    // STREAMING drift monitor — quality_drift_psi's incremental leg: the
    // current-side bucket counts accumulate in the STATE STORE across
    // micro-batches (complete-mode streaming aggregation over the melted
    // (col, bucket) pairs from Quality.psiMelted — a pure narrow
    // projection, so it drops onto the stream unchanged), under a
    // binning model FROZEN from the batch reference (psiBounds, the
    // monitor's published recipe). Complete mode + a memory sink is the
    // CORRECT shape here, not a scale compromise: the streamed result IS
    // the k·(buckets+2)-row count table — model-sized by construction —
    // where the data-sized stream entries rightly use append-mode file
    // sinks. Two triggers (maxFilesPerTrigger=2 over 4 staged files)
    // prove cross-batch accumulation; the tiny PSI finisher runs
    // batch-side on the final counts. Oracle = the quality_drift_psi SQL
    // VERBATIM — the monitor's reading after draining the feed must
    // equal the batch reading exactly.
    import org.apache.spark.sql.streaming.Trigger
    val tag = dir.replaceAll("[^0-9.]", "")
    val base = s"$sinkRoot/stream-drift-$tag"
    val src = sharedStreamSource(s, dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/checkpoint"), true)
    val cols = Seq("value", "user_id")
    val events = Tables.events(s, dir)
    val bounds = graft.operators.Quality.psiBounds(events, cols)
    val refCounts = graft.operators.Quality
      .psiMelted(events, cols, bounds, 10)
      .groupBy(col("col_name"), col("bucket")).agg(count(lit(1)).as("n"))
    val stream = s.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(streamDDL))
      .option("maxFilesPerTrigger", "2")
      .json(src)
      .filter(col("operation") === "purchase")
    val curCounts = graft.operators.Quality
      .psiMelted(stream, cols, bounds, 10)
      .groupBy(col("col_name"), col("bucket")).agg(count(lit(1)).as("n"))
    val qname = s"stream_drift_psi_${tag.replace(".", "_")}"
    val q = curCounts.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qname)
      .option("checkpointLocation", s"$base/checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    graft.operators.Quality.psiFromCounts(refCounts, s.table(qname))
      .orderBy(col("col_name"))
  }

  register("stream_interval_join_outer", Some(
    """SELECT v.user_id, v.event_id AS view_event, p.event_id AS purchase_event
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON v.user_id = p.user_id
      | AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 30 MINUTE""".stripMargin)) { (s, dir) =>
    import graft.streaming._
    // LEFT-OUTER stream-stream interval join: every view, matched or not.
    // Outer null rows can only emit once the watermark proves no match can
    // still arrive, so a drained bounded feed needs the sentinel trick —
    // and unlike the aggregation entries it needs one sentinel PER SIDE:
    // the per-side operation filters are pushed below each
    // EventTimeWatermark node, so a view-only sentinel would advance the
    // view watermark while the purchase side (and with it the GLOBAL
    // watermark = min of both) stayed at the real feed's edge, holding
    // every trailing unmatched view in state forever. Both sentinels carry
    // user_id = -1: the view sentinel's own emission window sits past the
    // final watermark (self-excluding), the purchase sentinel matches
    // nothing, and the read-back filter is belt-and-braces.
    val tag = dir.replaceAll("[^0-9.]", "")
    val base = s"$sinkRoot/stream-ssjoin-outer-$tag"
    val src = s"$base/source"
    if (stageStreamSource(s, dir, src)) {
      val maxTs = Tables.events(s, dir)
        .agg(max(col("ts")).cast("long")).head().getLong(0)
      Seq("view", "purchase").foreach { op =>
        s.range(1).select(
            lit(op).as("operation"), lit(-1L).as("user_id"),
            lit(-1L).as("event_id"),
            (lit(maxTs) + lit(7200L)).cast("timestamp").as("cluster_time"))
          .write.mode("append")
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(src)
      }
      markStaged(s, src)
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    Seq("checkpoint", "out").foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/$d"), true))
    val dest = new FileDestination(s"$base/out", graft.sources.OutFormat.Jsonl,
      graft.sources.OutCompression.Gzip, graft.operators.KeyStrategy.Flat)
    val cfg = PipelineConfig(sourceDir = src, schemaDDL = streamDDL,
      checkpointDir = s"$base/checkpoint", queryName = s"stream-ssjo-$tag",
      triggerInterval = None,
      // keyed state at this feed volume is MBs: 8 fat state stores beat 32
      // per-trigger store open/commit cycles (see PipelineConfig scaladoc)
      statePartitions = Some(8),
      transform = df => {
        val views = df.filter(col("operation") === "view")
          .select(col("user_id").as("v_user"), col("event_id").as("view_event"),
            col("cluster_time").as("view_time"))
          .withWatermark("view_time", "0 seconds")
        val buys = df.filter(col("operation") === "purchase")
          .select(col("user_id").as("p_user"),
            col("event_id").as("purchase_event"),
            col("cluster_time").as("purchase_time"))
          .withWatermark("purchase_time", "0 seconds")
        views.join(buys, expr(
          """v_user = p_user AND
            |purchase_time >= view_time AND
            |purchase_time < view_time + INTERVAL 30 MINUTES""".stripMargin),
          "left_outer")
          .select(col("v_user").as("user_id"), col("view_event"),
            col("purchase_event"))
      })
    val q = CdcPipeline.start(s, cfg, dest)
    q.awaitTermination(300000)
    dest.readBack(s,
        Some("user_id long, view_event long, purchase_event long"))
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("view_event"), col("purchase_event"))
  }

  register("stream_sessionize", Some(
    """WITH d AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |i AS (SELECT *, SUM(brk) OVER
      |  (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS UNBOUNDED PRECEDING) AS sid FROM d)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 10 MINUTE AS session_end,
      |  count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      |FROM i GROUP BY user_id, sid""".stripMargin)) { (s, dir) =>
    import graft.streaming._
    // Sessionization ON THE STREAM: the same session_window aggregation as
    // the batch agg_session_windows entry (same gaps-and-islands oracle,
    // timestamp for timestamp) run through the streaming runtime in append
    // mode — sessions leave the state store exactly once, when the
    // watermark passes their end. State is keyed (user, open session),
    // spilled to RocksDB, so memory is bounded by concurrently-OPEN
    // sessions, not total history — the shape that sessionizes an
    // unbounded 100 TB feed. One sentinel (user_id = -1) two hours past
    // the newest real event closes every real session; its own session
    // end sits past the final watermark, so it stays in state unemitted.
    val tag = dir.replaceAll("[^0-9.]", "")
    val base = s"$sinkRoot/stream-session-$tag"
    val src = s"$base/source"
    if (stageStreamSource(s, dir, src)) {
      val maxTs = Tables.events(s, dir)
        .agg(max(col("ts")).cast("long")).head().getLong(0)
      s.range(1).select(
          lit("__sentinel__").as("operation"), lit(-1L).as("user_id"),
          (lit(maxTs) + lit(7200L)).cast("timestamp").as("cluster_time"))
        .write.mode("append")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(src)
      markStaged(s, src)
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    Seq("checkpoint", "out").foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/$d"), true))
    val dest = new FileDestination(s"$base/out", graft.sources.OutFormat.Jsonl,
      graft.sources.OutCompression.Gzip, graft.operators.KeyStrategy.Flat)
    val cfg = PipelineConfig(sourceDir = src, schemaDDL = streamDDL,
      checkpointDir = s"$base/checkpoint", queryName = s"stream-sess-$tag",
      triggerInterval = None,
      // keyed state at this feed volume is MBs: 8 fat state stores beat 32
      // per-trigger store open/commit cycles (see PipelineConfig scaladoc)
      statePartitions = Some(8),
      transform = df => df
        .withWatermark("cluster_time", "0 seconds")
        .groupBy(col("user_id"),
          session_window(col("cluster_time"), "10 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"), col("sum_value")))
    val q = CdcPipeline.start(s, cfg, dest)
    q.awaitTermination(300000)
    dest.readBack(s, Some("user_id long, session_start timestamp, " +
        "session_end timestamp, n_events long, sum_value double"))
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
  }

  register("stream_enrich_broadcast", Some(
    """SELECT c.c_mktsegment AS mktsegment, count(*) AS n_events,
      |  count(DISTINCT e.user_id) AS n_users,
      |  CAST(SUM(CAST(e.value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    import graft.streaming._
    // STREAM-STATIC enrichment (§2.5 in its streaming trigger form): the
    // third join mode the engine distinguishes — the dimension side is a
    // plain batch DataFrame broadcast into every micro-batch, no state
    // store at all (unlike stream-stream, nothing is buffered: the static
    // side is re-resolvable per trigger, which is also what picks up
    // slowly-changing dim reloads between triggers at production scale).
    // Enriched rows land append-mode; the aggregation runs on the batch
    // read-back, same as stream_pipeline_roundtrip. Oracle = the batch
    // cdc_enrich_join SQL — streaming enrichment must match batch
    // enrichment row for row.
    val tag = dir.replaceAll("[^0-9.]", "")
    val base = s"$sinkRoot/stream-enrich-$tag"
    val src = sharedStreamSource(s, dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    Seq("checkpoint", "out").foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/$d"), true))
    val dim = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
    val dest = new FileDestination(s"$base/out", graft.sources.OutFormat.Jsonl,
      graft.sources.OutCompression.Gzip, graft.operators.KeyStrategy.Flat)
    val cfg = PipelineConfig(sourceDir = src, schemaDDL = streamDDL,
      checkpointDir = s"$base/checkpoint", queryName = s"stream-enr-$tag",
      triggerInterval = None,
      transform = df => graft.operators.Enrichment
        .enrich(df, dim, col("user_id") === col("c_custkey"))
        .select(col("c_mktsegment").as("mktsegment"), col("user_id"),
          col("value")))
    val q = CdcPipeline.start(s, cfg, dest)
    q.awaitTermination(300000)
    dest.readBack(s, Some("mktsegment string, user_id long, value double"))
      .groupBy("mktsegment")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("sum_value"))
  }

  // ==========================================================================
  // Relational suite (join/agg/window/set-op coverage; bench workhorses)
  // ==========================================================================

  register("tpch_q1_pricing_summary", Some(
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin)) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  register("tpch_q3_shipping_priority", Some(
    """SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
      |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'MACHINERY'
      |  AND o.o_orderdate < TIMESTAMP '2000-01-01'
      |  AND l.l_shipdate > TIMESTAMP '2000-01-01'
      |GROUP BY 1,2,3""".stripMargin)) { (s, dir) =>
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "MACHINERY")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("2000-01-01").cast("timestamp"))
    // Broadcast ONLY the filtered customer dim (1/5 of customers). The
    // orders side keeps essentially every row (TPC-H dates end in 1998), so
    // orders⋈customer must stay a distributed join and lineitem⋈orders a
    // shuffle join — broadcasting the orders join result would collect the
    // whole orders table on the driver and OOM at scale.
    l.join(o.join(broadcast(c), col("c_custkey") === col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
  }

  register("tpch_q5_region_revenue", Some(
    """SELECT r.r_name, n.n_name,
      |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM region r
      |JOIN nation n ON n.n_regionkey = r.r_regionkey
      |JOIN customer c ON c.c_nationkey = n.n_nationkey
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1,2""".stripMargin)) { (s, dir) =>
    val dims = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy("r_name", "n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
  }

  register("tpch_q6_forecast_revenue", Some(
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)
      |  AS revenue, count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin)) { (s, dir) =>
    // Q6: the pure scan-pushdown query — every predicate reaches the
    // parquet reader (shipdate range prunes row groups by min/max stats),
    // then a single partial-aggregated global sum. At 100 TB this plan is
    // a scan + one scalar, no shuffle of data rows.
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  register("tpch_q10_returned_items", Some(
    """SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
      |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM customer c
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l.l_returnflag = 'R'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c.c_custkey
      |LIMIT 20""".stripMargin)) { (s, dir) =>
    // Q10: fact-fact join on orderkey (both sides scale — a shuffle hash
    // join, never a broadcast), dims broadcast, top-N as
    // TakeOrderedAndProject (never a global sort). The returnflag and
    // orderdate predicates push to their scans BEFORE the join.
    val custDim = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
    Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custDim), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  register("tpch_q7_volume_shipping", Some(
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
      |    l.l_extendedprice * (1 - l.l_discount) AS volume
      |  FROM lineitem l, orders o, customer c, supplier s, nation n1, nation n2
      |  WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
      |    AND c.c_custkey = o.o_custkey AND s.s_nationkey = n1.n_nationkey
      |    AND c.c_nationkey = n2.n_nationkey
      |    AND ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
      |      OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
      |    AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      |    AND l.l_shipdate < TIMESTAMP '1997-01-01') shipping
      |GROUP BY 1, 2, 3""".stripMargin)) { (s, dir) =>
    // Q7: one fact-fact shuffle join (lineitem ⋈ orders on orderkey); both
    // nation-tagged dims broadcast. The two-nation disjunction is applied
    // AFTER the dim joins on the joined pair — no OR-join blowup.
    val n1 = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation")))
    val sup = broadcast(Tables.supplier(s, dir)
      .join(n1, col("s_nationkey") === col("sn_key")))
    val cust = broadcast(Tables.customer(s, dir)
      .join(n2, col("c_nationkey") === col("cn_key")))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_20" && col("cust_nation") === "NATION_11") ||
        (col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_20"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
        .as("revenue"))
  }

  register("tpch_q8_market_share", Some(
    """SELECT o_year,
      |  CAST(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
      |    / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
      |    l.l_extendedprice * (1 - l.l_discount) AS volume,
      |    n2.n_name AS supp_nation
      |  FROM lineitem l
      |  JOIN part p ON p.p_partkey = l.l_partkey
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      |  JOIN region r ON r.r_regionkey = n1.n_regionkey
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      |  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
      |    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o.o_orderdate < TIMESTAMP '1997-01-01') all_nations
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Q8: the deepest dim fan-in of the suite — every dimension broadcasts,
    // the only shuffles are lineitem ⋈ orders and the final 2-row agg
    val custAsia = broadcast(Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey")))
    val supN = broadcast(Tables.supplier(s, dir)
      .join(Tables.nation(s, dir).select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation")), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation")))
    val promoParts = broadcast(Tables.part(s, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey")))
    Tables.lineitem(s, dir)
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custAsia, col("o_custkey") === col("c_custkey"))
      .join(supN, col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"),
        col("supp_nation"))
      .groupBy("o_year")
      .agg((dsum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(0.0), 6) / dsum(col("volume"), 6))
        .cast("double").as("mkt_share"))
  }

  register("tpch_q14_promo_revenue", Some(
    """SELECT CAST(100.00 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
      |    THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
      |  / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS DOUBLE)
      |  AS promo_revenue
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      |  AND l.l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin)) { (s, dir) =>
    // Q14: date-pruned scan ⋈ broadcast part dim → one scalar
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0), 6)
          / dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6))
        .cast("double").as("promo_revenue"))
  }

  register("tpch_q15_top_supplier", Some(
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s.s_suppkey, s.s_name, r.total_revenue
      |FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
      |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin)) { (s, dir) =>
    // Q15: quarter revenue per supplier, then suppliers at the global max.
    // The max rides in as a 1-row broadcast join — no window, no second
    // full shuffle of the aggregate.
    val revenue = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
        .as("total_revenue"))
    val top = revenue.agg(max(col("total_revenue")).as("max_rev"))
    revenue
      .join(broadcast(top), col("total_revenue") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  register("tpch_q18_large_volume_customers", Some(
    """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
      |  o.o_totalprice,
      |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
      |FROM customer c
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY 1
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 300)
      |GROUP BY 1, 2, 3, 4, 5""".stripMargin)) { (s, dir) =>
    // Q18: the HAVING subquery is a re-aggregation of lineitem — computed
    // once, broadcast as a semi-join filter before the 3-way join
    val bigOrders = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(38,4)")).as("q"))
      .filter(col("q") > 300)
      .select(col("l_orderkey").as("big_orderkey"))
    Tables.lineitem(s, dir)
      .join(broadcast(bigOrders), col("l_orderkey") === col("big_orderkey"), "left_semi")
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
      .agg(dsum(col("l_quantity")).as("sum_qty"))
  }

  register("tpch_q19_discounted_revenue", Some(
    """SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
      |  AS revenue
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
      |       AND l.l_quantity BETWEEN 1 AND 20)
      |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
      |       AND l.l_quantity BETWEEN 10 AND 30)
      |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
      |       AND l.l_quantity BETWEEN 20 AND 40)""".stripMargin)) { (s, dir) =>
    // Q19 (fixture adaptation: size/quantity bands instead of containers,
    // which this part table lacks): equi-join on partkey with the OR-of-ANDs
    // as a residual — never an OR-join
    val p = broadcast(Tables.part(s, dir).select("p_partkey", "p_brand", "p_size"))
    Tables.lineitem(s, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 40)))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
        .as("revenue"))
  }

  register("tpch_q4_order_priority", Some(
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Q4 (fixture adaptation: "late" = shipped >90d after the order date —
    // this lineitem has no commit/receipt dates): EXISTS becomes a
    // left-semi join on orderkey with the correlated date comparison as
    // the join residual. One shuffle keyed by orderkey; the date window
    // pushes to the orders scan; the final aggregate is 5 groups.
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  register("tpch_q12_priority_shipping", Some(
    """SELECT l.l_linestatus,
      |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Q12 (fixture adaptation: linestatus stands in for the missing
    // shipmode): the CASE-pivot aggregation. The shipdate range pushes to
    // the lineitem scan, the orderkey join shuffles both facts, and the
    // pivot counts partial-aggregate map-side into 2 groups.
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
  }

  register("tpch_q13_customer_distribution", Some(
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c
      |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |    AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY 1) per_cust
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Q13 (fixture adaptation: the priority exclusion stands in for the
    // missing o_comment pattern): LEFT OUTER join preserving order-less
    // customers (count = 0 bucket), then a two-level aggregation — the
    // first keyed by custkey (the join's own key, no extra shuffle with
    // AQE), the second over |distinct counts| rows, i.e. tiny.
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    Tables.customer(s, dir).select("c_custkey")
      .join(o, col("o_custkey") === col("c_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  register("tpch_q17_small_quantity_revenue", Some(
    """SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
      |    / 7.0 AS DOUBLE) AS avg_yearly
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#4'
      |  AND l.l_quantity < (
      |    SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,4))) AS DOUBLE)
      |      / count(*))
      |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)) { (s, dir) =>
    // Q17: the correlated per-part average decorrelates into ONE extra
    // aggregation keyed by partkey — computed over only the brand's
    // lineitems (partkey determines brand, so the same broadcast semi
    // filter restricts the inner scan exactly) — never a per-row subquery.
    // The average routes through DECIMAL so both engines compare the
    // identical double threshold.
    val brandParts = broadcast(Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#4").select("p_partkey"))
    val brandItems = Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(brandParts, col("l_partkey") === col("p_partkey"))
    val avgQty = brandItems.groupBy(col("l_partkey").as("a_partkey"))
      .agg((sum(col("l_quantity").cast("decimal(38,4)")).cast("double") /
        count(lit(1))).as("avg_qty"))
    brandItems.join(avgQty, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).cast("double")
        .as("avg_yearly"))
  }

  register("tpch_q21_waiting_suppliers", Some(
    """SELECT s.s_name, count(*) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F'
      |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 120 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o.o_orderdate + INTERVAL 120 DAY)
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Q21 (fixture adaptation: "late" = shipped >120d after an F-status
    // order's date): the EXISTS / NOT-EXISTS pair decorrelates into two
    // per-orderkey aggregates — distinct suppliers overall and distinct
    // LATE suppliers — joined back on orderkey. Because l1 itself is late,
    // "no OTHER late supplier" ⇔ n_late = 1, and "another supplier exists"
    // ⇔ n_supp > 1. Every shuffle is keyed by orderkey (AQE reuses the
    // partitioning across the three joins); the supplier dim broadcasts.
    val fOrders = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val items = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val late = items
      .join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 120 DAYS"))
    val nSupp = items.groupBy(col("l_orderkey").as("ns_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
    val nLate = late.groupBy(col("l_orderkey").as("nl_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_late"))
    late.join(nSupp, col("l_orderkey") === col("ns_orderkey"))
      .join(nLate, col("l_orderkey") === col("nl_orderkey"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
  }

  register("tpch_q22_global_sales_opportunity", Some(
    """SELECT n.n_name AS cntrycode, count(*) AS numcust,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |WHERE c.c_acctbal > (
      |    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,4))) AS DOUBLE)
      |      / count(*)
      |    FROM customer c2 WHERE c2.c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Q22 (fixture adaptation: nation stands in for the missing phone
    // country code; the NOT EXISTS is time-scoped so the fixture keeps
    // matches): the scalar subquery is a 1-row broadcast cross join —
    // exactly how Catalyst executes a scalar subquery — and NOT EXISTS a
    // left-anti join keyed by custkey. The average routes through DECIMAL
    // so both engines compare the identical double threshold.
    val avgBal = Tables.customer(s, dir).filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(38,4)")).cast("double") /
        count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey")
    Tables.customer(s, dir)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("o_custkey") === col("c_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
  }

  /** FIXTURE ADAPTATION — derived partsupp. The driver's star schema has no
    * partsupp table, so the five partsupp-dependent TPC-H queries (Q2, Q9,
    * Q11, Q16, Q20) derive the part-supplier relation from lineitem:
    * distinct (l_partkey, l_suppkey) pairs, with
    *   ps_availqty   := count(*)                         (supply frequency)
    *   ps_supplycost := floor(100·min(l_extendedprice/l_quantity))/100
    *                                          (best unit price, whole cents)
    * Both proxies are order-independent aggregates, and the cent
    * quantization runs entirely in IEEE double ops (min, ×100, floor, /100)
    * that both engines evaluate bit-identically — unlike a double→DECIMAL
    * cast, whose rounding Spark takes from the shortest decimal string and
    * DuckDB from the binary value (they disagree near .5 ulp ties). With
    * cost in whole cents and l_quantity integer-valued, every downstream
    * product is a true ≤4-decimal value, so the deterministic-sum decimal
    * routing can never land on a rounding tie. One shuffle keyed by
    * (partkey, suppkey); downstream joins on the same keys reuse that
    * partitioning under AQE.
    * At 100 TB the derived relation is |distinct pairs| ≈ |part|×avg-supp
    * (bounded, dimension-sized), not |lineitem|. */
  private def derivedPartsupp(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(count(lit(1)).as("ps_availqty"),
        (floor(lit(100) * min(col("l_extendedprice") / col("l_quantity"))) /
          lit(100)).as("ps_supplycost"))

  /** Shared SQL CTE mirroring [[derivedPartsupp]] for the DuckDB oracles. */
  private val partsuppCte: String =
    """partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    CAST(count(*) AS BIGINT) AS ps_availqty,
      |    floor(100 * min(l_extendedprice / l_quantity)) / 100 AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  register("tpch_q2_min_cost_supplier", Some(
    s"""WITH $partsuppCte,
      |region_ps AS (
      |  SELECT ps.*, s.s_acctbal, s.s_name, n.n_name
      |  FROM partsupp ps
      |  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      |  JOIN nation n ON n.n_nationkey = s.s_nationkey
      |  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE')
      |SELECT rp.s_acctbal, rp.s_name, rp.n_name, p.p_partkey, p.p_brand,
      |  rp.ps_supplycost
      |FROM part p
      |JOIN region_ps rp ON rp.ps_partkey = p.p_partkey
      |WHERE p.p_type = 'LARGE' AND p.p_size <= 15
      |  AND rp.ps_supplycost = (
      |    SELECT min(rp2.ps_supplycost) FROM region_ps rp2
      |    WHERE rp2.ps_partkey = p.p_partkey)
      |ORDER BY rp.s_acctbal DESC, rp.n_name, rp.s_name, p.p_partkey
      |LIMIT 100""".stripMargin)) { (s, dir) =>
    // Q2 (fixture adaptation: p_type equality + size band; cost from the
    // derived partsupp): the correlated min-cost subquery decorrelates into
    // one per-part min over the SAME region-restricted relation, joined
    // back on partkey. supplier⨝nation⨝region is dimension-sized and
    // broadcasts; only partsupp shuffles (by partkey). The double equality
    // is exact — min picks an existing member of the compared set. The
    // ORDER BY carries a total order ((p_partkey, s_name) is unique per
    // row), so LIMIT 100 → TakeOrderedAndProject is deterministic.
    val regionSupp = broadcast(Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("n_nationkey") === col("s_nationkey"))
      .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
        col("r_regionkey") === col("n_regionkey"))
      .select("s_suppkey", "s_acctbal", "s_name", "n_name"))
    val regionPs = derivedPartsupp(s, dir)
      .join(regionSupp, col("ps_suppkey") === col("s_suppkey"))
    val minCost = regionPs.groupBy(col("ps_partkey").as("mc_partkey"))
      .agg(min(col("ps_supplycost")).as("min_cost"))
    val parts = broadcast(Tables.part(s, dir)
      .filter(col("p_type") === "LARGE" && col("p_size") <= 15)
      .select("p_partkey", "p_brand"))
    regionPs
      .join(parts, col("ps_partkey") === col("p_partkey"))
      .join(minCost, col("ps_partkey") === col("mc_partkey"))
      .filter(col("ps_supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  register("tpch_q9_product_type_profit", Some(
    s"""WITH $partsuppCte
      |SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
      |      - ps.ps_supplycost * l.l_quantity AS DECIMAL(38,4))) AS DOUBLE)
      |    AS sum_profit
      |FROM lineitem l
      |JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
      |  AND ps.ps_suppkey = l.l_suppkey
      |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    // Q9 (fixture adaptation: profit nets the derived supply cost; '%red%'
    // stands in for the reference's part-name pattern): the part filter
    // broadcasts and prunes lineitem FIRST (contains ~13% of parts), so the
    // (partkey, suppkey) shuffle joining the fact to derived partsupp — and
    // the orderkey shuffle for the date — carry only matching rows. Profit
    // routes through DECIMAL so accumulation order is irrelevant; the year
    // is cast to BIGINT to match DuckDB's year() type.
    val redParts = broadcast(Tables.part(s, dir)
      .filter(col("p_name").like("%red%")).select("p_partkey"))
    val items = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(redParts, col("l_partkey") === col("p_partkey"))
    val psRed = derivedPartsupp(s, dir)
      .join(redParts, col("ps_partkey") === col("p_partkey"))
      .select("ps_partkey", "ps_suppkey", "ps_supplycost")
    items
      .join(psRed, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("ps_supplycost") * col("l_quantity")).as("sum_profit"))
  }

  register("tpch_q11_important_stock", Some(
    s"""WITH $partsuppCte,
      |nation_ps AS (
      |  SELECT ps.ps_partkey, ps.ps_supplycost, ps.ps_availqty
      |  FROM partsupp ps
      |  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      |  JOIN nation n ON n.n_nationkey = s.s_nationkey
      |    AND n.n_name IN ('NATION_3', 'NATION_7'))
      |SELECT ps_partkey,
      |  CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,4)))
      |    AS DOUBLE) AS value
      |FROM nation_ps
      |GROUP BY 1
      |HAVING CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,4)))
      |    AS DOUBLE) > (
      |  SELECT 0.002 * CAST(SUM(CAST(ps_supplycost * ps_availqty
      |    AS DECIMAL(38,4))) AS DOUBLE)
      |  FROM nation_ps)""".stripMargin)) { (s, dir) =>
    // Q11 (fixture adaptation: two nations stand in for 'GERMANY'; value =
    // derived cost × availability): the HAVING threshold is a scalar
    // aggregate over the same nation-restricted relation — a 1-row
    // broadcast cross join, exactly how Catalyst executes a scalar
    // subquery. Both sides route through DECIMAL so the threshold double is
    // identical in both engines. The nation filter broadcasts into the
    // supplier dim; partsupp shuffles once by partkey for the final group.
    val nationSupp = broadcast(Tables.supplier(s, dir)
      .join(Tables.nation(s, dir).filter(col("n_name").isin("NATION_3", "NATION_7")),
        col("n_nationkey") === col("s_nationkey"))
      .select("s_suppkey"))
    val nationPs = derivedPartsupp(s, dir)
      .join(nationSupp, col("ps_suppkey") === col("s_suppkey"))
      .select(col("ps_partkey"),
        (col("ps_supplycost") * col("ps_availqty")).as("pv"))
    val threshold = nationPs
      .agg((lit(0.002) * dsum(col("pv"))).as("threshold"))
    nationPs.groupBy("ps_partkey")
      .agg(dsum(col("pv")).as("value"))
      .crossJoin(broadcast(threshold))
      .filter(col("value") > col("threshold"))
      .select("ps_partkey", "value")
  }

  register("tpch_q16_supplier_part_counts", Some(
    s"""WITH $partsuppCte
      |SELECT p.p_brand, p.p_type, p.p_size,
      |  CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
      |FROM partsupp ps
      |JOIN part p ON p.p_partkey = ps.ps_partkey
      |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      |  AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      |  AND ps.ps_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin)) { (s, dir) =>
    // Q16 (fixture adaptation: negative account balance stands in for the
    // reference's customer-complaint comment scan): NOT IN over a provably
    // non-null key column becomes a left-anti broadcast join; the part
    // predicate broadcasts and prunes partsupp before its suppkey-distinct
    // aggregation. countDistinct partial-aggregates map-side per
    // (brand, type, size, suppkey) before the final 3-key shuffle.
    val flagged = broadcast(Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey"))
    val parts = broadcast(Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
      .select("p_partkey", "p_brand", "p_type", "p_size"))
    derivedPartsupp(s, dir)
      .join(flagged, col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .join(parts, col("ps_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
  }

  register("tpch_q20_part_promotion", Some(
    s"""WITH $partsuppCte,
      |year_qty AS (
      |  SELECT l_partkey AS yq_partkey, l_suppkey AS yq_suppkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS qty_1997
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1, 2)
      |SELECT s.s_name, s.s_acctbal
      |FROM supplier s
      |WHERE s.s_suppkey IN (
      |  SELECT ps.ps_suppkey FROM partsupp ps
      |  JOIN year_qty yq ON yq.yq_partkey = ps.ps_partkey
      |    AND yq.yq_suppkey = ps.ps_suppkey
      |  WHERE ps.ps_partkey IN (
      |      SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |    AND ps.ps_availqty > 0.4 * yq.qty_1997)
      |ORDER BY s.s_name""".stripMargin)) { (s, dir) =>
    // Q20 (fixture adaptation: availability = supply frequency; "excess
    // stock" = availqty > 40% of the 1997 shipped quantity): the doubly-
    // correlated availqty subquery decorrelates into a per-(partkey,
    // suppkey) year aggregate joined back to partsupp on its OWN grouping
    // keys — AQE reuses the (partkey, suppkey) hash partitioning, so the
    // join adds no third shuffle. Both IN filters are left-semi: the part
    // name filter broadcasts; the final supplier membership semi-joins a
    // 100-row dim. The year sum routes through DECIMAL for determinism.
    val smallParts = broadcast(Tables.part(s, dir)
      .filter(col("p_name").like("small%")).select("p_partkey"))
    val yearQty = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_partkey").as("yq_partkey"), col("l_suppkey").as("yq_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(38,4)")).cast("double")
        .as("qty_1997"))
    val qualifying = derivedPartsupp(s, dir)
      .join(smallParts, col("ps_partkey") === col("p_partkey"), "left_semi")
      .join(yearQty, col("ps_partkey") === col("yq_partkey") &&
        col("ps_suppkey") === col("yq_suppkey"))
      .filter(col("ps_availqty") > lit(0.4) * col("qty_1997"))
      .select("ps_suppkey")
    Tables.supplier(s, dir)
      .join(qualifying, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  register("window_top_orders", Some(
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) WHERE rnk <= 3""".stripMargin)) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 3)
  }

  register("agg_topk_per_group", Some(
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) WHERE rnk <= 3""".stripMargin)) { (s, dir) =>
    // Same rows as window_top_orders, via the bounded-heap collect_top_k
    // aggregate instead of a window sort: no per-partition sort, the
    // shuffle carries at most k rows per customer per map task. The window
    // form IS the oracle (row_number ORDER BY o_totalprice DESC,
    // o_orderkey), so the tiebreak rides as a negated struct field.
    graft.operators.TopK.topKPerGroup(
      Tables.orders(s, dir),
      groupCols = Seq("o_custkey"),
      ordCols = Seq(col("o_totalprice"), (-col("o_orderkey")).as("__tb")),
      payload = Seq(col("o_orderkey")),
      k = 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rank").as("rnk"))
  }

  register("window_running_spend", Some(
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders""".stripMargin)) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(38,4)")).over(w)
          .cast("double").as("running_spend"))
  }

  register("window_rank_suite", Some(
    """SELECT o_custkey, o_orderkey,
      |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin)) { (s, dir) =>
    // The ranking-function family over one keyed window: a single shuffle
    // on o_custkey, one sort per partition, all five functions evaluated
    // in the same Window operator (one pass).
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  register("agg_pivot_priority", Some(
    """SELECT o_orderstatus,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_n,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
      |    THEN CAST(o_totalprice AS DECIMAL(38,4)) END) AS DOUBLE) AS urgent_rev,
      |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low_n,
      |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
      |    THEN CAST(o_totalprice AS DECIMAL(38,4)) END) AS DOUBLE) AS low_rev
      |FROM orders GROUP BY 1""".stripMargin)) { (s, dir) =>
    // PIVOT through the DataFrame API with explicit pivot values — with
    // the value list given, Catalyst plans ONE pass (no distinct-values
    // pre-query). With TWO aggregates the pivot lowers through PivotFirst,
    // whose empty cells are NULL — the counts coalesce to 0 to match the
    // oracle's SUM(CASE … ELSE 0) (the rev sums stay NULL-on-empty in
    // both engines; the fixture happens to populate every cell, but the
    // contract must not depend on that).
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", Seq("1-URGENT", "5-LOW"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
      .select(col("o_orderstatus"),
        coalesce(col("1-URGENT_n"), lit(0L)).as("urgent_n"),
        col("1-URGENT_rev").as("urgent_rev"),
        coalesce(col("5-LOW_n"), lit(0L)).as("low_n"),
        col("5-LOW_rev").as("low_rev"))
  }

  register("agg_percentiles", Some(
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
      |  round(min(l_extendedprice), 6) AS mn,
      |  round(max(l_extendedprice), 6) AS mx
      |FROM lineitem GROUP BY 1""".stripMargin)) { (s, dir) =>
    // EXACT interpolated percentiles (Spark `percentile` == DuckDB
    // quantile_cont: pos = q·(n−1), linear interpolation). Exact
    // percentiles shuffle the group's values once; at 100 TB prefer the
    // approx_percentile sketch unless exactness is contractual — both
    // surfaces exist in the catalog (see agg_approx_distinct for the
    // sketch-tier pattern).
    // one percentile call with an array of percentages: the group's values
    // buffer ONCE (three separate calls would hold three copies per group)
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_extendedprice"),
          array(lit(0.5), lit(0.9), lit(0.99))).as("ps"),
        round(min(col("l_extendedprice")), 6).as("mn"),
        round(max(col("l_extendedprice")), 6).as("mx"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 6).as("p50"),
        round(element_at(col("ps"), 2), 6).as("p90"),
        round(element_at(col("ps"), 3), 6).as("p99"),
        col("mn"), col("mx"))
  }

  register("agg_distinct_parts", Some(
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts,
      |  count(DISTINCT l_suppkey) AS distinct_supps, count(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin)) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n"))
  }

  register("agg_grouping_sets", Some(
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
      |  (l_returnflag, l_linestatus))""".stripMargin)) { (s, dir) =>
    // GROUPING SETS: three aggregation grains in ONE pass over the fact
    // table (Expand + single shuffle) — at 100 TB this replaces three
    // separate scans+aggregations.
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")),
          Seq(col("l_returnflag"), col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
  }

  register("window_lag_delta", Some(
    """SELECT user_id, event_id, value,
      |  CAST(value - lag(value) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS delta
      |FROM events
      |QUALIFY lag(value) OVER
      |  (PARTITION BY user_id ORDER BY ts, event_id) IS NOT NULL""".stripMargin)) { (s, dir) =>
    // lag/delta per key — the change-over-time window shape; keyed
    // partitioning, never a global sort.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("cluster_time"), col("event_id"))
    envelope(s, dir)
      .withColumn("__prev", lag(col("value"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        (col("value") - col("__prev")).cast("double").as("delta"))
  }

  register("agg_approx_distinct", None) { (s, dir) =>
    // The aggregates a 100 TB scan actually runs: HLL++ distinct (a
    // fixed-size sketch, merged map-side — exact distinct shuffles every
    // key) and KLL-style approximate quantiles. No DuckDB oracle: sketch
    // estimates are engine-specific; OperatorsSpec gates the error instead
    // (≤5% vs exact distinct, quantile rank error ≤ 1/accuracy).
    Tables.lineitem(s, dir).groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50_qty"),
      count(lit(1)).as("n"))
  }

  register("agg_hll_mergeable", None) { (s, dir) =>
    // MERGEABLE sketches — the incremental-stats architecture at 100 TB:
    // persist one fixed-size DataSketches HLL per day partition (computed
    // once, at ingest), then answer "distinct users over ANY date range"
    // by unioning sketches — never re-scanning events. Here: daily user
    // sketches → hll_union_agg per ISO week, alongside the exact distinct
    // the one-shot scan would give. No DuckDB oracle (sketch estimates are
    // engine-specific); OperatorsSpec gates the estimate against the exact
    // count and proves union-of-dailies == one-shot weekly sketch (HLL
    // merge is lossless at equal lgK).
    // week key = the week's MONDAY (date_trunc), not weekofyear alone:
    // a bare ISO week number collapses identical weeks across years and
    // splits awkwardly around the 52/53 Jan-1 spillover once the feed
    // spans a year boundary
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        to_date(date_trunc("week", col("ts"))).as("week"))
    val daily = ev.groupBy(col("week"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val weekly = daily.groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
    val exact = ev.groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    weekly.join(exact, "week")
      .select(col("week"), col("approx_users"), col("exact_users"))
  }

  register("agg_kll_mergeable", None) { (s, dir) =>
    // The quantile sibling of agg_hll_mergeable — the OTHER half of the
    // incremental-stats architecture: persist one fixed-size KLL sketch
    // per day partition at ingest, answer "p50/p99 of value over ANY date
    // range" by merging daily sketches, never re-scanning events. Daily
    // kll_sketch_agg_double(value, k=200) → kll_merge_agg_double per ISO
    // week → quantile reads, alongside the exact percentile the one-shot
    // scan would give. Unlike HLL union (lossless at equal lgK),
    // DataSketches KLL compaction is RANDOMIZED: estimates vary run to
    // run within the published rank-error bound (~1.65% at k=200), so
    // this is no_oracle by nature twice over (engine-specific AND
    // randomized) and OperatorsSpec gates what KLL actually contracts:
    // the exact RANK of each estimate stays within epsilon of the asked
    // quantile. Week key = the week's Monday, year-unambiguous like the
    // HLL entry.
    val ev = Tables.events(s, dir)
      .select(col("value"), to_date(col("ts")).as("day"),
        to_date(date_trunc("week", col("ts"))).as("week"))
    val daily = ev.groupBy(col("week"), col("day"))
      .agg(expr("kll_sketch_agg_double(value, 200)").as("sk"))
    val weekly = daily.groupBy(col("week"))
      .agg(expr("kll_merge_agg_double(sk)").as("wsk"))
      .select(col("week"),
        expr("kll_sketch_get_quantile_double(wsk, 0.5)").as("approx_p50"),
        expr("kll_sketch_get_quantile_double(wsk, 0.99)").as("approx_p99"))
    val exact = ev.groupBy(col("week"))
      .agg(expr("percentile(value, 0.5D)").as("exact_p50"),
        expr("percentile(value, 0.99D)").as("exact_p99"))
    weekly.join(exact, "week")
      .select(col("week"), col("approx_p50"), col("exact_p50"),
        col("approx_p99"), col("exact_p99"))
  }

  register("agg_hll_exact_regime", Some(
    """SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
      |  count(DISTINCT user_id) AS approx_users,
      |  count(DISTINCT user_id) AS exact_users
      |FROM events WHERE user_id IS NOT NULL GROUP BY 1""".stripMargin)) {
    (s, dir) =>
      // The HLL entry's EXACT-REGIME sibling under the full hash gate
      // (the CMS/theta discipline applied to distinct sketches): below
      // sparse-mode capacity a DataSketches HLL stores coupons EXACTLY,
      // and union-of-dailies stays in the exact regime, so the weekly
      // estimate IS the distinct count — deterministically (the coupon
      // hash depends only on the user_id values; a 26-bit coupon
      // collision would surface as an honest hash mismatch, not a
      // silently tolerated error). lgK=21 keeps sparse mode far beyond
      // any tested scale's weekly user count. agg_hll_mergeable keeps
      // gating the ESTIMATION regime's error and merge losslessness.
      val ev = Tables.events(s, dir)
        .where(col("user_id").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          to_date(date_trunc("week", col("ts"))).as("week"))
      val daily = ev.groupBy(col("week"), col("day"))
        .agg(expr("hll_sketch_agg(user_id, 21)").as("sk"))
      daily.groupBy(col("week"))
        .agg(round(expr("hll_sketch_estimate(hll_union_agg(sk, true))"))
          .cast("long").as("approx_users"))
        .join(ev.groupBy(col("week"))
          .agg(countDistinct(col("user_id")).as("exact_users")), Seq("week"))
        .select(col("week"), col("approx_users"), col("exact_users"))
  }

  register("agg_kll_exact_regime", Some(
    """WITH d AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(count(*) AS DOUBLE) AS n
      |  FROM events GROUP BY 1),
      |r AS (SELECT n, row_number() OVER (ORDER BY n) AS rk,
      |        count(*) OVER () AS cnt FROM d)
      |SELECT
      |  max(CASE WHEN rk = CAST(ceil(0.5 * cnt) AS BIGINT) THEN n END) AS p50,
      |  max(CASE WHEN rk = CAST(ceil(0.9 * cnt) AS BIGINT) THEN n END) AS p90,
      |  CAST(max(cnt) AS BIGINT) AS n_days
      |FROM r""".stripMargin)) { (s, dir) =>
    // The KLL entry's EXACT-REGIME sibling: a KLL sketch holds every item
    // uncompacted while n <= k, and merging sketches whose combined count
    // stays under k keeps the exact set — quantiles are then true order
    // statistics (INCLUSIVE rank: the ceil(q*n)-th item), which the
    // oracle replays EXPLICITLY via row_number so no engine's quantile
    // interpolation convention is trusted. The feed's DAY COUNT is
    // bounded by the fixture's date range at every scale factor (days,
    // not rows), so daily-volume quantiles sit in the exact regime
    // tri-scale: p50/p90 of per-day event volume — the ops question —
    // served from mergeable weekly sketches, under the full hash gate.
    // agg_kll_mergeable keeps gating the randomized-compaction regime's
    // rank-error contract.
    val daily = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .groupBy(col("week"), col("day"))
      .agg(count(lit(1)).cast("double").as("n"))
    val weekly = daily.groupBy(col("week"))
      .agg(expr("kll_sketch_agg_double(n, 200)").as("sk"),
        count(lit(1)).as("nd"))
    weekly.agg(expr("kll_merge_agg_double(sk)").as("msk"),
        sum(col("nd")).as("n_days"))
      .select(
        expr("kll_sketch_get_quantile_double(msk, 0.5)").as("p50"),
        expr("kll_sketch_get_quantile_double(msk, 0.9)").as("p90"),
        col("n_days"))
  }

  register("agg_cms_mergeable", None) { (s, dir) =>
    // The FREQUENCY third of the mergeable-sketch trio (HLL = distinct,
    // KLL = quantiles, CMS = item frequencies): daily count_min_sketch
    // over event_type at ingest → Sketches.cmsMerge per ISO week →
    // per-type point estimates over any range without re-scanning events.
    // Unlike KLL's randomized compaction, CMS merge is a cell-wise
    // counter sum — LOSSLESS: union-of-dailies is bit-identical to the
    // one-shot weekly sketch (SketchesSpec proves byte equality) — and
    // estimates carry the one-sided CMS guarantee (>= exact, <= exact +
    // eps·N at the configured confidence; both gated in SketchesSpec).
    // No DuckDB oracle (sketch bytes are engine-specific). Probe set =
    // the distinct event types (dimension-sized, broadcast); week key =
    // the week's Monday, year-unambiguous like the HLL/KLL entries.
    val ev = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        to_date(date_trunc("week", col("ts"))).as("week"))
    val daily = ev.groupBy(col("week"), col("day"))
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
    val weekly = daily.groupBy(col("week"))
      .agg(graft.functions.Sketches.cmsMerge(col("sk")).as("wsk"))
    val types = ev.select("event_type").distinct()
    val probed = weekly.crossJoin(broadcast(types))
      .select(col("week"), col("event_type"),
        graft.functions.Sketches.cmsEstimateString(col("wsk"),
          col("event_type")).as("approx_n"))
    val exact = ev.groupBy(col("week"), col("event_type"))
      .agg(count(lit(1)).as("exact_n"))
    probed.join(exact, Seq("week", "event_type"), "left")
      .select(col("week"), col("event_type"), col("approx_n"),
        coalesce(col("exact_n"), lit(0L)).as("exact_n"))
  }

  register("agg_cms_exact_regime", Some(
    """SELECT CAST(date_trunc('week', ts) AS DATE) AS week, event_type,
      |  count(*) AS approx_n, count(*) AS exact_n
      |FROM events GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    // The CMS entry's EXACT-REGIME sibling under the full hash gate (the
    // theta-sketch discipline applied to frequency sketches): with the
    // event-type alphabet far narrower than the sketch width (~5 values
    // vs ~2,719 counters/row × 5 rows, seed pinned at 42), no two types
    // share a cell in every row, and the CMS point estimate is EXACTLY
    // the count — deterministically, since the hash depends only on the
    // type strings, not the scale factor. The oracle therefore demands
    // approx_n == count(*) == exact_n per (week, type); a collision would
    // surface as an honest hash mismatch, not a silently tolerated error.
    // agg_cms_mergeable keeps gating the merge identity + error bound in
    // the regime beyond this one.
    val ev = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        to_date(date_trunc("week", col("ts"))).as("week"))
    val daily = ev.groupBy(col("week"), col("day"))
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
    val weekly = daily.groupBy(col("week"))
      .agg(graft.functions.Sketches.cmsMerge(col("sk")).as("wsk"))
    val exact = ev.groupBy(col("week"), col("event_type"))
      .agg(count(lit(1)).as("exact_n"))
    // probe only PRESENT (week, type) pairs — the oracle's GROUP BY emits
    // exactly those
    exact.join(weekly, Seq("week"))
      .select(col("week"), col("event_type"),
        graft.functions.Sketches.cmsEstimateString(col("wsk"),
          col("event_type")).as("approx_n"),
        col("exact_n"))
  }

  register("agg_theta_overlap", Some(
    """WITH wu AS (
      |  SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS week, user_id
      |  FROM events),
      |tot AS (SELECT week, count(*) AS n_users FROM wu GROUP BY 1),
      |ov AS (
      |  SELECT c.week AS week, count(*) AS returning_users
      |  FROM wu c JOIN wu p ON p.user_id = c.user_id
      |    AND p.week = c.week - INTERVAL 7 DAY
      |  GROUP BY 1)
      |SELECT t.week,
      |  CAST(t.n_users AS BIGINT) AS n_users,
      |  CAST(coalesce(o.returning_users, 0) AS BIGINT) AS returning_users,
      |  CAST(t.n_users - coalesce(o.returning_users, 0) AS BIGINT) AS new_users
      |FROM tot t LEFT JOIN ov o USING (week)""".stripMargin)) { (s, dir) =>
    // Theta sketches — the SET-ALGEBRA sketch the HLL/KLL/CMS trio lacks:
    // weekly user sketches answer INTERSECTION ("how many returned from
    // last week") and DIFFERENCE ("how many are new") from the persisted
    // sketches alone — per-partition sketches once at ingest, any
    // cross-partition overlap question later, never a re-scan or a join
    // of the raw data. HLL fundamentally cannot answer these (union-only
    // algebra). Below 2^lgK=65536 distinct users per week the sketch is
    // EXACT and deterministic, so this entry sits under the DuckDB
    // oracle, which replays the same set algebra on the raw rows;
    // SketchesSpec gates the estimation regime (lgK=9, 40 K-element
    // sets) separately, plus byte-identical merge losslessness.
    val wk = Tables.events(s, dir).select(
      to_date(date_trunc("week", col("ts"))).as("week"), col("user_id"))
    val sk = wk.groupBy("week")
      .agg(graft.functions.Sketches.thetaSketch(col("user_id")).as("sk"))
    val prev = sk.select(date_add(col("week"), 7).as("week"),
      col("sk").as("prev_sk"))
    sk.join(prev, Seq("week"), "left")
      .select(col("week"),
        graft.functions.Sketches.thetaEstimate(col("sk"))
          .cast("long").as("n_users"),
        coalesce(graft.functions.Sketches
            .thetaIntersectEstimate(col("sk"), col("prev_sk")), lit(0.0))
          .cast("long").as("returning_users"),
        coalesce(graft.functions.Sketches
            .thetaAnotBEstimate(col("sk"), col("prev_sk")),
          graft.functions.Sketches.thetaEstimate(col("sk")))
          .cast("long").as("new_users"))
  }

  register("agg_freq_mergeable", Some(
    """WITH u AS (SELECT user_id, count(*) AS freq FROM events
      |           WHERE user_id IS NOT NULL GROUP BY 1)
      |SELECT user_id, CAST(freq AS BIGINT) AS freq
      |FROM u ORDER BY freq DESC, user_id LIMIT 10""".stripMargin)) { (s, dir) =>
    // Frequent-items (Misra-Gries) sketches — the HEAVY-HITTERS sketch
    // completing the mergeable family: HLL answers "how many distinct",
    // KLL "what quantile", CMS "how often did X occur", theta "how do two
    // sets overlap"; this one answers "WHICH items dominate" — from
    // persisted per-day sketches alone, never a re-scan. Per-day
    // freq_sketch over user_id at ingest → one merge → top-10 talkers.
    // At maxMapSize=4096 the sketch never saturates below ~3K distinct
    // users per group, so every estimate is EXACT and deterministic —
    // the regime this DuckDB oracle pins (the fixture has 150 users at
    // sf0.01); SketchesSpec gates the saturated regime's deterministic
    // lb/ub bounds separately. Ties at the top-10 boundary break on
    // user_id in both engines; estimates equal true counts here, so the
    // cut is identical. At 100 TB each sketch is a fixed
    // maxMapSize·16-byte blob: the shuffle moves days × sketches, never
    // events.
    // NULL user_ids are excluded EXPLICITLY on both legs: FreqSketchAgg
    // skips nulls by construction, while SQL GROUP BY would keep a NULL
    // group — the WHERE in the oracle + this filter pin one semantics.
    val daily = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day")
      .agg(graft.functions.Sketches.freqSketch(col("user_id"), 4096).as("sk"))
    daily.agg(graft.functions.Sketches.freqMerge(col("sk"), 4096).as("sk"))
      .select(explode(graft.functions.Sketches.freqTopK(col("sk"), 10))
        .as("hh"))
      .select(col("hh.item").as("user_id"), col("hh.est").as("freq"))
      .orderBy(col("freq").desc, col("user_id"))
  }

  register("events_volume_anomaly", Some(
    """WITH h AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour_ts, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |h2 AS (
      |  SELECT event_type, hour_ts, n,
      |    CAST(floor(epoch(hour_ts) / 3600) AS BIGINT) AS hr FROM h),
      |w AS (
      |  SELECT event_type, hour_ts, n,
      |    sum(n) OVER (PARTITION BY event_type ORDER BY hr
      |      RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS tsum,
      |    count(n) OVER (PARTITION BY event_type ORDER BY hr
      |      RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS tcnt
      |  FROM h2)
      |SELECT event_type, hour_ts, CAST(n AS BIGINT) AS n_events,
      |  round(CAST(tsum AS DOUBLE) / tcnt, 6) AS trail_mean,
      |  round(n / (CAST(tsum AS DOUBLE) / tcnt), 6) AS vol_ratio
      |FROM w WHERE tcnt >= 12""".stripMargin)) { (s, dir) =>
    // Ingest-volume anomaly signal: each hour's event count against its
    // trailing-24h mean (a TIME-range frame on epoch-hours, not a row
    // frame — silent hours must widen the window's reach, not shift it).
    // The ratio is the pager number: 0.2 = feed stall, 5.0 = replay
    // storm. Hours without >= 12 trailing observations are warm-up and
    // excluded. Exact integer counts -> one double division, so both
    // engines round identically. One partial-aggregated groupBy + one
    // keyed window; at 100 TB the window input is HOURS x types, not
    // events.
    val h = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hr", floor(unix_timestamp(col("hour_ts")) / 3600).cast("long"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rangeBetween(-24, -1)
    h.select(col("event_type"), col("hour_ts"), col("n"),
        sum(col("n")).over(w).as("tsum"),
        count(col("n")).over(w).as("tcnt"))
      .filter(col("tcnt") >= 12)
      .select(col("event_type"), col("hour_ts"), col("n").as("n_events"),
        round(col("tsum").cast("double") / col("tcnt"), 6).as("trail_mean"),
        round(col("n") / (col("tsum").cast("double") / col("tcnt")), 6)
          .as("vol_ratio"))
  }

  register("events_ab_cuped", Some(
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
      |      THEN CAST(value AS DECIMAL(38,4)) END), 0) AS DOUBLE) AS x,
      |    CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
      |      THEN CAST(value AS DECIMAL(38,4)) END), 0) AS DOUBLE) AS y
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      |m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(38,8))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(38,8))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS sxy
      |  FROM u),
      |a AS (
      |  SELECT u.user_id % 2 AS variant, u.y,
      |    u.y - ((m.n * m.sxy - m.sx * m.sy) / (m.n * m.sxx - m.sx * m.sx))
      |      * (u.x - m.sx / m.n) AS y_adj
      |  FROM u CROSS JOIN m),
      |v AS (
      |  SELECT variant, count(*) AS n_users,
      |    CAST(sum(CAST(y AS DECIMAL(38,8))) AS DOUBLE) AS vy,
      |    CAST(sum(CAST(y * y AS DECIMAL(38,8))) AS DOUBLE) AS vyy,
      |    CAST(sum(CAST(y_adj AS DECIMAL(38,8))) AS DOUBLE) AS va,
      |    CAST(sum(CAST(y_adj * y_adj AS DECIMAL(38,8))) AS DOUBLE) AS vaa
      |  FROM a GROUP BY 1)
      |SELECT variant, n_users,
      |  round(vy / n_users, 6) AS mean_y,
      |  round(va / n_users, 6) AS mean_y_adj,
      |  round(1 - (n_users * vaa - va * va) / (n_users * vyy - vy * vy), 6)
      |    AS var_reduction
      |FROM v ORDER BY 1""".stripMargin)) { (s, dir) =>
    // CUPED variance reduction (Deng et al., WSDM 2013) — the
    // experimentation-analytics pass an A/B platform runs on every
    // metric: per-user post-period value adjusted by the pre-period
    // covariate, y_adj = y − θ(x − x̄), θ = cov(x,y)/var(x) pooled. The
    // adjusted means answer the same question with (here) a measurably
    // smaller variance — var_reduction per variant is the entry's
    // headline column. Numerics: per-user sums and ALL moments are
    // decimal-routed (exact), so θ and every y_adj are identical doubles
    // in both engines; the only approximation is the 6-dp output round.
    // Plan: one user-keyed aggregate (partial agg'd), a 1-row moment
    // frame broadcast back, one variant-keyed aggregate — three tiny
    // exchanges at any scale.
    val split = lit("2024-01-16").cast("timestamp")
    val byUser = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("ts") < split, col("value"))
          .cast("decimal(38,4)")), lit(0).cast("decimal(38,4)"))
          .cast("double").as("x"),
        coalesce(sum(when(col("ts") >= split, col("value"))
          .cast("decimal(38,4)")), lit(0).cast("decimal(38,4)"))
          .cast("double").as("y"))
    val m = byUser.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,8)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(38,8)")).cast("double").as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,8)")).cast("double")
        .as("sxx"),
      sum((col("x") * col("y")).cast("decimal(38,8)")).cast("double")
        .as("sxy"))
    val a = byUser.crossJoin(broadcast(m))
      .withColumn("y_adj", col("y") -
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) *
          (col("x") - col("sx") / col("n")))
      .withColumn("variant", pmod(col("user_id"), lit(2)))
    a.groupBy(col("variant"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("y").cast("decimal(38,8)")).cast("double").as("vy"),
        sum((col("y") * col("y")).cast("decimal(38,8)")).cast("double")
          .as("vyy"),
        sum(col("y_adj").cast("decimal(38,8)")).cast("double").as("va"),
        sum((col("y_adj") * col("y_adj")).cast("decimal(38,8)"))
          .cast("double").as("vaa"))
      .select(col("variant"), col("n_users"),
        round(col("vy") / col("n_users"), 6).as("mean_y"),
        round(col("va") / col("n_users"), 6).as("mean_y_adj"),
        round(lit(1) - (col("n_users") * col("vaa") - col("va") * col("va")) /
          (col("n_users") * col("vyy") - col("vy") * col("vy")), 6)
          .as("var_reduction"))
      .orderBy(col("variant"))
  }

  register("events_markov_transitions", Some(
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS next_type
      |  FROM events WHERE user_id IS NOT NULL),
      |t AS (SELECT event_type AS prev_type, next_type, count(*) AS n_trans
      |      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT prev_type, sum(n_trans) AS tot_n FROM t GROUP BY 1)
      |SELECT t.prev_type, t.next_type, t.n_trans,
      |  round(CAST(t.n_trans AS DOUBLE) / tot.tot_n, 6) AS p_next
      |FROM t JOIN tot ON t.prev_type = tot.prev_type
      |ORDER BY 1, 2""".stripMargin)) { (s, dir) =>
    // First-order Markov transition matrix over per-user event sequences —
    // the sequence-statistics pass a behavioral-cloning / next-event-
    // prediction dataset build runs first (and the sanity check on any
    // sessionized corpus: a P(signup -> signup) spike means replayed
    // ingestion). Per-user lead() needs ONE keyed sort (ts, event_id
    // total order inside each user partition); the transition counts are
    // a partial-aggregated groupBy on a types² key space, and the row
    // normalizer joins type-count to type-pair-count — both tiny next to
    // the scan at any scale. Exact integer counts -> one double division,
    // so both engines round identically.
    val seq = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))).as("next_type"))
    val t = seq.filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    // normalizer as a window OVER the aggregated counts — a join against
    // a separately-derived total table would recompute the lead-window
    // lineage (two scans, two sequence sorts); this reuses the one
    // aggregate and windows the types²-sized frame
    t.withColumn("tot_n",
        sum(col("n_trans")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n_trans"),
        round(col("n_trans").cast("double") / col("tot_n"), 6).as("p_next"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  register("agg_sliding_windows", Some(
    """SELECT window_start, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT date_trunc('hour', ts) AS window_start, value FROM events
      |  UNION ALL
      |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, value FROM events)
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Sliding windows (2-hour width, 1-hour slide): every event lands in
    // exactly width/slide = 2 windows, which is what the oracle's two-row
    // expansion replays. Spark's window() generates the struct without
    // materializing the expansion as a join — one explode-like Generate,
    // then the same keyed partial aggregation as a tumbling window. The
    // same expression drives streaming sliding aggregates (with a
    // watermark) unchanged — batch/stream unification.
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("sum_value"))
  }

  register("agg_session_windows", Some(
    """WITH d AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |i AS (SELECT *, SUM(brk) OVER
      |  (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS UNBOUNDED PRECEDING) AS sid FROM d)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 10 MINUTE AS session_end,
      |  count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      |FROM i GROUP BY user_id, sid""".stripMargin)) { (s, dir) =>
    // Sessionization: Spark's session_window (merge while the gap to the
    // previous event is < 10 min; window end = last event + gap) against
    // the classic gaps-and-islands SQL — the oracle proving the session
    // semantics line up exactly, timestamp for timestamp. One shuffle on
    // user_id; session merging is partition-local within each key.
    envelope(s, dir)
      .groupBy(col("user_id"),
        session_window(col("cluster_time"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))
  }

  register("events_completeness_audit", Some(
    """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |  count(DISTINCT date_part('hour', ts)) AS hours_present,
      |  CAST(max(date_part('hour', ts)) - min(date_part('hour', ts)) + 1
      |    - count(DISTINCT date_part('hour', ts)) AS BIGINT) AS hours_missing
      |FROM events GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    // Feed-completeness audit: per (event_type, day), how many hour slots
    // actually carry data and how many INTERIOR hours are silent between
    // the day's first and last observation — the gap signal an ingestion
    // monitor alerts on (a stalled producer shows up as hours_missing > 0
    // long before volume anomalies do). One partial-aggregated groupBy;
    // at 100 TB the distinct-hours set is ≤24 per group, so map-side
    // combine reduces each task's contribution to group-count rows.
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(countDistinct(hour(col("ts"))).as("hours_present"),
        (max(hour(col("ts"))) - min(hour(col("ts"))) + lit(1) -
          countDistinct(hour(col("ts")))).cast("long").as("hours_missing"))
  }

  register("events_funnel", Some(
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS signup_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS view_ts
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'view' AND e.ts > s1.signup_ts
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS purchase_ts
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.view_ts
      |  GROUP BY e.user_id)
      |SELECT s1.user_id, s1.signup_ts, s2.view_ts, s3.purchase_ts
      |FROM s1
      |LEFT JOIN s2 ON s1.user_id = s2.user_id
      |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin)) { (s, dir) =>
    // Ordered-stage funnel (signup → first view AFTER it → first purchase
    // after THAT): each stage is one aggregate keyed by user joined back —
    // at any scale, three user-keyed shuffles of stage survivors, never a
    // per-user event sort or a sequence cross product. NULLs mark where a
    // user fell out of the funnel.
    val ev = Tables.events(s, dir)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("signup_ts"))
    val s2 = ev.join(s1, "user_id")
      .filter(col("event_type") === "view" && col("ts") > col("signup_ts"))
      .groupBy("user_id").agg(min("ts").as("view_ts"))
    val s3 = ev.join(s2, "user_id")
      .filter(col("event_type") === "purchase" && col("ts") > col("view_ts"))
      .groupBy("user_id").agg(min("ts").as("purchase_ts"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_ts"), col("view_ts"),
        col("purchase_ts"))
  }

  register("events_retention_cohorts", Some(
    """WITH f AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      |  FROM events GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
      |SELECT f.cohort_day, date_diff('day', f.cohort_day, a.d) AS day_offset,
      |  count(DISTINCT a.user_id) AS n_users
      |FROM a JOIN f ON a.user_id = f.user_id
      |GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    // Cohort retention: users grouped by first-activity day, counted on
    // each later active day. The cohort map is one user-keyed aggregate
    // (dimension-sized — AQE broadcasts it back); the activity relation is
    // a distinct over (user, day) with partial aggregation. No day×day
    // cross product at any scale.
    val ev = Tables.events(s, dir)
    val cohort = ev.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val active = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  register("agg_cube_orders", Some(
    """SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
      |  COALESCE(o_orderpriority, 'ALL') AS orderpriority,
      |  count(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)) { (s, dir) =>
    // CUBE: all four grain combinations in one Expand + one shuffle —
    // completes the rollup/grouping-sets family
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n"), col("sum_price"))
  }

  register("agg_rollup_lineitem", Some(
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
  }

  register("join_anti_customers_without_orders", Some(
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin)) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  register("join_semi_big_spenders", Some(
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin)) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  register("join_asof_last_click", Some(
    """WITH p AS (SELECT event_id, user_id, ts, value FROM events
      |           WHERE event_type = 'purchase'),
      |     c AS (SELECT event_id, user_id, ts, value FROM events
      |           WHERE event_type = 'click'),
      |     m AS (SELECT p.event_id AS pid, c.ts AS click_ts,
      |             c.value AS click_value,
      |             row_number() OVER (PARTITION BY p.event_id
      |               ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |           FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
      |SELECT p.event_id, p.user_id, p.ts, p.value,
      |  m.click_ts AS last_click_ts, m.click_value AS last_click_value
      |FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
      |  ON m.pid = p.event_id""".stripMargin)) { (s, dir) =>
    // As-of join, the union+window shape: the oracle's pair-join+rank form
    // is quadratic per hot user; this plans ONE shuffle on user_id, no join
    // operator at all (OperatorsSpec proves equality and the plan shape)
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("ts").as("last_click_ts"), col("value").as("last_click_value"))
    graft.operators.AsOf.asOfJoin(
      p, "user_id", "ts", c, "user_id", "ts",
      payload = Seq("last_click_ts", "last_click_value"), tiebreak = "event_id")
  }

  register("join_interval_lookup", Some(
    """SELECT b.label AS band, count(*) AS n_events,
      |  CAST(sum(CAST(e.value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      |FROM events e LEFT JOIN (VALUES
      |    (0.0, 25.0, 'micro'), (25.0, 80.0, 'small'), (80.0, 150.0, 'mid'),
      |    (150.0, 310.0, 'large'), (310.0, 460.0, 'xl'), (470.0, 1e9, 'whale')
      |  ) b(lo, hi, label)
      |  ON e.value >= b.lo AND e.value < b.hi
      |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin)) { (s, dir) =>
    // Point-in-interval dimension join WITHOUT a join operator: the
    // interval table (IP→geo / value→band / time→window class) is
    // model-sized, so it rides the plan as reference arrays and each fact
    // row pays one binary search INSIDE the scan's codegen — the plan has
    // zero Join nodes and the only exchange is the final aggregate's,
    // where Spark's own answer to a range-predicate dimension join is a
    // BroadcastNestedLoopJoin (O(intervals) per row, codegen break).
    // DuckDB replays it as the literal LEFT JOIN — same bands, same
    // NULL-label gap row ([460, 470) is deliberately uncovered, plus the
    // left-join semantics for out-of-range rows). PlanAuditSpec asserts
    // the no-join shape.
    val bands = Seq((0.0, 25.0, "micro"), (25.0, 80.0, "small"),
      (80.0, 150.0, "mid"), (150.0, 310.0, "large"), (310.0, 460.0, "xl"),
      (470.0, 1e9, "whale"))
    graft.operators.Enrichment.enrichByInterval(
        Tables.events(s, dir), "value", bands, outCol = "band")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("band").asc_nulls_first)
  }

  register("join_range_purchases_after_signup", Some(
    """WITH s AS (SELECT event_id AS signup_id, user_id, ts AS signup_ts
      |           FROM events WHERE event_type = 'signup'),
      |     p AS (SELECT user_id, ts, value FROM events
      |           WHERE event_type = 'purchase'),
      |     j AS (SELECT s.signup_id, count(*) AS n_purchases,
      |             CAST(SUM(CAST(p.value AS DECIMAL(38,4))) AS DOUBLE) AS purchase_value
      |           FROM s JOIN p ON p.user_id = s.user_id
      |             AND p.ts BETWEEN s.signup_ts
      |                          AND s.signup_ts + INTERVAL 48 HOUR
      |           GROUP BY 1)
      |SELECT s.signup_id, s.user_id, s.signup_ts,
      |  COALESCE(j.n_purchases, 0) AS n_purchases,
      |  COALESCE(j.purchase_value, 0.0) AS purchase_value
      |FROM s LEFT JOIN j ON j.signup_id = s.signup_id""".stripMargin)) { (s, dir) =>
    // Banded range join: the inequality predicate becomes an equi-join on
    // (user, 24h-bucket) — a partitioned hash join, never a nested-loop
    // product; each 48h window covers ≤ 3 buckets
    val ev = Tables.events(s, dir)
    val su = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("signup_ts"),
        (col("ts") + expr("INTERVAL 48 HOURS")).as("until_ts"))
    val pu = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    val pairs = graft.operators.AsOf.rangeJoin(
      su, "signup_ts", "until_ts", pu, "p_ts",
      keys = Seq("user_id" -> "p_user"), bucketWidth = lit(24L * 3600 * 1000000L))
    val agg = pairs.groupBy("signup_id")
      .agg(count(lit(1)).as("n"), dsum(col("p_value")).as("v"))
    su.join(agg, Seq("signup_id"), "left")
      .select(col("signup_id"), col("user_id"), col("signup_ts"),
        coalesce(col("n"), lit(0L)).as("n_purchases"),
        coalesce(col("v"), lit(0.0)).as("purchase_value"))
  }

  register("set_ops_customer_orders", Some(
    """SELECT
      |  (SELECT count(*) FROM (SELECT c_custkey FROM customer
      |    INTERSECT SELECT o_custkey FROM orders) t) AS n_both,
      |  (SELECT count(*) FROM (SELECT c_custkey FROM customer
      |    EXCEPT SELECT o_custkey FROM orders) t2) AS n_no_orders""".stripMargin)) { (s, dir) =>
    val custKeys  = Tables.customer(s, dir).select(col("c_custkey"))
    val orderCust = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey"))
    custKeys.intersect(orderCust).agg(count(lit(1)).as("n_both"))
      .crossJoin(custKeys.except(orderCust).agg(count(lit(1)).as("n_no_orders")))
  }

  // ==========================================================================
  // Text analysis (documents)
  // ==========================================================================

  register("text_frequent_tokens", Some(
    """SELECT token, n_occurrences, n_docs FROM (
      |  SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences,
      |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |    row_number() OVER (ORDER BY count(*) DESC, token) AS rnk
      |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS token
      |        FROM documents)
      |  GROUP BY token) WHERE rnk <= 20""".stripMargin)) { (s, dir) =>
    // Exact global heavy hitters (stopword / boilerplate-token discovery):
    // explode → one aggregation keyed by token (partial map-side — the
    // shuffle carries one row per distinct token per partition, never the
    // token stream), then top-k over the |vocabulary|-sized result as a
    // TakeOrdered with a total order (token breaks count ties). At 100 TB
    // the vocabulary, not the corpus, bounds the second stage.
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(20)
  }

  register("text_bpe_pairs", Some(
    """WITH wf AS (
      |  SELECT w, count(*) AS f FROM (
      |    SELECT lower(unnest(str_split(text, ' '))) AS w FROM documents)
      |  WHERE length(w) >= 2 GROUP BY w)
      |SELECT pair, CAST(SUM(f) AS BIGINT) AS freq FROM (
      |  SELECT unnest(list_transform(range(1, length(w)),
      |    i -> substring(w, CAST(i AS INT), 2))) AS pair, f
      |  FROM wf)
      |GROUP BY pair ORDER BY freq DESC, pair LIMIT 50""".stripMargin)) { (s, dir) =>
    // One BPE merge-learning step at corpus scale (Sennrich et al. 2016:
    // learn merges from the WORD-FREQUENCY table, not the token stream).
    // Stage 1 compresses the corpus to its vocabulary — one token-keyed
    // aggregation whose shuffle carries one row per distinct word per
    // partition (map-side partial counts), the same compression every BPE
    // trainer does first. Stage 2 explodes adjacent symbol pairs over that
    // VOCABULARY-sized table and weights each pair by word frequency — at
    // 100 TB the pair stage costs O(|vocab| * avg word length), orders of
    // magnitude below the corpus scan that feeds it. The interpreted
    // transform() HOF is fine HERE because it runs on the compressed
    // domain; the corpus-sized stage 1 is pure codegen (split + explode +
    // hash agg). Top-50 pairs = TakeOrdered with a total order (pair
    // string breaks frequency ties identically in both engines).
    val wf = Tables.documents(s, dir)
      .select(explode(TF.tokens(col("text"))).as("t"))
      .select(lower(col("t")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("f"))
    wf.select(col("f"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("f")).as("freq"))
      .orderBy(col("freq").desc, col("pair"))
      .limit(50)
  }

  register("corpus_quality_cutoff", Some(
    """WITH t AS (
      |  SELECT doc_id, source, length(text) AS n,
      |    len(str_split(text, ' ')) AS n_tokens,
      |    len(list_filter(str_split(text, ' '),
      |      x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS stop_ct,
      |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_ct,
      |    n_chars
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, source,
      |    least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
      |      + least(CAST(stop_ct AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.4
      |      + (1.0 - least(CAST(punct_ct AS DOUBLE) / CAST(n AS DOUBLE) * 10.0, 1.0)) * 0.2
      |      AS quality
      |  FROM t)
      |SELECT doc_id, source, quality FROM (
      |  SELECT doc_id, source, round(quality, 6) AS quality,
      |    percent_rank() OVER (PARTITION BY source
      |      ORDER BY round(quality, 6), doc_id) AS pr,
      |    count(*) OVER (PARTITION BY source) AS n_src
      |  FROM q) WHERE n_src = 1 OR pr >= 0.1""".stripMargin)) { (s, dir) =>
    // Adaptive per-source quality floor: drop each source's bottom decile
    // rather than a fixed global threshold (sources differ in baseline
    // quality — a fixed cutoff over-prunes clean sources and under-prunes
    // noisy ones). The cutoff is RANK-based (percent_rank = (rank−1)/(n−1),
    // exact integer arithmetic identical in both engines) instead of
    // comparing against an interpolated percentile value, whose last-ulp
    // differences could flip boundary docs. BOTH engines rank the
    // 6-dp-rounded score (TF.qualityScore rounds; an unrounded oracle
    // could order two sub-ulp-apart docs differently and keep different
    // sets). Single-doc sources are exempt — percent_rank of a lone row
    // is 0 in both engines, and "drop the bottom decile" must not mean
    // "erase every tail source". One shuffle keyed by source.
    val docs = Tables.documents(s, dir)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality"), col("doc_id"))
    val wn = Window.partitionBy(col("source"))
    docs.select(col("doc_id"), col("source"),
        TF.qualityScore(col("text"), col("n_chars")).as("quality"))
      .withColumn("__pr", percent_rank().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .filter(col("__n") === 1 || col("__pr") >= 0.1)
      .drop("__pr", "__n")
  }

  register("text_entropy", Some(
    """WITH toks AS (
      |  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
      |c AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
      |n AS (SELECT doc_id, term, c, sum(c) OVER (PARTITION BY doc_id) AS n
      |      FROM c),
      |h AS (SELECT doc_id,
      |  CAST(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
      |    / 0.6931471805599453 AS DECIMAL(38,9)) AS h_term,
      |  c FROM n)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |  count(*) AS n_distinct,
      |  round(CAST(sum(h_term) AS DOUBLE), 6) AS entropy_bits
      |FROM h GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Token-distribution Shannon entropy per document (bits) — the
    // gibberish/boilerplate quality axis the ratio heuristics miss: a
    // keyboard-mash doc maxes char diversity but its TOKEN entropy
    // collapses once mashing repeats; a template doc sits far below the
    // corpus norm. Same determinism discipline as text_unigram_logprob:
    // each term's −p·log2(p) is quantized to DECIMAL(38,9) before the
    // order-free sum (ln() is not correctly-rounded cross-engine; the
    // quantum absorbs the ulp at 1000× finer than the output round), and
    // log2 divides by a LITERAL ln 2 so neither engine evaluates ln(2)
    // itself. One keyed count + one doc-partition window — two keyed
    // shuffles, no joins.
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
    val counts = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c"))
    val withN = counts.withColumn("n",
      sum(col("c")).over(Window.partitionBy(col("doc_id"))))
    val p = col("c").cast("double") / col("n")
    withN
      .withColumn("h_term",
        (-p * log(p) / lit(0.6931471805599453)).cast("decimal(38,9)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(sum(col("h_term")).cast("double"), 6).as("entropy_bits"))
  }

  register("text_stats", Some(
    """SELECT doc_id, length(text) AS n_chars_calc,
      |  len(str_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(str_split(text, ' '))) AS n_uniq_tokens,
      |  CAST(length(text) - (len(str_split(text, ' ')) - 1) AS DOUBLE)
      |    / CAST(len(str_split(text, ' ')) AS DOUBLE) AS avg_token_len
      |FROM documents""".stripMargin)) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars_calc"),
      TF.tokenCount(col("text")).as("n_tokens"),
      TF.uniqueTokenCount(col("text")).as("n_uniq_tokens"),
      TF.avgTokenLength(col("text")).as("avg_token_len"))
  }

  register("text_quality", Some(
    """WITH t AS (
      |  SELECT doc_id, n_chars, length(text) AS n,
      |    len(str_split(text, ' ')) AS n_tokens,
      |    len(list_filter(str_split(text, ' '),
      |      x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS stop_ct,
      |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_ct
      |  FROM documents)
      |SELECT doc_id, stop_ct,
      |  CAST(stop_ct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
      |  CAST(punct_ct AS DOUBLE) / CAST(n AS DOUBLE) AS punct_ratio,
      |  least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
      |    + least(CAST(stop_ct AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.4
      |    + (1.0 - least(CAST(punct_ct AS DOUBLE) / CAST(n AS DOUBLE) * 10.0, 1.0)) * 0.2
      |    AS quality
      |FROM t""".stripMargin)) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      TF.stopwordCount(col("text")).as("stop_ct"),
      TF.stopwordRatio(col("text")).as("stop_ratio"),
      TF.punctRatio(col("text")).as("punct_ratio"),
      TF.qualityScore(col("text"), col("n_chars")).as("quality"))
  }

  register("text_langid", Some {
    val scores = TF.langMarkers.map { case (lang, ms) =>
      val inList = ms.map(m => s"'$m'").mkString(",")
      s"len(list_filter(str_split(text, ' '), x -> x IN ($inList))) AS s_$lang"
    }.mkString(",\n    ")
    val langs = TF.langMarkers.map(_._1)
    val best = s"greatest(${langs.map("s_" + _).mkString(",")})"
    val cases = langs.map(l => s"WHEN s_$l = m AND m > 0 THEN '$l'").mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    $scores
       |  FROM documents),
       |m AS (SELECT *, $best AS m FROM t)
       |SELECT doc_id, lang, CASE $cases ELSE 'und' END AS pred_lang FROM m""".stripMargin
  }) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"), col("lang"), TF.langId(col("text")).as("pred_lang"))
  }

  register("text_fingerprint", Some(
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(str_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (a, c) -> (a * 31 + c) % 1000000007) AS fingerprint,
      |  CAST(list_sum(list_transform(str_split(text, ' '),
      |    w -> greatest(CAST(1 AS BIGINT), CAST(ceil(length(w) / 4.0) AS BIGINT)))) AS BIGINT)
      |    AS bpe_tokens
      |FROM documents""".stripMargin)) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      TF.fingerprint(col("text")).as("fingerprint"),
      TF.bpeTokenEstimate(col("text")).as("bpe_tokens"))
  }

  register("text_repetition", Some(
    """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
      |b AS (SELECT doc_id,
      |  unnest(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i+1])) AS g FROM t),
      |bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
      |tb AS (SELECT doc_id,
      |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
      |  FROM bc GROUP BY 1)
      |SELECT t.doc_id, len(toks) AS n_tokens,
      |  1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
      |    / CAST(len(toks) AS DOUBLE) AS dup_token_frac,
      |  coalesce(tb.top_bigram_frac, 0.0) AS top_bigram_frac
      |FROM t LEFT JOIN tb USING (doc_id)""".stripMargin)) { (s, dir) =>
    // Gopher/C4-style repetition signals: the standard filters a training
    // corpus applies before dedup. ENTIRELY scan-local: dup_token_frac is
    // codegen'd set arithmetic, and top_bigram_frac is the codegen'd
    // max-multiplicity fraction of the row's own bigram-hash array (same
    // grouping as the string bigram, collisions negligible) — zero
    // exchanges, zero joins (the earlier explode+groupBy form spent two
    // shuffles plus a doc_id join on the same signal; TextFunctionsSpec
    // proves the expression equals that form).
    Tables.documents(s, dir).select(col("doc_id"),
      TF.tokenCount(col("text")).as("n_tokens"),
      TF.dupTokenFrac(col("text")).as("dup_token_frac"),
      graft.functions.expressions.TextExpressions
        .topFreqFracNative(TF.shingleHashesAll(col("text"), 2))
        .as("top_bigram_frac"))
  }

  register("text_pseudonymize", Some(
    """WITH e AS (
      |  SELECT doc_id,
      |    text || ' from user' || CAST(doc_id % 50 AS VARCHAR) ||
      |      '@example.com to user' || CAST(doc_id % 7 AS VARCHAR) ||
      |      '@mail.org end' AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
      |    AS n_emails,
      |  md5(list_reduce(
      |    list_prepend(t, regexp_extract_all(t,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')),
      |    (acc, m) -> replace(acc, m, 'user_' || substr(md5(m), 1, 8))))
      |    AS pseudo_md5
      |FROM e""".stripMargin)) { (s, dir) =>
    // CONSISTENT pseudonymization — the privacy pass that keeps entities
    // JOINABLE: the same address maps to the same user_<md5-8> surrogate
    // in every document (doc_id%50 / doc_id%7 plant deliberate
    // cross-document collisions, like text_pii_redact plants addresses),
    // so per-entity analytics survive where <EMAIL> sentinels erase them.
    // Surrogates derive from the matched text alone — no mapping table,
    // no state, two engines agree by construction (the oracle folds the
    // identical replace over the identical match list via list_reduce).
    // Scan-local narrow pass; the fold is bounded by a doc's match count.
    val planted = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"),
        lit(" from user"), (col("doc_id") % 50).cast("string"),
        lit("@example.com to user"), (col("doc_id") % 7).cast("string"),
        lit("@mail.org end")).as("t"))
    planted.select(col("doc_id"),
      TF.countMatches(col("t"), TF.emailPattern).as("n_emails"),
      md5(TF.pseudonymizeEmails(col("t"))).as("pseudo_md5"))
  }

  register("text_pii_redact", Some(
    """WITH e AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |      '@example.com or x' || CAST(doc_id AS VARCHAR) ||
      |      '@mail.example.org phone 555-' ||
      |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |      ' see https://host' || CAST(doc_id % 7 AS VARCHAR) ||
      |      '.example.com/p/' || CAST(doc_id AS VARCHAR) || ' end' AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS INT) AS n_phones,
      |  CAST(len(regexp_extract_all(t, 'https?://[^ ]+')) AS INT) AS n_urls,
      |  md5(regexp_replace(regexp_replace(regexp_replace(t,
      |    'https?://[^ ]+', '<URL>', 'g'),
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b555-[0-9]{4}\b', '<PHONE>', 'g')) AS redacted_md5
      |FROM e""".stripMargin)) { (s, dir) =>
    // PII detection + redaction (emails / phones / URLs). The fixture text
    // carries no PII, so the query PLANTS deterministic addresses from
    // doc_id — the oracle replays the identical construction — and the
    // regex machinery (RE2-compatible patterns, global replace, typed
    // sentinels) sits under the hash compare via md5(redacted). Scan-local
    // narrow map: at 100 TB this is a zero-shuffle pass over the corpus.
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or x"), col("doc_id").cast("string"),
      lit("@mail.example.org phone 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" see https://host"), (col("doc_id") % 7).cast("string"),
      lit(".example.com/p/"), col("doc_id").cast("string"), lit(" end"))
    Tables.documents(s, dir)
      .select(col("doc_id"), planted.as("t"))
      .select(col("doc_id"),
        TF.countMatches(col("t"), TF.emailPattern).as("n_emails"),
        TF.countMatches(col("t"), TF.phonePattern).as("n_phones"),
        TF.countMatches(col("t"), TF.urlPattern).as("n_urls"),
        md5(TF.redactPii(col("t"))).as("redacted_md5"))
  }

  register("text_url_domains", Some(
    """WITH e AS (
      |  SELECT doc_id,
      |    'see https://host' || CAST(doc_id % 7 AS VARCHAR) ||
      |      '.example.com/p/' || CAST(doc_id AS VARCHAR) ||
      |      ' and https://cdn' || CAST(doc_id % 3 AS VARCHAR) ||
      |      '.example.net/x end' AS t
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[^ ]+')) AS url
      |      FROM e)
      |SELECT regexp_extract(url, 'https?://([^/ ]+)', 1) AS domain,
      |  count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs
      |FROM u GROUP BY 1""".stripMargin)) { (s, dir) =>
    // URL extraction + per-domain frequency — the link-graph slice of a
    // crawl pipeline (domain blocklists, per-site caps). Extraction is
    // scan-local; the only shuffle carries (domain, doc_id) pairs, i.e.
    // |urls| rows, partial-aggregated map-side. URLs are planted from
    // doc_id (the fixture has none) with the oracle replaying the same
    // construction.
    val planted = concat(
      lit("see https://host"), (col("doc_id") % 7).cast("string"),
      lit(".example.com/p/"), col("doc_id").cast("string"),
      lit(" and https://cdn"), (col("doc_id") % 3).cast("string"),
      lit(".example.net/x end"))
    Tables.documents(s, dir)
      .select(col("doc_id"), planted.as("t"))
      .select(col("doc_id"), explode(TF.urls(col("t"))).as("url"))
      .groupBy(TF.urlDomain(col("url")).as("domain"))
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("doc_id")).as("n_docs"))
  }

  // ==========================================================================
  // Deduplication (documents)
  // ==========================================================================

  register("dedup_exact_docs", Some(
    """SELECT source, count(*) AS n_docs,
      |  count(DISTINCT md5(text)) AS n_distinct,
      |  count(*) - count(DISTINCT md5(text)) AS n_dups
      |FROM documents GROUP BY 1""".stripMargin)) { (s, dir) =>
    Dedup.exactStats(Tables.documents(s, dir), "source")
  }

  register("dedup_exact_keep", Some(
    """SELECT doc_id, source, n_chars FROM documents
      |QUALIFY row_number() OVER
      |  (PARTITION BY md5(text) ORDER BY doc_id) = 1""".stripMargin)) { (s, dir) =>
    // The materialized form of exact dedup: keep the lowest-id
    // representative per distinct content. One shuffle on the digest.
    Dedup.exact(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  register("dedup_ngram_jaccard", Some(
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len(str_split(text, ' ')) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |        i -> array_to_string(str_split(text, ' ')[i:i+2], ' ')))
      |    ELSE [] END AS ngrams
      |  FROM documents),
      |p AS (
      |  SELECT a.source AS source,
      |    len(list_intersect(a.ngrams, b.ngrams)) AS inter,
      |    len(a.ngrams) + len(b.ngrams) - len(list_intersect(a.ngrams, b.ngrams)) AS uni
      |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id),
      |j AS (
      |  SELECT source,
      |    CASE WHEN uni > 0 THEN CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE)
      |         ELSE 0.0 END AS jac
      |  FROM p)
      |SELECT source, count(*) AS n_pairs,
      |  count(*) FILTER (WHERE jac >= 0.2) AS n_sim_pairs,
      |  CAST(SUM(CAST(jac AS DECIMAL(38,6))) AS DOUBLE) AS sum_jaccard
      |FROM j GROUP BY 1""".stripMargin)) { (s, dir) =>
    // sparse shared-ngram join — identical output to aggregating the
    // pairwise form (the oracle literally IS the pairwise form), but no
    // per-block cross product in the plan.
    Dedup.ngramJaccardStats(Tables.documents(s, dir), 3, "source",
        simThreshold = 0.2)
      .withColumnRenamed("block", "source")
  }

  register("dedup_jaccard_prefix", Some(
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len(str_split(text, ' ')) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |        i -> array_to_string(str_split(text, ' ')[i:i+2], ' ')))
      |    ELSE [] END AS ngrams
      |  FROM documents),
      |p AS (
      |  SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.ngrams, b.ngrams)) AS inter,
      |    len(a.ngrams) + len(b.ngrams)
      |      - len(list_intersect(a.ngrams, b.ngrams)) AS uni
      |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
      |SELECT source, doc_a, doc_b,
      |  round(CAST(inter AS DOUBLE) / uni, 6) AS jaccard
      |FROM p
      |WHERE uni > 0 AND CAST(inter AS DOUBLE) / uni >= 0.02""".stripMargin)) { (s, dir) =>
    // Prefix-filtered EXACT Jaccard pairs (Bayardo/Chaudhuri all-pairs):
    // candidates come only from each doc's rarest |d|−⌈τ|d|⌉+1 shingles
    // under a global rarest-first order — provably LOSSLESS pruning
    // (unlike maxDf, which trades recall), so the entry hash-matches the
    // brute-force pairwise oracle exactly. Boilerplate shingles have
    // near-maximal df, sort to the end of every document, and never
    // reach the posting-list join — the skew hazard handled exactly
    // rather than capped (pruning power grows with τ; DedupSpec's
    // boilerplate fixture shows zero admitted candidates at τ=0.5 where
    // the posting-list form materializes the full quadratic mass).
    // τ here = 0.02, the fuzzy-dedup family's operating threshold on
    // this corpus. DedupSpec proves output identity with the
    // posting-list form across thresholds.
    Dedup.prefixJaccardPairs(Tables.documents(s, dir), 3, "source",
        minJaccard = 0.02)
      .withColumnRenamed("block", "source")
      .select(col("source"), col("doc_a"), col("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  register("dedup_fuzzy_join", Some(
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN len(str_split(text, ' ')) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |        i -> array_to_string(str_split(text, ' ')[i:i+2], ' ')))
      |    ELSE [] END AS ngrams
      |  FROM documents),
      |lg AS (SELECT doc_id AS left_id, len(ngrams) AS sza,
      |         unnest(ngrams) AS g FROM d WHERE doc_id < 50),
      |rg AS (SELECT doc_id AS right_id, len(ngrams) AS szb,
      |         unnest(ngrams) AS g FROM d WHERE doc_id >= 50),
      |p AS (SELECT left_id, right_id, max(sza) AS sza, max(szb) AS szb,
      |        count(*) AS inter
      |      FROM lg JOIN rg USING (g) GROUP BY 1, 2)
      |SELECT left_id, right_id,
      |  round(CAST(inter AS DOUBLE) / (sza + szb - inter), 6) AS jaccard
      |FROM p
      |WHERE CAST(inter AS DOUBLE) / (sza + szb - inter) >= 0.02""".stripMargin)) { (s, dir) =>
    // FUZZY JOIN across two tables (record linkage / feed reconciliation):
    // the incoming slice (doc_id < 50) matched against the existing
    // corpus by exact shingle Jaccard, candidates through PPJoin prefix
    // filtering under ONE common rarest-first order over both sides'
    // union — lossless, so the entry hash-matches the brute posting-list
    // oracle exactly, with no cross product on either engine. DedupSpec
    // proves candidate completeness and brute-force identity.
    val docs = Tables.documents(s, dir)
    Dedup.fuzzyJoin(docs.filter(col("doc_id") < 50),
        docs.filter(col("doc_id") >= 50), n = 3, minJaccard = 0.02)
      .select(col("left_id"), col("right_id"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  register("dedup_containment", Some(
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len(str_split(text, ' ')) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |        i -> array_to_string(str_split(text, ' ')[i:i+2], ' ')))
      |    ELSE [] END AS ngrams
      |  FROM documents),
      |p AS (
      |  SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.ngrams, b.ngrams)) AS inter,
      |    len(a.ngrams) AS sa, len(b.ngrams) AS sb
      |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.ngrams, b.ngrams)) > 0),
      |c AS (
      |  SELECT source, doc_a AS inner_doc, doc_b AS outer_doc,
      |    CAST(inter AS DOUBLE) / sa AS containment FROM p
      |  UNION ALL
      |  SELECT source, doc_b, doc_a, CAST(inter AS DOUBLE) / sb FROM p)
      |SELECT source, inner_doc, outer_doc,
      |  round(containment, 6) AS containment
      |FROM c WHERE containment >= 0.3""".stripMargin)) { (s, dir) =>
    // DIRECTED containment (Broder 1997): |S_in ∩ S_out| / |S_in| — the
    // asymmetric near-dup measure Jaccard misses: a short doc quoted
    // verbatim inside a long one scores ~1.0 here while its Jaccard is
    // diluted by the long side's union. Same single posting-list shuffle
    // as dedup_ngram_jaccard (the direction split is a narrow projection);
    // the df cap ships ON and is non-binding at fixture scale, so the
    // brute-force pairwise oracle is computed against identical results.
    Dedup.containmentPairs(Tables.documents(s, dir), 3, "source",
        minContainment = 0.3, maxDf = Dedup.DefaultMaxDf)
      .withColumnRenamed("block", "source")
      .select(col("source"), col("inner_doc"), col("outer_doc"),
        round(col("containment"), 6).as("containment"))
  }

  register("corpus_ngram_novelty", Some(
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN len(str_split(text, ' ')) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |        i -> array_to_string(str_split(text, ' ')[i:i+2], ' ')))
      |    ELSE [] END AS ngrams
      |  FROM documents),
      |g AS (SELECT doc_id, unnest(ngrams) AS gram FROM d),
      |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
      |SELECT g.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_novel,
      |  round(CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS novelty
      |FROM g JOIN f ON g.gram = f.gram
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Marginal-content curve: per document, the fraction of its distinct
    // trigrams NOT seen in any lower-id document — the diminishing-
    // returns measurement a curation pass reads to decide when a source
    // is mined out (novelty trending to ~0 = the crawler is re-reading
    // the same site). First-occurrence attribution is one gram-keyed
    // min() (partial-agg'd — the shuffle carries distinct grams), joined
    // back to the per-doc gram stream; no windows, no self-join, two
    // keyed shuffles at any corpus size. Hashed vs string gram identity
    // agrees absent collisions, as for every n-gram entry.
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(Dedup.ngramSet(col("text"), 3)).as("g"))
    val firstSeen = grams.groupBy(col("g"))
      .agg(min(col("doc_id")).as("first_doc"))
    grams.join(firstSeen, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams"), 6))
  }

  register("dedup_weighted_jaccard", Some(
    """WITH t AS (SELECT doc_id, source, str_split(text, ' ') AS w
      |           FROM documents),
      |g AS (SELECT doc_id, source,
      |  unnest(list_transform(range(1, len(w) - 1),
      |    i -> array_to_string(w[i:i+2], ' '))) AS gram
      |  FROM t WHERE len(w) >= 3),
      |c AS (SELECT doc_id, source, gram, count(*) AS cnt
      |      FROM g GROUP BY 1, 2, 3),
      |sz AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS sz
      |       FROM c GROUP BY 1),
      |p AS (SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
      |        CAST(sum(least(a.cnt, b.cnt)) AS BIGINT) AS inter
      |      FROM c a JOIN c b ON a.source = b.source AND a.gram = b.gram
      |        AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2, 3)
      |SELECT p.source, p.doc_a, p.doc_b,
      |  round(CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter), 6)
      |    AS weighted_jaccard
      |FROM p
      |JOIN sz sa ON sa.doc_id = p.doc_a
      |JOIN sz sb ON sb.doc_id = p.doc_b
      |WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) >= 0.02"""
      .stripMargin)) { (s, dir) =>
    // MULTISET Jaccard — the frequency-aware member of the dedup family:
    // repetition changes the score where the distinct-set form is blind
    // (a paragraph pasted 40x has set-J 1.0 against the single paragraph,
    // J_w ≈ 0.025). Occurrence-indexed posting keys (gram, k<=count) make
    // the pair co-occurrence count equal Σ min(c_a,c_b) exactly — same
    // two keyed shuffles as dedup_ngram_jaccard, never a per-pair
    // multiset. The oracle replays min/max multiset arithmetic from the
    // string n-grams; hashed vs string gram identity agrees absent
    // collisions (none on the fixtures — the same contract every other
    // n-gram entry pins).
    Dedup.weightedJaccardPairs(Tables.documents(s, dir), 3, "source",
        minSim = 0.02, maxDf = Dedup.DefaultMaxDf)
      .withColumnRenamed("block", "source")
      .select(col("source"), col("doc_a"), col("doc_b"),
        round(col("weighted_jaccard"), 6).as("weighted_jaccard"))
  }

  register("dedup_edit_distance", Some(
    """WITH d AS (
      |  SELECT doc_id, source, text, length(text) AS len
      |  FROM documents WHERE length(text) >= 12),
      |g AS (
      |  SELECT doc_id, source,
      |    unnest(list_distinct(list_transform(range(1, len - 10),
      |      i -> substr(text, i, 12)))) AS gram
      |  FROM d),
      |c AS (
      |  SELECT DISTINCT a.source AS source,
      |    a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM g a JOIN g b
      |    ON a.source = b.source AND a.gram = b.gram
      |      AND a.doc_id < b.doc_id)
      |SELECT c.source, c.doc_a, c.doc_b,
      |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist
      |FROM c
      |JOIN d da ON da.doc_id = c.doc_a
      |JOIN d db ON db.doc_id = c.doc_b
      |WHERE abs(da.len - db.len) <= 60
      |  AND levenshtein(da.text, db.text) <= 60""".stripMargin)) { (s, dir) =>
    // CHARACTER-level near-dup: q-gram blocking (Gravano VLDB'01) + banded
    // Levenshtein verify — catches typo-farm/template-fill/OCR variants
    // whose token SETS barely move. Candidates are the same posting-list
    // shape as the Jaccard family (lossless for docs >= q·(d+1) chars);
    // verify is Spark's thresholded levenshtein — O(d·len) per pair, not
    // O(len²). The df cap ships ON (non-binding here: max q-gram df 53 at
    // sf0.1 vs cap 256, so the oracle's uncapped replay is identical).
    Dedup.editDistancePairs(Tables.documents(s, dir), maxDist = 60, q = 12,
        blockCol = "source", maxDf = Dedup.DefaultMaxDf)
      .withColumnRenamed("block", "source")
      .select(col("source"), col("doc_a"), col("doc_b"), col("dist"))
  }

  register("dedup_group_components", Some(
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len(str_split(text, ' ')) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |        i -> array_to_string(str_split(text, ' ')[i:i+2], ' ')))
      |    ELSE [] END AS ngrams
      |  FROM documents),
      |p AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db,
      |    len(list_intersect(a.ngrams, b.ngrams)) AS isz,
      |    len(a.ngrams) + len(b.ngrams) - len(list_intersect(a.ngrams, b.ngrams)) AS usz
      |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id),
      |e AS (
      |  SELECT da AS eu, db AS ev FROM p
      |  WHERE usz > 0 AND CAST(isz AS DOUBLE) / usz >= 0.02
      |  UNION
      |  SELECT db, da FROM p
      |  WHERE usz > 0 AND CAST(isz AS DOUBLE) / usz >= 0.02),
      |reach(ru, rv) AS (
      |  SELECT eu, ev FROM e
      |  UNION
      |  SELECT r.ru, e2.ev FROM reach r JOIN e e2 ON e2.eu = r.rv)
      |SELECT ru AS doc_id, least(ru, min(rv)) AS group_id
      |FROM reach GROUP BY ru""".stripMargin)) { (s, dir) =>
    // Near-dup GROUPS, not just pairs: posting-list candidate edges →
    // min-label propagation. The oracle's recursive CTE computes the full
    // transitive closure (|C|² per component — fine at fixture scale,
    // exactly what the iterative form avoids at corpus scale). The df cap
    // ships ON (non-binding at fixture scale — oracle unchanged; see
    // Dedup.DefaultMaxDf for the 100 TB rationale).
    val edges = Dedup.ngramSimilarPairs(Tables.documents(s, dir), 3,
      blockCol = "source", minJaccard = 0.02, maxDf = Dedup.DefaultMaxDf)
    graft.functions.Components.connectedComponents(edges, "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("component").as("group_id"))
  }

  register("corpus_dedup_fuzzy", Some(
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len(str_split(text, ' ')) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |        i -> array_to_string(str_split(text, ' ')[i:i+2], ' ')))
      |    ELSE [] END AS ngrams
      |  FROM documents),
      |p AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db,
      |    len(list_intersect(a.ngrams, b.ngrams)) AS isz,
      |    len(a.ngrams) + len(b.ngrams) - len(list_intersect(a.ngrams, b.ngrams)) AS usz
      |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id),
      |e AS (
      |  SELECT da AS eu, db AS ev FROM p
      |  WHERE usz > 0 AND CAST(isz AS DOUBLE) / usz >= 0.02
      |  UNION
      |  SELECT db, da FROM p
      |  WHERE usz > 0 AND CAST(isz AS DOUBLE) / usz >= 0.02),
      |reach(ru, rv) AS (
      |  SELECT eu, ev FROM e
      |  UNION
      |  SELECT r.ru, e2.ev FROM reach r JOIN e e2 ON e2.eu = r.rv),
      |g AS (SELECT ru AS doc_id, least(ru, min(rv)) AS gid FROM reach GROUP BY ru)
      |SELECT d2.doc_id, d2.source FROM documents d2
      |LEFT JOIN g ON d2.doc_id = g.doc_id
      |WHERE g.doc_id IS NULL OR g.gid = d2.doc_id""".stripMargin)) { (s, dir) =>
    // The END-TO-END fuzzy dedup a pipeline actually ships (the fuzzy
    // analog of dedup_exact_keep): candidate edges → connected components
    // → keep each component's smallest doc_id plus every untouched doc.
    // The component map covers only docs with a near-dup — tiny next to
    // the corpus — so AQE promotes this join to a broadcast from its
    // observed size (no hint: a FORCED broadcast would OOM on a
    // pathological corpus where most docs have near-dups, where this
    // degrades to a shuffle join). Oracle = the group query's recursive
    // CTE, finished with the representative filter.
    val docs = Tables.documents(s, dir)
    val edges = Dedup.ngramSimilarPairs(docs, 3,
      blockCol = "source", minJaccard = 0.02, maxDf = Dedup.DefaultMaxDf)
    val comp = graft.functions.Components
      .connectedComponents(edges, "doc_a", "doc_b")
    docs.join(comp, docs("doc_id") === comp("node"), "left")
      .filter(col("node").isNull || col("component") === col("doc_id"))
      .select(col("doc_id"), col("source"))
  }

  register("corpus_dedup_fuzzy_best", Some(
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len(str_split(text, ' ')) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |        i -> array_to_string(str_split(text, ' ')[i:i+2], ' ')))
      |    ELSE [] END AS ngrams
      |  FROM documents),
      |p AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db,
      |    len(list_intersect(a.ngrams, b.ngrams)) AS isz,
      |    len(a.ngrams) + len(b.ngrams) - len(list_intersect(a.ngrams, b.ngrams)) AS usz
      |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id),
      |e AS (
      |  SELECT da AS eu, db AS ev FROM p
      |  WHERE usz > 0 AND CAST(isz AS DOUBLE) / usz >= 0.02
      |  UNION
      |  SELECT db, da FROM p
      |  WHERE usz > 0 AND CAST(isz AS DOUBLE) / usz >= 0.02),
      |reach(ru, rv) AS (
      |  SELECT eu, ev FROM e
      |  UNION
      |  SELECT r.ru, e2.ev FROM reach r JOIN e e2 ON e2.eu = r.rv),
      |g AS (SELECT ru AS doc_id, least(ru, min(rv)) AS gid FROM reach GROUP BY ru),
      |t AS (
      |  SELECT doc_id, source, length(text) AS n,
      |    len(str_split(text, ' ')) AS n_tokens,
      |    len(list_filter(str_split(text, ' '),
      |      x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS stop_ct,
      |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_ct,
      |    n_chars
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, source, round(
      |    least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
      |      + least(CAST(stop_ct AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.4
      |      + (1.0 - least(CAST(punct_ct AS DOUBLE) / CAST(n AS DOUBLE) * 10.0, 1.0)) * 0.2,
      |    6) AS quality
      |  FROM t),
      |m AS (
      |  SELECT q.doc_id, q.source, q.quality,
      |    COALESCE(g.gid, q.doc_id) AS gid
      |  FROM q LEFT JOIN g ON q.doc_id = g.doc_id),
      |r AS (
      |  SELECT doc_id, source, quality, row_number() OVER (
      |    PARTITION BY gid ORDER BY quality DESC, doc_id) AS rn
      |  FROM m)
      |SELECT doc_id, source, quality FROM r WHERE rn = 1""".stripMargin)) { (s, dir) =>
    // QUALITY-AWARE fuzzy dedup: corpus_dedup_fuzzy keeps each
    // component's smallest doc_id — the arbitrary-but-deterministic
    // choice; a curation pipeline should keep the BEST copy (the
    // canonical RefinedWeb/FineWeb move: among near-dups, drop the
    // low-quality variants, not whichever crawled second). Same candidate
    // edges + connected components; the representative is argmax by
    // (6-dp-rounded quality, doc_id tiebreak). The argmax window runs
    // ONLY over component members (component map is model-sized next to
    // the corpus — AQE broadcasts both membership joins); untouched docs
    // bypass via anti-join, so no corpus-wide window exists in the plan.
    val docs = Tables.documents(s, dir)
    val edges = Dedup.ngramSimilarPairs(docs, 3,
      blockCol = "source", minJaccard = 0.02, maxDf = Dedup.DefaultMaxDf)
    val comp = graft.functions.Components
      .connectedComponents(edges, "doc_a", "doc_b")
    val scored = docs.select(col("doc_id"), col("source"),
      TF.qualityScore(col("text"), col("n_chars")).as("quality"))
    val dupBest = {
      val w = Window.partitionBy(col("component"))
        .orderBy(col("quality").desc, col("doc_id"))
      scored.join(comp, scored("doc_id") === comp("node"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("source"), col("quality"))
    }
    val untouched = scored.join(comp,
      scored("doc_id") === comp("node"), "left_anti")
    untouched.unionByName(dupBest)
  }

  register("corpus_split_leakage", Some(
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 100 AS b,
      |    CASE WHEN len(str_split(text, ' ')) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |        i -> array_to_string(str_split(text, ' ')[i:i+2], ' ')))
      |    ELSE [] END AS ngrams
      |  FROM documents),
      |s AS (SELECT doc_id,
      |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
      |  FROM d),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
      |    len(list_intersect(a.ngrams, b2.ngrams)) AS isz,
      |    len(a.ngrams) + len(b2.ngrams) - len(list_intersect(a.ngrams, b2.ngrams)) AS usz
      |  FROM d a JOIN d b2 ON a.source = b2.source AND a.doc_id < b2.doc_id)
      |SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b,
      |  round(CAST(isz AS DOUBLE) / usz, 6) AS jaccard
      |FROM p JOIN s sa ON p.doc_a = sa.doc_id JOIN s sb ON p.doc_b = sb.doc_id
      |WHERE usz > 0 AND CAST(isz AS DOUBLE) / usz >= 0.02
      |  AND sa.split <> sb.split""".stripMargin)) { (s, dir) =>
    // Split-leakage audit: near-duplicate pairs that STRADDLE the
    // content-hash train/val/test boundary — the eval-contamination a
    // document-level split cannot prevent (near-dups hash apart). Pairs
    // come from the posting-list ngram join (never a cross product); the
    // split map is a scan-local md5 bucket, so the audit adds two keyed
    // joins of the (small) pair list against doc ids. Both legs are
    // engine-portable, so the whole audit is under the DuckDB oracle.
    val docs = Tables.documents(s, dir)
    val split = graft.functions.CorpusOps.withSplit(docs)
      .select(col("doc_id"), col("split"))
    Dedup.ngramSimilarPairs(docs, 3, blockCol = "source", minJaccard = 0.02,
        maxDf = Dedup.DefaultMaxDf)
      .join(split.select(col("doc_id").as("__ida"), col("split").as("split_a")),
        col("doc_a") === col("__ida"))
      .join(split.select(col("doc_id").as("__idb"), col("split").as("split_b")),
        col("doc_b") === col("__idb"))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  register("dedup_minhash_lsh", None) { (s, dir) =>
    // Mega-bucket cap ships ON (non-binding at fixture scale — output
    // unchanged; see Dedup.DefaultMaxBucketSize for the 100 TB rationale).
    Dedup.minhashCandidates(Tables.documents(s, dir),
      shingleN = 3, k = 32, bands = 16, threshold = 0.2,
      maxBucketSize = Dedup.DefaultMaxBucketSize)
  }

  register("dedup_simhash", None) { (s, dir) =>
    // Banded (Manku-style) candidate generation — identical output to the
    // exhaustive pairwise form (DedupSpec proves equality on real data) but
    // with bucket-local joins instead of an O(n²) per-block cross product.
    Dedup.simhashBandedPairs(Tables.documents(s, dir),
      maxDistance = 3, bands = 4, blockCol = "source")
  }

  register("dedup_incremental_index", None) { (s, dir) =>
    // The PERSISTED dedup index — incremental fuzzy dedup across ingest
    // generations: signatures and band buckets computed once per doc and
    // stored; a delta joins its buckets against the layout (delta side
    // small → AQE broadcasts it, the index is scanned, never shuffled)
    // and appends itself for the next generation. DedupIndexSpec proves
    // write(day1) + newPairs(day2) == full-batch recompute EXACTLY,
    // estimates included. no_oracle (xxhash64 signatures, like the other
    // LSH entries).
    val docs = Tables.documents(s, dir)
    val day1 = docs.filter(col("doc_id") % 2 === 0)
    val day2 = docs.filter(col("doc_id") % 2 === 1)
    val path = s"$sinkRoot/dedup-index-${dir.replaceAll("[^0-9.]", "")}"
    graft.functions.DedupIndex.write(day1, path, shingleN = 3, k = 32,
      bands = 16)
    graft.functions.DedupIndex.newPairs(day2, path, threshold = 0.2,
      maxBucketSize = Dedup.DefaultMaxBucketSize)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  register("stream_dedup_minhash", None) { (s, dir) =>
    // Dedup-at-ingest: the documents feed replayed as a stream through the
    // bucket-keyed incremental LSH state op (each arrival probes only its
    // own band buckets — per-doc cost independent of corpus size), then the
    // distinct pair set. StreamingDedupSpec proves this equals the batch
    // operator's output exactly, including pairs across micro-batches;
    // xxhash64 signatures keep it outside the SQL oracle like the batch
    // LSH entry.
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.documents(s, dir).schema
    // the fixture is one parquet FILE; the file stream source wants a
    // directory, so stream the parent with a glob pinned to this table
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    // same mega-bucket cap as the batch twin (dedup_minhash_lsh): a
    // boilerplate band bucket stops ADMITTING at the cap but keeps
    // probing, so state stays bounded while pairs against admitted docs
    // still surface (cap semantics proven in StreamingDedupSpec)
    val pairs = graft.streaming.StreamingDedup.minhashCandidates(
      stream, shingleN = 3, k = 32, bands = 16, threshold = 0.2,
      maxBucketSize = graft.functions.Dedup.DefaultMaxBucketSize)
    val sink = s"stream_dedup_${dir.replaceAll("[^0-9]", "")}"
    val ckpt = s"$sinkRoot/$sink-ckpt"
    org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(ckpt), true)
    // bucket-membership state belongs off-heap at corpus scale: pin the
    // RocksDB provider for this query (the same default CdcPipeline ships)
    val q = graft.streaming.CdcPipeline.startWithConfs(
      s, Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          graft.streaming.CdcPipeline.RocksDBProvider,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
          "true",
        // keyed state here is KBs-MBs: 8 fat state stores beat 32
        // per-trigger store open/commit cycles (PipelineConfig scaladoc)
        "spark.sql.shuffle.partitions" -> "8")) {
      pairs.writeStream.queryName(sink).format("memory")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    s.table(sink)
      .groupBy(col("docA").as("doc_a"), col("docB").as("doc_b"))
      .agg(first(col("estJaccard")).as("est_jaccard"))
  }

  register("stream_ingest_day", None) { (s, dir) =>
    // The COMPOSED "one day of corpus ingest" — every stage is an operator
    // oracled/spec'd on its own elsewhere; this entry proves they STACK:
    // stream → quarantine fork (DLQ) → dedup-index gate → index append →
    // replica table → zone-mapped sink, all keyed on batchId (exactly-once
    // end-to-end; IngestDaySpec proves stream == batch-driven chain and
    // replay idempotence). Day-1 docs seed the index; day-2 streams in 2
    // micro-batches — batch 1 gates against BOTH day-1 history and batch 0,
    // so cross-batch index growth is exercised; more batches only repeat
    // the per-batch fixed costs (~15 jobs each: 5 persisted stages).
    // no_oracle (xxhash64 minhash gate), rows-only check here + the
    // spec's equivalence gates.
    import graft.streaming._
    import graft.operators.Quality
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val tag = dir.replaceAll("[^0-9.]", "")
    val base = s"$sinkRoot/stream-ingest-day-$tag"
    val docs = Tables.documents(s, dir)
    val day1 = docs.filter(col("doc_id") % 2 === 0)
    val day2 = docs.filter(col("doc_id") % 2 === 1)
    // stage day-2 as 2 flat files → 2 deterministic micro-batches
    val src = s"$base/source-2b"
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$src/_STAGED"))) {
      (0 until 2).foreach { i =>
        val tmp = s"$base/stage-tmp/b$i"
        day2.filter(pmod(col("doc_id"), lit(4L)) === 2 * i + 1)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.globStatus(
          new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet")).head.getPath
        fs.mkdirs(new org.apache.hadoop.fs.Path(src))
        fs.rename(part, new org.apache.hadoop.fs.Path(s"$src/b$i.parquet"))
      }
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/stage-tmp"), true)
      fs.create(new org.apache.hadoop.fs.Path(s"$src/_STAGED"), true).close()
    }
    // fresh mutable state per invocation => deterministic full replay
    Seq("checkpoint", "out", "dlq", "replica", "index").foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/$d"), true))
    graft.functions.DedupIndex.write(day1, s"$base/index",
      shingleN = 3, k = 32, bands = 16)
    val primary = new FileDestination(s"$base/out",
      graft.sources.OutFormat.Parquet, graft.sources.OutCompression.Snappy,
      graft.operators.KeyStrategy.Flat, zoneMapCols = Seq("doc_id"))
    val dlq = new FileDestination(s"$base/dlq",
      graft.sources.OutFormat.Parquet, graft.sources.OutCompression.Snappy,
      graft.operators.KeyStrategy.Flat)
    val stream = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = IngestDay.run(stream, s"$base/index", s"$base/replica",
        primary, dlq, checks = Seq(Quality.NotNull("text"),
          Quality.InRange("n_chars", 60, 1e12)), threshold = 0.5)
      .option("checkpointLocation", s"$base/checkpoint")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // a destination whose every batch was empty leaves only _SUCCESS
    // markers — no parquet files to infer from; count that as 0
    def countDest(p: String): Long = {
      val parts = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$p/*/part-*"))
      if (parts == null || parts.isEmpty) 0L
      else s.read.parquet(p).count()
    }
    val landed = countDest(s"$base/out")
    val quarantined = countDest(s"$base/dlq")
    val replicaRows = ReplicaTable.read(s, s"$base/replica").count()
    val gated = day2.count() - quarantined - landed
    Seq(("landed", landed), ("quarantined", quarantined),
        ("dedup_gated", gated), ("replica_rows", replicaRows))
      .toDF("stage", "n_docs").orderBy("stage")
  }

  register("stream_token_budget", None) { (s, dir) =>
    // Token-budget admission AT INGEST (the streaming twin of
    // corpus_sample_token_budget): each source admits documents in arrival
    // order until its budget is spent — state is one counter per source.
    // Arrival-order semantics are inherently streaming (the batch twin
    // ranks by content hash corpus-wide), so no SQL oracle;
    // StreamingQuotaSpec proves equality with the sequential rule,
    // cross-batch saturation, and the overshoot bound.
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.documents(s, dir).schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val admitted = graft.streaming.StreamingQuota
      .admitByTokenBudget(stream, tokensPerGroup = 800)
    val sink = s"stream_quota_${dir.replaceAll("[^0-9]", "")}"
    val ckpt = s"$sinkRoot/$sink-ckpt"
    org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(ckpt), true)
    val q = graft.streaming.CdcPipeline.startWithConfs(
      s, Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          graft.streaming.CdcPipeline.RocksDBProvider,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
          "true",
        // keyed state here is KBs-MBs: 8 fat state stores beat 32
        // per-trigger store open/commit cycles (PipelineConfig scaladoc)
        "spark.sql.shuffle.partitions" -> "8")) {
      admitted.writeStream.queryName(sink).format("memory")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    s.table(sink)
      .groupBy(col("group").as("source"))
      .agg(count(lit(1)).as("n_admitted"), sum(col("nTokens")).as("n_tokens"))
  }

  register("corpus_clean_pipeline", Some {
    val scores = TF.langMarkers.map { case (lang, ms) =>
      val inList = ms.map(m => s"'$m'").mkString(",")
      s"len(list_filter(str_split(text, ' '), x -> x IN ($inList))) AS s_$lang"
    }.mkString(",\n    ")
    val langs = TF.langMarkers.map(_._1)
    val best = s"greatest(${langs.map("s_" + _).mkString(",")})"
    val cases = langs.map(l => s"WHEN s_$l = m AND m > 0 THEN '$l'").mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id, source, lang, text,
       |    round(least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
       |      + least(CAST(len(list_filter(str_split(text, ' '),
       |          x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS DOUBLE)
       |        / CAST(len(str_split(text, ' ')) AS DOUBLE) * 5.0, 1.0) * 0.4
       |      + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
       |        / CAST(length(text) AS DOUBLE) * 10.0, 1.0)) * 0.2, 6) AS quality,
       |    $scores
       |  FROM documents),
       |m AS (SELECT *, $best AS m FROM t),
       |p AS (SELECT doc_id, source, lang, text, quality,
       |        CASE $cases ELSE 'und' END AS pred_lang FROM m),
       |q AS (SELECT * FROM p WHERE quality >= 0.5 AND pred_lang = lang),
       |d AS (SELECT * FROM q QUALIFY
       |        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
       |SELECT source, count(*) AS n_docs,
       |  CAST(SUM(CAST(list_sum(list_transform(str_split(text, ' '),
       |    w -> greatest(CAST(1 AS BIGINT), CAST(ceil(length(w) / 4.0) AS BIGINT)))) AS BIGINT)) AS BIGINT)
       |    AS total_bpe_tokens
       |FROM d GROUP BY 1""".stripMargin
  }) { (s, dir) =>
    // The composite cleaning pipeline every LLM corpus needs, chained from
    // the individual operators: quality gate -> language-agreement filter ->
    // exact dedup (keep lowest id per distinct text) -> per-source token
    // budget. All narrow except the dedup shuffle and the final aggregate.
    // corpus_clean_attrition below reports the same pipeline's per-stage
    // losses; its 'kept' bucket must agree with this entry's totals.
    val scored = Tables.documents(s, dir).select(
      col("doc_id"), col("source"), col("lang"), col("text"),
      TF.qualityScore(col("text"), col("n_chars")).as("quality"),
      TF.langId(col("text")).as("pred_lang"))
    val filtered = scored
      .filter(col("quality") >= 0.5 && col("pred_lang") === col("lang"))
    Dedup.exact(filtered)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TF.bpeTokenEstimate(col("text"))).as("total_bpe_tokens"))
  }

  register("corpus_clean_attrition", Some {
    val scores = TF.langMarkers.map { case (lang, ms) =>
      val inList = ms.map(m => s"'$m'").mkString(",")
      s"len(list_filter(str_split(text, ' '), x -> x IN ($inList))) AS s_$lang"
    }.mkString(",\n    ")
    val langs = TF.langMarkers.map(_._1)
    val best = s"greatest(${langs.map("s_" + _).mkString(",")})"
    val cases = langs.map(l => s"WHEN s_$l = m AND m > 0 THEN '$l'").mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id, source, lang, text,
       |    round(least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
       |      + least(CAST(len(list_filter(str_split(text, ' '),
       |          x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS DOUBLE)
       |        / CAST(len(str_split(text, ' ')) AS DOUBLE) * 5.0, 1.0) * 0.4
       |      + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
       |        / CAST(length(text) AS DOUBLE) * 10.0, 1.0)) * 0.2, 6) AS quality,
       |    $scores
       |  FROM documents),
       |m AS (SELECT *, $best AS m FROM t),
       |p AS (SELECT doc_id, source, lang, text, quality,
       |        CASE $cases ELSE 'und' END AS pred_lang FROM m),
       |r AS (SELECT *, CASE
       |    WHEN quality < 0.5 THEN 'quality'
       |    WHEN pred_lang <> lang THEN 'lang'
       |    WHEN count(CASE WHEN quality >= 0.5 AND pred_lang = lang THEN 1 END)
       |           OVER (PARTITION BY md5(text) ORDER BY doc_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > 0
       |      THEN 'dedup'
       |    ELSE 'kept' END AS stage FROM p)
       |SELECT source, stage, count(*) AS n_docs,
       |  CAST(SUM(CAST(list_sum(list_transform(str_split(text, ' '),
       |    w -> greatest(CAST(1 AS BIGINT), CAST(ceil(length(w) / 4.0) AS BIGINT)))) AS BIGINT)) AS BIGINT)
       |    AS total_bpe_tokens
       |FROM r GROUP BY 1, 2""".stripMargin
  }) { (s, dir) =>
    // The cleaning pipeline's WATERFALL: every document attributed to the
    // first stage that drops it (quality -> lang -> dedup), kept docs in
    // 'kept' — the attrition report a curation run publishes next to its
    // output. Same stage semantics as corpus_clean_pipeline (the 'kept'
    // bucket equals that entry's corpus); one md5(text) window + one
    // partial-aggregated groupBy, everything else scan-local.
    graft.functions.CorpusOps.cleanAttrition(Tables.documents(s, dir))
  }

  register("corpus_split", Some(
    """SELECT doc_id,
      |  CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 100 AS split_bucket,
      |  CASE WHEN CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
      |       WHEN CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents""".stripMargin)) { (s, dir) =>
    // deterministic content-hash train/val/test split (80/10/10)
    graft.functions.CorpusOps.withSplit(Tables.documents(s, dir))
      .select(col("doc_id"), col("split_bucket"), col("split"))
  }

  register("corpus_prepare_training", Some(
    """WITH d AS (
      |  SELECT doc_id, source, text, n_chars FROM documents
      |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
      |t AS (
      |  SELECT doc_id, source, text, length(text) AS n,
      |    len(str_split(text, ' ')) AS n_tokens,
      |    len(list_filter(str_split(text, ' '),
      |      x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS stop_ct,
      |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_ct,
      |    n_chars
      |  FROM d),
      |q AS (
      |  SELECT doc_id, source, text,
      |    least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
      |      + least(CAST(stop_ct AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.4
      |      + (1.0 - least(CAST(punct_ct AS DOUBLE) / CAST(n AS DOUBLE) * 10.0, 1.0)) * 0.2
      |      AS quality
      |  FROM t),
      |keep AS (
      |  SELECT doc_id, source, text FROM (
      |    SELECT doc_id, source, text, round(quality, 6) AS quality,
      |      percent_rank() OVER (PARTITION BY source
      |        ORDER BY round(quality, 6), doc_id) AS pr,
      |      count(*) OVER (PARTITION BY source) AS n_src
      |    FROM q) WHERE n_src = 1 OR pr >= 0.1),
      |tk AS (SELECT doc_id, source, str_split(text, ' ') AS toks FROM keep),
      |nn AS (SELECT doc_id, source, toks,
      |  greatest(1, CAST(ceil(CAST(len(toks) - 8 AS DOUBLE) / 24) AS INT))
      |    AS nc FROM tk),
      |c AS (SELECT doc_id, source, toks,
      |  CAST(unnest(range(0, nc)) AS INT) AS chunk_idx FROM nn)
      |SELECT doc_id, source, chunk_idx,
      |  array_to_string(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32], ' ')
      |    AS chunk_text,
      |  CAST(len(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32]) AS INT)
      |    AS chunk_tokens
      |FROM c""".stripMargin)) { (s, dir) =>
    // The CORPUS-side composition under the FULL ORACLE (the batch
    // sibling of stream_ingest_day, which is gate-composed but
    // no_oracle): exact dedup (keep lowest-id representative) → adaptive
    // per-source quality floor (bottom decile dropped, rank-based) →
    // fixed-token chunking with overlap — three individually-oracled
    // operators STACKED, with DuckDB replaying the whole nested pipeline,
    // so stage composition itself sits under the hash gate. Plan: one
    // md5-keyed window + one source-keyed window + a scan-local explode.
    val deduped = graft.functions.Dedup.exact(Tables.documents(s, dir))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality"), col("doc_id"))
    val wn = Window.partitionBy(col("source"))
    val kept = deduped.select(col("doc_id"), col("source"), col("text"),
        TF.qualityScore(col("text"), col("n_chars")).as("quality"))
      .withColumn("__pr", percent_rank().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .filter(col("__n") === 1 || col("__pr") >= 0.1)
      .select("doc_id", "source", "text")
    graft.functions.CorpusOps.chunkTokens(kept, chunkSize = 32, overlap = 8)
      .select(col("doc_id"), col("source"), col("chunk_idx"),
        col("chunk_text"), col("chunk_tokens"))
  }

  register("corpus_chunk", Some(
    """WITH t AS (SELECT doc_id, source, str_split(text, ' ') AS toks
      |           FROM documents),
      |n AS (SELECT doc_id, source, toks,
      |  greatest(1, CAST(ceil(CAST(len(toks) - 8 AS DOUBLE) / 24) AS INT))
      |    AS nc FROM t),
      |c AS (SELECT doc_id, source, toks,
      |  CAST(unnest(range(0, nc)) AS INT) AS chunk_idx FROM n)
      |SELECT doc_id, source, chunk_idx,
      |  array_to_string(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32], ' ')
      |    AS chunk_text,
      |  CAST(len(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32]) AS INT)
      |    AS chunk_tokens
      |FROM c""".stripMargin)) { (s, dir) =>
    // Fixed-token chunking with overlap — the unit an embedding/packing
    // stage consumes. One scan-local explode per doc; chunk_idx is a
    // stable key for downstream caches.
    graft.functions.CorpusOps.chunkTokens(
        Tables.documents(s, dir).select("doc_id", "source", "text"),
        chunkSize = 32, overlap = 8)
      .select(col("doc_id"), col("source"), col("chunk_idx"),
        col("chunk_text"), col("chunk_tokens"))
  }

  register("corpus_length_buckets", Some(
    """WITH t AS (
      |  SELECT doc_id, len(str_split(text, ' ')) AS n_tok FROM documents),
      |b AS (
      |  SELECT doc_id, n_tok,
      |    CASE WHEN n_tok = 1 THEN 1
      |         ELSE 1 << length(printf('%b', n_tok - 1)) END AS bucket_cap
      |  FROM t WHERE n_tok >= 1),
      |g AS (SELECT CAST(max(n_tok) AS BIGINT) AS gmax FROM b)
      |SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
      |  count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
      |  CAST(sum(bucket_cap - n_tok) AS BIGINT) AS bucket_padding,
      |  CAST(sum(g.gmax - n_tok) AS BIGINT) AS flat_padding,
      |  round(CAST(sum(bucket_cap - n_tok) AS DOUBLE) /
      |    nullif(sum(g.gmax - n_tok), 0), 6) AS padding_ratio
      |FROM b CROSS JOIN g
      |GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin)) { (s, dir) =>
    // Sequence-length bucketing — the batching-efficiency decision
    // quantified: assign each doc its power-of-2 token-capacity bucket
    // and report, per bucket, the padding a bucketed batcher pays
    // (cap − len) against pad-to-global-max. padding_ratio IS the
    // decision number a dataloader design reads. The bucket boundary is
    // INTEGER arithmetic on both engines — smallest 2^p ≥ n via the
    // bit-length of n−1 (shiftleft here, printf('%b') in the oracle) —
    // never ceil(log2(n)): libm logs differ across engines at exact
    // powers of two and would silently shift a boundary doc one bucket.
    // One scan-local bucket assignment + one partial-aggregated groupBy
    // over ~log2(max_len) buckets; the 1-row global max broadcasts back.
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), size(TF.tokens(col("text"))).as("n_tok"))
      .filter(col("n_tok") >= 1)
    val b = toks.withColumn("bucket_cap",
      when(col("n_tok") === 1, 1L).otherwise(
        // expr form: the Scala shiftleft() signature pins numBits to a
        // literal Int; SQL's accepts the bit-length column
        expr("shiftleft(CAST(1 AS BIGINT), length(bin(n_tok - 1)))")))
    val g = b.agg(max(col("n_tok")).cast("long").as("gmax"))
    b.crossJoin(broadcast(g))
      .groupBy(col("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("sum_tokens"),
        sum(col("bucket_cap") - col("n_tok")).cast("long")
          .as("bucket_padding"),
        sum(col("gmax") - col("n_tok")).cast("long").as("flat_padding"))
      .withColumn("padding_ratio",
        round(col("bucket_padding").cast("double") /
          nullif(col("flat_padding"), lit(0)), 6))
      .select(col("bucket_cap"), col("n_docs"), col("sum_tokens"),
        col("bucket_padding"), col("flat_padding"), col("padding_ratio"))
      .orderBy(col("bucket_cap"))
  }

  register("corpus_pack", Some(
    """WITH t AS (SELECT doc_id, source, str_split(text, ' ') AS toks
      |           FROM documents),
      |n AS (SELECT doc_id, source, toks,
      |  greatest(1, CAST(ceil(CAST(len(toks) - 8 AS DOUBLE) / 24) AS INT))
      |    AS nc FROM t),
      |c AS (SELECT doc_id, source,
      |  CAST(unnest(range(0, nc)) AS INT) AS chunk_idx, toks FROM n),
      |ck AS (SELECT doc_id, source, chunk_idx,
      |  CAST(len(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32]) AS INT)
      |    AS chunk_tokens FROM c),
      |r AS (SELECT *, SUM(chunk_tokens) OVER
      |  (PARTITION BY source ORDER BY doc_id, chunk_idx
      |   ROWS UNBOUNDED PRECEDING) AS e FROM ck)
      |SELECT source, CAST(FLOOR((e - chunk_tokens) / 256) AS BIGINT) AS seq_id,
      |  count(*) AS n_chunks, CAST(sum(chunk_tokens) AS BIGINT) AS n_tokens
      |FROM r GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    // Sequence packing: chunk (32 tokens, overlap 8) then pack to ~256-token
    // training sequences per source. The oracle replays the identical
    // chunk + running-sum arithmetic, so assignment matches row for row.
    val chunks = graft.functions.CorpusOps.chunkTokens(
      Tables.documents(s, dir).select("doc_id", "source", "text"),
      chunkSize = 32, overlap = 8)
    graft.functions.CorpusOps.packSequences(chunks, budget = 256)
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).as("n_tokens"))
  }

  register("corpus_pack_bestfit", None) { (s, dir) =>
    // Best-fit (FFD-in-cells) packing next to corpus_pack's greedy
    // contiguous form: the budget becomes a HARD bound (no overrun
    // sequence — greedy overruns by up to a chunk) and the sequence count
    // approaches ceil(Σtokens/budget). Bin packing is sequential, so the
    // corpus decomposes into capacity-bounded cells (one keyed window)
    // with exact FFD inside each, executor-side — no driver state.
    // no_oracle (the FFD loop isn't SQL); CorpusOpsSpec gates hard-budget,
    // losslessness, 11/9·LB+1 and fill ≥0.85, determinism, cell cuts.
    val chunks = graft.functions.CorpusOps.chunkTokens(
      Tables.documents(s, dir).select("doc_id", "source", "text"),
      chunkSize = 32, overlap = 8)
    graft.functions.CorpusOps.packSequencesBestFit(chunks, budget = 256)
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).as("n_tokens"))
  }

  register("corpus_sample_weighted", Some(
    """SELECT doc_id, source FROM documents
      |WHERE CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 100 <
      |  CASE source WHEN 'src0' THEN 30 WHEN 'src1' THEN 50 ELSE 100 END
      |""".stripMargin)) { (s, dir) =>
    // The training-mix operator: deterministic per-source downsampling by
    // content hash (re-ingestion keeps the same sample). Narrow filter —
    // no shuffle at any scale.
    graft.functions.CorpusOps.sampleWeighted(Tables.documents(s, dir),
        Map("src0" -> 30, "src1" -> 50))
      .select(col("doc_id"), col("source"))
  }

  register("corpus_sample_weighted_k", Some(
    """WITH w AS (
      |  SELECT doc_id, source, n_chars,
      |    -ln((CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) + 0.5)
      |        / 4294967296.0) / CAST(n_chars AS DOUBLE) AS es_key
      |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
      |SELECT doc_id, source, n_chars, round(es_key, 6) AS es_key
      |FROM w ORDER BY es_key, doc_id LIMIT 100""".stripMargin)) { (s, dir) =>
    // Exact-k weighted sample WITHOUT replacement (Efraimidis-Spirakis):
    // precisely 100 documents with inclusion pressure proportional to
    // n_chars — the coreset/curriculum draw the rate-based sampler can't
    // express (its count only holds in expectation). Content-hash u makes
    // the draw deterministic and engine-portable; plan = scan-local key
    // projection + TakeOrdered(k), no full sort, driver state k rows.
    graft.functions.CorpusOps.sampleWeightedK(
        Tables.documents(s, dir), k = 100, weightCol = "n_chars")
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(col("es_key"), 6).as("es_key"))
  }

  register("stream_sample_weighted_k", Some(
    """WITH w AS (
      |  SELECT doc_id, source, n_chars,
      |    -ln((CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) + 0.5)
      |        / 4294967296.0) / CAST(n_chars AS DOUBLE) AS es_key
      |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
      |SELECT doc_id, source, n_chars, round(es_key, 6) AS es_key
      |FROM w ORDER BY es_key, doc_id LIMIT 100""".stripMargin)) { (s, dir) =>
    // The STREAMING leg of corpus_sample_weighted_k, under the SAME
    // oracle: the at-ingest reservoir (k-bounded mapGroupsWithState
    // state, one snapshot per trigger) must converge to EXACTLY the
    // batch draw — deterministic E-S keys make that set equality, the
    // strongest gate a streaming operator can carry. Two triggers prove
    // cross-batch displacement (an early winner evicted by a later,
    // better draw). The final ids are decorated batch-side (identity
    // re-rank of exactly those 100 rows) — the STREAM made the
    // selection.
    import org.apache.spark.sql.streaming.Trigger
    val tag = dir.replaceAll("[^0-9.]", "")
    val base = s"$sinkRoot/stream-wsample-$tag"
    val src = s"$base/source"
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$src/_STAGED"))) {
      Tables.documents(s, dir)
        .select("doc_id", "source", "text", "n_chars")
        .repartition(4).write.mode("overwrite").json(src)
      markStaged(s, src)
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/checkpoint"), true)
    val stream = s.readStream
      .schema("doc_id long, source string, text string, n_chars long")
      .option("maxFilesPerTrigger", "2")
      .json(src)
    val snaps = graft.streaming.StreamingSample
      .weightedK(stream, k = 100, weightCol = "n_chars")
    val qname = s"stream_wsample_${tag.replace(".", "_")}"
    val q = snaps.writeStream.queryName(qname).format("memory")
      .outputMode("update")
      .option("checkpointLocation", s"$base/checkpoint")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val ids = s.table(qname).orderBy(desc("version")).limit(1)
      .select(explode(col("docIds")).as("doc_id"))
    graft.functions.CorpusOps.sampleWeightedK(
        Tables.documents(s, dir).join(ids, "doc_id"),
        k = 100, weightCol = "n_chars")
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(col("es_key"), 6).as("es_key"))
  }

  register("corpus_sample_stratified", Some(
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) AS hv
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS pick_order
      |  FROM h)
      |SELECT doc_id, lang, pick_order FROM r WHERE pick_order <= 5""".stripMargin)) { (s, dir) =>
    // Exact-count stratified sampling: precisely 5 docs per language by
    // content-hash order — balanced-eval allocation, reproducible under
    // re-ingestion, rank-limited per stratum (never a global sort)
    graft.functions.CorpusOps.sampleStratifiedExact(
        Tables.documents(s, dir), n = 5, stratumCol = "lang")
      .select(col("doc_id"), col("lang"), col("pick_order"))
  }

  register("text_unigram_logprob", Some(
    """WITH toks AS (
      |  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
      |cf AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
      |tot AS (SELECT sum(cnt) AS total FROM cf)
      |SELECT t.doc_id,
      |  round(CAST(-sum(CAST(ln(CAST(cf.cnt AS DOUBLE) / CAST(tot.total AS DOUBLE))
      |    AS DECIMAL(38,9))) AS DOUBLE) / count(*), 6) AS nll
      |FROM toks t JOIN cf ON t.term = cf.term CROSS JOIN tot
      |GROUP BY t.doc_id""".stripMargin)) { (s, dir) =>
    // Corpus-LM document scoring (the CCNet-style perplexity filter, with
    // a unigram model standing in for the LM): per-token negative
    // log-likelihood under the corpus's own unigram distribution — docs of
    // rare/garbled tokens score high, boilerplate scores low. This is the
    // STATISTICS-based quality signal next to the heuristic one
    // (corpus_quality_cutoff): two keyed shuffles (term frequencies, the
    // per-doc aggregate) at any corpus size, the 1-row total broadcast.
    // Each log term is quantized to DECIMAL(38,9) before the order-free
    // decimal sum — ln() is not correctly-rounded-guaranteed across
    // engines, and the quantum absorbs the ulp while staying 1000x finer
    // than the 6-dp output tolerance.
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"),
      explode(TF.tokens(col("text"))).as("term"))
    val cf = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val tot = cf.agg(sum("cnt").as("total"))
    toks.join(cf, "term").crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(round(
        -dsum(log(col("cnt").cast("double") / col("total").cast("double")), 9)
          / count(lit(1)), 6)
        .as("nll"))
  }

  register("text_bigram_logprob", Some(
    """WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
      |bg AS (
      |  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram, t[i] AS w1
      |  FROM toks, unnest(range(1, len(t))) AS u(i)),
      |c2 AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY 1),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
      |v AS (SELECT count(DISTINCT term) AS v FROM (
      |  SELECT unnest(str_split(text, ' ')) AS term FROM documents))
      |SELECT bg.doc_id,
      |  round(CAST(-sum(CAST(ln(
      |      (CAST(c2.c2 AS DOUBLE) + 0.5) /
      |      (CAST(c1.c1 AS DOUBLE) + 0.5 * CAST(v.v AS DOUBLE)))
      |    AS DECIMAL(38,9))) AS DOUBLE) / count(*), 6) AS nll2
      |FROM bg JOIN c2 USING (bigram) JOIN c1 USING (w1) CROSS JOIN v
      |GROUP BY bg.doc_id""".stripMargin)) { (s, dir) =>
    // Bigram-LM document scoring — one order up from the unigram filter
    // (CCNet trains a 5-gram KenLM; the bigram is the honest step this
    // fixture's vocabulary supports): per-bigram NLL under the corpus's own
    // add-1/2-smoothed conditional P(w2|w1) = (c(w1w2)+0.5)/(c(w1·)+0.5V).
    // Repetitive/templated docs score LOW (their transitions are corpus-
    // frequent), garbled docs score HIGH — a sharper signal than unigram
    // NLL, which only sees token identity. Three keyed shuffles (bigram
    // counts, context counts, the per-doc aggregate); V is a 1-row
    // broadcast; same DECIMAL(38,9) log quantization as the unigram entry
    // so the order-free sum replays bit-identically in DuckDB. Docs with
    // fewer than two tokens have no bigrams and drop out — both engines
    // agree by construction.
    val docs = Tables.documents(s, dir)
    val bg = docs.select(col("doc_id"),
        explode(TF.tokenShingles(col("text"), 2)).as("bigram"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    val c2 = bg.groupBy("bigram").agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = docs.select(explode(TF.tokens(col("text"))).as("term"))
      .agg(countDistinct(col("term")).as("v"))
    bg.join(c2, "bigram").join(c1, "w1").crossJoin(broadcast(v))
      .groupBy("doc_id")
      .agg(round(
        -dsum(log((col("c2").cast("double") + lit(0.5)) /
          (col("c1").cast("double") + lit(0.5) * col("v").cast("double"))), 9)
          / count(lit(1)), 6)
        .as("nll2"))
  }

  register("corpus_mix_temperature", Some(
    """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      |m AS (SELECT min(n) AS n_min FROM counts)
      |SELECT d.doc_id, d.lang
      |FROM documents d JOIN counts c ON d.lang = c.lang CROSS JOIN m
      |WHERE CAST(('0x' || substring(md5(d.text), 1, 8)) AS BIGINT) % 1000000
      |  < CAST(floor(1000000.0 * sqrt(CAST(m.n_min AS DOUBLE) / CAST(c.n AS DOUBLE))) AS BIGINT)""".stripMargin)) { (s, dir) =>
    // Temperature-smoothed language mix (alpha=0.5): keep sqrt(n_min/n_l)
    // of each language — the fixture's en is ~3x the others, so this
    // genuinely rebalances (en keeps ~58%, the rest ~95-100%). Counts come
    // back as a broadcast; the keep decision is a scan-local content-hash
    // threshold — reproducible, no corpus shuffle. sqrt (not pow) so the
    // threshold replays bit-identically in DuckDB.
    graft.functions.CorpusOps.sampleTemperature(
        Tables.documents(s, dir), groupCol = "lang")
      .select(col("doc_id"), col("lang"))
  }

  register("corpus_shuffle_shard", Some(
    """WITH t AS (SELECT doc_id, md5('0:' || text) AS h FROM documents),
      |s AS (SELECT doc_id, h,
      |  CAST(CAST(('0x' || substring(h, 1, 8)) AS BIGINT) % 16 AS INT) AS shard
      |  FROM t)
      |SELECT doc_id, shard,
      |  row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS ord
      |FROM s""".stripMargin)) { (s, dir) =>
    // Deterministic epoch shuffle + sharding: salted content hash drives
    // both shard assignment and within-shard order — reproducible across
    // reruns/engines, one keyed exchange (the per-shard rank window),
    // shards hash-balanced by construction. Epoch 0 here; bumping the salt
    // reshuffles everything deterministically.
    graft.functions.CorpusOps.shuffleShard(Tables.documents(s, dir), nShards = 16)
      .select(col("doc_id"), col("shard"), col("ord").cast("long").as("ord"))
  }

  register("corpus_shard_manifest", Some(
    """WITH t AS (SELECT md5('0:' || text) AS h,
      |    CAST(len(str_split(text, ' ')) AS BIGINT) AS tok FROM documents),
      |s AS (SELECT
      |    CAST(CAST(('0x' || substring(h, 1, 8)) AS BIGINT) % 16 AS INT)
      |      AS shard,
      |    tok, CAST(('0x' || substring(h, 17, 15)) AS BIGINT) AS dig FROM t)
      |SELECT shard, count(*) AS n_docs,
      |  CAST(sum(tok) AS BIGINT) AS n_tokens,
      |  bit_xor(dig) AS content_digest
      |FROM s GROUP BY shard""".stripMargin)) { (s, dir) =>
    // Reproducibility manifest for the epoch-0 shard layout: per-shard doc
    // and token counts plus an order-independent xor digest — a reader
    // fleet verifies a re-materialized epoch against this without touching
    // documents. Scan-local hashing, one partial-aggregated exchange.
    graft.functions.CorpusOps.shardManifest(Tables.documents(s, dir), nShards = 16)
  }

  register("corpus_decontaminate_semantic", Some(
    """WITH b AS (SELECT embedding AS bv FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id, embedding AS cv FROM embeddings WHERE vec_id >= 10),
      |p AS (
      |  SELECT vec_id,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(1, len(cv) + 1),
      |        i -> CAST(cv[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE))),
      |      (a, b) -> a + b) AS dot,
      |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (a, b) -> a + b)) AS ncv,
      |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(bv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (a, b) -> a + b)) AS nbv
      |  FROM c CROSS JOIN b),
      |m AS (SELECT vec_id,
      |  max(CASE WHEN ncv * nbv > 0 THEN dot / (ncv * nbv) ELSE 0.0 END)
      |    AS max_sim FROM p GROUP BY vec_id)
      |SELECT vec_id, round(max_sim, 6) AS max_sim
      |FROM m WHERE max_sim >= 0.3""".stripMargin)) { (s, dir) =>
    // Semantic decontamination: corpus rows whose embedding sits within
    // cosine 0.3 of ANY benchmark vector (vec_id < 10 plays the test set).
    // Benchmark broadcasts; corpus is scanned once through the codegen'd
    // cosine; per-doc max is a map-side partial agg. Threshold compares on
    // full precision in both engines; rounding is display-only.
    val emb = Tables.embeddings(s, dir)
    graft.functions.Similarity.decontaminateSemantic(
        emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") < 10),
        threshold = 0.3)
      .select(col("vec_id"), round(col("max_sim"), 6).as("max_sim"))
  }

  register("corpus_sample_token_budget", Some(
    """WITH t AS (SELECT doc_id, source, md5(text) AS h,
      |    CAST(len(str_split(text, ' ')) AS BIGINT) AS tok FROM documents),
      |b AS (SELECT *, CAST(('0x' || substring(h, 9, 8)) AS BIGINT) % 256
      |        AS bkt FROM t),
      |c AS (SELECT *, sum(tok) OVER (
      |    PARTITION BY source ORDER BY bkt, h, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum FROM b)
      |SELECT doc_id, source, tok AS n_tokens
      |FROM c WHERE coalesce(cum, 0) < 800""".stripMargin)) { (s, dir) =>
    // Token-budget mix: keep docs per source in content-hash order until
    // 800 tokens are spent (overshoot ≤ 1 doc). The oracle replays the
    // NAIVE one-window-per-source form; the operator runs the same total
    // order as two phases — tiny per-bucket prefix sums, scan-local
    // keep/drop for interior buckets, a window over only the boundary
    // bucket — which is the shape that survives a 100 TB source.
    graft.functions.CorpusOps.sampleTokenBudget(
        Tables.documents(s, dir), tokensPerGroup = 800)
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }

  register("corpus_snapshot_diff", Some(
    """WITH prev AS (
      |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 3),
      |curr AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 13 = 1 THEN text || ' [rev2]'
      |             ELSE text END) AS h
      |  FROM documents WHERE doc_id % 11 <> 5)
      |SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
      |  CASE WHEN p.doc_id IS NULL THEN 'added'
      |       WHEN c.doc_id IS NULL THEN 'removed'
      |       WHEN p.h = c.h THEN 'unchanged'
      |       ELSE 'changed' END AS status
      |FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id""".stripMargin)) { (s, dir) =>
    // Generation-over-generation corpus diff — the audit every incremental
    // pipeline needs before deciding what to re-process (re-embed/re-dedup
    // the added+changed delta only). Two fixture-derived generations: the
    // previous crawl is missing doc_id%7==3, the refresh drops doc_id%11==5
    // and revises doc_id%13==1. Each side reduces to (id, md5) in its scan;
    // the full-outer join moves digests, never documents.
    val docs = Tables.documents(s, dir)
    val prev = docs.filter(col("doc_id") % 7 =!= 3)
    val curr = docs.filter(col("doc_id") % 11 =!= 5)
      .withColumn("text", when(col("doc_id") % 13 === 1,
        concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
    graft.functions.CorpusOps.snapshotDiff(prev, curr)
  }

  register("corpus_source_overlap", Some(
    """WITH d AS (
      |  SELECT source, unnest(CASE WHEN len(str_split(text, ' ')) >= 3 THEN
      |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |      i -> array_to_string(str_split(text, ' ')[i:i+2], ' ')))
      |    ELSE [] END) AS g
      |  FROM documents),
      |s AS (SELECT DISTINCT source, g FROM d),
      |n AS (SELECT source, count(*) AS cnt FROM s GROUP BY 1),
      |i AS (SELECT a.source AS source_a, b.source AS source_b,
      |        count(*) AS shared
      |      FROM s a JOIN s b ON a.g = b.g AND a.source < b.source
      |      GROUP BY 1, 2)
      |SELECT na.source AS source_a, nb.source AS source_b,
      |  CAST(na.cnt AS BIGINT) AS distinct_a,
      |  CAST(nb.cnt AS BIGINT) AS distinct_b,
      |  CAST(coalesce(i.shared, 0) AS BIGINT) AS distinct_shared,
      |  round(CAST(coalesce(i.shared, 0) AS DOUBLE) /
      |    (na.cnt + nb.cnt - coalesce(i.shared, 0)), 6) AS jaccard
      |FROM n na JOIN n nb ON na.source < nb.source
      |LEFT JOIN i ON i.source_a = na.source AND i.source_b = nb.source""".stripMargin)) { (s, dir) =>
    // Source-overlap matrix — the corpus card that says WHICH sources
    // mirror each other (two crawls of the same sites, a dataset shipped
    // twice under different names) BEFORE paying for pairwise dedup.
    // One theta sketch of the distinct shingle set per source at ingest;
    // every pairwise overlap question is then set algebra on the
    // model-sized sketch table (20 sources = 190 pairs of KB-scale blobs
    // — the deliberate tiny cross join), never a corpus re-scan. Exact
    // and DuckDB-oracled below 2^lgK=65536 distinct shingles per source
    // (max here: ~11 K at sf0.1); beyond that the same plan degrades to
    // ~1/sqrt(2^lgK) RSE estimates — SketchesSpec gates that regime.
    // Estimated Jaccard from exact longs, so the division is
    // deterministic on both engines.
    val sk = Tables.documents(s, dir)
      .select(col("source"), explode(TF.shingleHashes(col("text"), 3)).as("g"))
      .groupBy("source")
      .agg(graft.functions.Sketches.thetaSketch(col("g")).as("sk"))
    sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        graft.functions.Sketches.thetaEstimate(col("a.sk"))
          .cast("long").as("distinct_a"),
        graft.functions.Sketches.thetaEstimate(col("b.sk"))
          .cast("long").as("distinct_b"),
        graft.functions.Sketches
          .thetaIntersectEstimate(col("a.sk"), col("b.sk"))
          .cast("long").as("distinct_shared"))
      .select(col("source_a"), col("source_b"), col("distinct_a"),
        col("distinct_b"), col("distinct_shared"),
        round(col("distinct_shared").cast("double") /
          (col("distinct_a") + col("distinct_b") - col("distinct_shared"))
            .cast("double"), 6).as("jaccard"))
  }

  register("corpus_cdc_chunks", None) { (s, dir) =>
    // Gear-hash content-defined chunking (FastCDC family): per source,
    // chunk count, mean chunk size, and the fraction of chunks whose hash
    // recurs corpus-wide — the storage-dedup view of duplication,
    // byte-level and ALIGNMENT-FREE (an insertion near a duplicate's
    // front re-keys every fixed window but only the chunks before CDC
    // re-synchronizes). no_oracle: the rolling gear state is not
    // SQL-replayable; TextFunctionsSpec gates losslessness (chunk bytes
    // re-sum to the document), size bounds, determinism, and the
    // shift-invariance property itself against a fixed-window strawman.
    // Plan: scan-local chunk explode, one chunk-hash frequency pass
    // (partial-aggregated), one broadcast-sized join back.
    val chunks = graft.functions.CorpusOps
      .cdcChunks(Tables.documents(s, dir), maskBits = 5, minBytes = 8,
        maxBytes = 256)
      .join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
        "doc_id")
    val dfreq = chunks.groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("df"))
    chunks.join(dfreq, "chunk_hash")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        round(sum(col("chunk_bytes")).cast("double") / count(lit(1)), 6)
          .as("avg_chunk_bytes"),
        round(count(when(col("df") >= 2, 1)).cast("double") / count(lit(1)), 6)
          .as("dup_chunk_share"))
      .orderBy(col("source"))
  }

  register("corpus_segment_dedup", Some(
    """WITH segs AS (
      |  SELECT doc_id, unnest(range(0, greatest(CAST(ceil(len(t)/10.0) AS BIGINT), 1))) AS pos, t
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |s2 AS (
      |  SELECT doc_id, pos, array_to_string(t[(pos*10+1):(pos*10+10)], ' ') AS seg
      |  FROM segs),
      |freq AS (
      |  SELECT md5(seg) AS h FROM s2 GROUP BY 1
      |  HAVING count(DISTINCT doc_id) > 1)
      |SELECT doc_id,
      |  coalesce(string_agg(CASE WHEN f.h IS NULL THEN seg END, ' ' ORDER BY pos), '') AS clean_text,
      |  count(CASE WHEN f.h IS NULL THEN 1 END) AS n_kept,
      |  count(*) AS n_total
      |FROM s2 LEFT JOIN freq f ON md5(s2.seg) = f.h
      |GROUP BY doc_id""".stripMargin)) { (s, dir) =>
    // C4/RefinedWeb-style repeated-passage removal: drop every 10-token
    // segment occurring in >1 distinct document, rebuild docs in order.
    // Frequency pass shuffles only (md5, doc_id) pairs; the frequent set
    // is boilerplate-sized and broadcasts; one doc-keyed rebuild shuffle.
    graft.functions.CorpusOps.dropRepeatedSegments(
      Tables.documents(s, dir), width = 10, maxDf = 1)
  }

  register("text_tfidf_topk", Some(
    """WITH toks AS (
      |  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf,
      |    tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |r AS (
      |  SELECT doc_id, term, tf, score,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, term) AS rn
      |  FROM scored)
      |SELECT doc_id, term, tf, score FROM r WHERE rn <= 3""".stripMargin)) { (s, dir) =>
    // tf-idf top terms — the keyword-extraction primitive; three keyed
    // shuffles (doc-term, term, doc) at any corpus size, N broadcast
    graft.functions.CorpusOps.tfIdfTopK(Tables.documents(s, dir), k = 3)
  }

  register("text_bm25_topk", Some(
    """WITH q(query_id, query_text) AS (VALUES
      |    (1, 'hash join'), (2, 'window agg merge'), (3, 'stream vector customer')),
      |qt AS (SELECT query_id,
      |    unnest(list_distinct(str_split(query_text, ' '))) AS term FROM q),
      |toks AS (SELECT doc_id, len(str_split(text, ' ')) AS dl,
      |    unnest(str_split(text, ' ')) AS term FROM documents),
      |p AS (SELECT doc_id, term, dl, count(*) AS tf FROM toks
      |      WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2, 3),
      |dft AS (SELECT term, count(*) AS df FROM p GROUP BY 1),
      |sc AS (SELECT count(*) AS n_docs,
      |    avg(CAST(len(str_split(text, ' ')) AS DOUBLE)) AS avgdl FROM documents),
      |scored AS (
      |  SELECT p.doc_id, p.term,
      |    ln(1.0 + (sc.n_docs - dft.df + 0.5) / (dft.df + 0.5)) *
      |      (p.tf * (1.2 + 1.0) / (p.tf + 1.2 *
      |        ((1.0 - 0.75) + 0.75 * p.dl / sc.avgdl))) AS term_score
      |  FROM p JOIN dft USING (term) CROSS JOIN sc),
      |pq AS (SELECT qt.query_id, s.doc_id, sum(s.term_score) AS score
      |       FROM scored s JOIN qt USING (term) GROUP BY 1, 2),
      |r AS (SELECT query_id, doc_id, score,
      |        row_number() OVER (PARTITION BY query_id
      |          ORDER BY round(score, 6) DESC, doc_id) AS rank FROM pq)
      |SELECT query_id, doc_id, score, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 10""".stripMargin)) { (s, dir) =>
    // Okapi BM25 top-k retrieval — the decontamination/eval-lookup IR
    // primitive. Query terms broadcast; only matching postings shuffle;
    // the per-query ranking is WindowGroupLimit-bounded.
    import s.implicits._
    val queries = Seq(
      (1, "hash join"), (2, "window agg merge"), (3, "stream vector customer"))
      .toDF("query_id", "query_text")
    graft.functions.Search.bm25TopK(Tables.documents(s, dir), queries, k = 10)
  }

  register("corpus_dsir_weights", Some(
    """WITH d AS (SELECT doc_id, (lang = 'en') AS is_target,
      |    str_split(text, ' ') AS t FROM documents),
      |f AS (SELECT doc_id, is_target,
      |    unnest(list_transform(range(1, len(t)), i ->
      |      CAST(('0x' || substring(md5(array_to_string(t[i:i+1], ' ')), 1, 8))
      |        AS BIGINT) % 8192)) AS bkt
      |  FROM d WHERE len(t) >= 2),
      |bc AS (SELECT bkt, count(*) AS raw_n,
      |    count(*) FILTER (WHERE is_target) AS tgt_n FROM f GROUP BY 1),
      |tot AS (SELECT sum(raw_n) AS raw_total, sum(tgt_n) AS tgt_total FROM bc),
      |lr AS (SELECT bkt,
      |    ln((tgt_n + 0.5) / (tgt_total + 0.5 * 8192)) -
      |    ln((raw_n + 0.5) / (raw_total + 0.5 * 8192)) AS lr
      |  FROM bc CROSS JOIN tot),
      |w AS (SELECT doc_id, count(*) AS n_feats, sum(lr) AS dsir_weight
      |      FROM f JOIN lr USING (bkt) GROUP BY 1)
      |SELECT d.doc_id, d.is_target,
      |  coalesce(w.n_feats, 0) AS n_feats,
      |  coalesce(w.dsir_weight, 0.0) AS dsir_weight
      |FROM d LEFT JOIN w USING (doc_id)""".stripMargin)) { (s, dir) =>
    // DSIR importance weights (Xie et al. 2023): hashed-bigram likelihood
    // ratio of the English slice vs the whole corpus. One bucket-count
    // shuffle (8192-bounded), broadcast ratio table, doc-keyed sum.
    graft.functions.CorpusOps.dsirWeights(
      Tables.documents(s, dir), isTarget = col("lang") === "en")
  }

  register("corpus_dsir_resample", Some(
    """WITH d AS (SELECT doc_id, (lang = 'en') AS is_target, text,
      |    str_split(text, ' ') AS t FROM documents),
      |f AS (SELECT doc_id, is_target,
      |    unnest(list_transform(range(1, len(t)), i ->
      |      CAST(('0x' || substring(md5(array_to_string(t[i:i+1], ' ')), 1, 8))
      |        AS BIGINT) % 8192)) AS bkt
      |  FROM d WHERE len(t) >= 2),
      |bc AS (SELECT bkt, count(*) AS raw_n,
      |    count(*) FILTER (WHERE is_target) AS tgt_n FROM f GROUP BY 1),
      |tot AS (SELECT sum(raw_n) AS raw_total, sum(tgt_n) AS tgt_total FROM bc),
      |lr AS (SELECT bkt,
      |    ln((tgt_n + 0.5) / (tgt_total + 0.5 * 8192)) -
      |    ln((raw_n + 0.5) / (raw_total + 0.5 * 8192)) AS lr
      |  FROM bc CROSS JOIN tot),
      |w AS (SELECT doc_id, sum(lr) AS dsir_weight
      |      FROM f JOIN lr USING (bkt) GROUP BY 1),
      |sk AS (SELECT d.doc_id, d.is_target,
      |    coalesce(w.dsir_weight, 0.0) AS dsir_weight,
      |    coalesce(w.dsir_weight, 0.0) / 1.0 +
      |      (-ln(-ln((CAST(('0x' || substring(md5('gumbel:0:' || d.text), 1, 8))
      |        AS BIGINT) + 0.5) / 4294967296.0))) AS sample_key
      |  FROM d LEFT JOIN w USING (doc_id))
      |SELECT doc_id, is_target, dsir_weight, sample_key FROM sk
      |ORDER BY sample_key DESC, doc_id LIMIT 50""".stripMargin)) { (s, dir) =>
    // the DSIR selection step: Gumbel-top-k (sample 50 docs WITHOUT
    // replacement, probability ∝ exp(weight/T)) as one k-bounded
    // TakeOrdered over a salted-hash Gumbel — deterministic, content-keyed
    val docs = Tables.documents(s, dir)
    val weighted = docs.join(
      graft.functions.CorpusOps.dsirWeights(docs, isTarget = col("lang") === "en")
        .select(col("doc_id"), col("is_target"), col("dsir_weight")),
      "doc_id")
    graft.functions.CorpusOps.dsirResample(weighted, k = 50)
      .select(col("doc_id"), col("is_target"), col("dsir_weight"),
        col("sample_key"))
  }

  register("corpus_repeated_spans", Some(
    """WITH d AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
      |g AS (SELECT doc_id, unnest(range(0, len(t) - 4)) AS pos, t
      |      FROM d WHERE len(t) >= 5),
      |g2 AS (SELECT doc_id, pos,
      |    md5(array_to_string(t[(pos + 1):(pos + 5)], ' ')) AS h FROM g),
      |rep AS (SELECT h FROM g2 GROUP BY h
      |        HAVING count(DISTINCT doc_id) >= 2),
      |m AS (SELECT doc_id, pos FROM g2 JOIN rep USING (h)),
      |isl AS (SELECT doc_id, pos,
      |    CASE WHEN pos - lag(pos) OVER
      |      (PARTITION BY doc_id ORDER BY pos) > 5 THEN 1 ELSE 0 END AS brk
      |  FROM m),
      |isl2 AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
      |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM isl),
      |sp AS (SELECT doc_id, island, max(pos) - min(pos) + 5 AS span_len
      |       FROM isl2 GROUP BY 1, 2),
      |agg AS (SELECT doc_id, count(*) AS n_spans,
      |    CAST(sum(span_len) AS BIGINT) AS covered_tokens,
      |    CAST(max(span_len) AS BIGINT) AS max_span_len FROM sp GROUP BY 1)
      |SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
      |  coalesce(agg.n_spans, 0) AS n_spans,
      |  coalesce(agg.covered_tokens, 0) AS covered_tokens,
      |  coalesce(agg.max_span_len, 0) AS max_span_len
      |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin)) { (s, dir) =>
    // stride-1 shingle approximation of exact-substring dedup (Lee et al.
    // 2022): cross-doc repeated width-5 windows merged into maximal spans
    // (gaps-and-islands, one doc-keyed exchange). Integer-only output.
    graft.functions.CorpusOps.repeatedSpans(Tables.documents(s, dir), width = 5)
  }

  register("corpus_strip_repeated_spans", Some(
    """WITH d AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
      |g AS (SELECT doc_id, unnest(range(0, len(t) - 4)) AS pos, t
      |      FROM d WHERE len(t) >= 5),
      |g2 AS (SELECT doc_id, pos,
      |    md5(array_to_string(t[(pos + 1):(pos + 5)], ' ')) AS h FROM g),
      |rep AS (SELECT h FROM g2 GROUP BY h
      |        HAVING count(DISTINCT doc_id) >= 2),
      |cov AS (SELECT DISTINCT doc_id, unnest(range(pos + 1, pos + 6)) AS tp
      |        FROM g2 JOIN rep USING (h)),
      |tk AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS tp, t FROM d),
      |tok AS (SELECT doc_id, tp, t[tp] AS token FROM tk)
      |SELECT tok.doc_id,
      |  coalesce(string_agg(CASE WHEN cov.tp IS NULL THEN tok.token END,
      |    ' ' ORDER BY tok.tp), '') AS clean_text,
      |  count(CASE WHEN cov.tp IS NULL THEN 1 END) AS n_kept,
      |  count(*) AS n_tokens
      |FROM tok LEFT JOIN cov
      |  ON tok.doc_id = cov.doc_id AND tok.tp = cov.tp
      |GROUP BY tok.doc_id""".stripMargin)) { (s, dir) =>
    // The ACT half of corpus_repeated_spans (Lee et al. 2022 substring
    // dedup at shingle resolution): every token covered by a cross-doc
    // repeated width-5 window is stripped from every document and the
    // text rebuilt in order — catching boilerplate at ANY alignment,
    // where the fixed-grid segment dedup needs it to start on a
    // boundary. Marked windows merge to maximal islands BEFORE the
    // covered-position explode, so the blow-up is covered-tokens-bounded.
    graft.functions.CorpusOps.stripRepeatedSpans(
      Tables.documents(s, dir), width = 5)
  }

  register("corpus_decontaminate", Some(
    """WITH s AS (
      |  SELECT doc_id, unnest(CASE WHEN len(str_split(text, ' ')) >= 4 THEN
      |      list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 2),
      |        i -> array_to_string(str_split(text, ' ')[i:i+3], ' ')))
      |    ELSE [] END) AS g
      |  FROM documents),
      |b AS (SELECT DISTINCT g FROM s WHERE doc_id < 10)
      |SELECT s.doc_id, count(DISTINCT s.g) AS n_shared_shingles
      |FROM s JOIN b USING (g) WHERE s.doc_id >= 10
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // benchmark decontamination: docs sharing any 4-gram with the
    // benchmark slice (doc_id < 10) — posting-list semi-join on shingles
    val docs = Tables.documents(s, dir)
    graft.functions.CorpusOps.contaminated(
      docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10), n = 4)
  }

  register("corpus_decontaminate_bloom", Some(
    """WITH s AS (
      |  SELECT doc_id, unnest(CASE WHEN len(str_split(text, ' ')) >= 4 THEN
      |      list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 2),
      |        i -> array_to_string(str_split(text, ' ')[i:i+3], ' ')))
      |    ELSE [] END) AS g
      |  FROM documents),
      |b AS (SELECT DISTINCT g FROM s WHERE doc_id < 10)
      |SELECT s.doc_id, count(DISTINCT s.g) AS n_shared_shingles
      |FROM s JOIN b USING (g) WHERE s.doc_id >= 10
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // the 100 TB decontamination shape: a broadcast Bloom filter over the
    // benchmark's shingles drops clean corpus shingles inside the scan
    // stage (codegen'd probe), the exact confirm join removes the fpp
    // fraction — so the oracle is the SAME SQL as corpus_decontaminate,
    // not an approximation.
    val docs = Tables.documents(s, dir)
    graft.functions.CorpusOps.contaminatedBloom(
      docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10), n = 4)
  }

  register("dedup_embedding_neardup", Some(
    """WITH p AS (
      | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |   list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |     list_transform(range(1, len(a.embedding) + 1),
      |       i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
      |     (x, y) -> x + y) AS dot,
      |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |     list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |     (x, y) -> x + y)) AS nx,
      |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |     list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |     (x, y) -> x + y)) AS ny
      | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      |SELECT vec_a, vec_b,
      |  round(CASE WHEN nx * ny > 0 THEN dot / (nx * ny) ELSE 0.0 END, 6) AS cos_sim
      |FROM p
      |WHERE CASE WHEN nx * ny > 0 THEN dot / (nx * ny) ELSE 0.0 END >= 0.4""".stripMargin)) { (s, dir) =>
    // Embedding-cosine near-duplicate pairs, EXACT — computed as the
    // block-partitioned pairwise equi-join (Similarity.cosineThresholdPairs):
    // identical output to the all-pairs form the oracle replays, but the
    // n²/2 scoring distributes over block-pair tasks with bounded memory
    // and NO BroadcastNestedLoopJoin (PlanAuditSpec asserts the shape).
    // LSH candidates are deliberately NOT used here: exact output at a
    // threshold the pair-cosine mass straddles needs exact enumeration
    // (see the cosineThresholdPairs scaladoc).
    Similarity.cosineThresholdPairs(Tables.embeddings(s, dir), 0.4)
      .select(col("vec_a"), col("vec_b"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  // ==========================================================================
  // Multimodal columns (binary payloads + typed metadata; decode stubbed)
  // ==========================================================================

  register("mm_payload_stats", Some(
    """SELECT doc_id AS asset_id,
      |  (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
      |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
      |  md5(text) AS content_md5,
      |  upper(hex(CAST(substring(text, 1, 4) AS BLOB))) AS magic,
      |  (['jpeg','wav','mp4'])[CAST(doc_id % 3 AS INT) + 1] AS format,
      |  (doc_id * 31) % 60000 + 1000 AS duration_ms
      |FROM documents""".stripMargin)) { (s, dir) =>
    Multimodal.payloadStats(
      Multimodal.assetsFromDocuments(Tables.documents(s, dir)))
      .drop("content_xxh64") // no engine-portable xxhash64 in the oracle
  }

  register("mm_frame_sample", Some(
    """WITH v AS (
      |  SELECT doc_id AS asset_id, (doc_id * 31) % 60000 + 1000 AS duration_ms
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT asset_id, duration_ms,
      |  unnest(range(0, duration_ms, 5000)) AS frame_ts_ms,
      |  CAST(unnest(range(0, duration_ms, 5000)) AS DOUBLE) / 1000.0
      |    AS frame_ts_sec
      |FROM v""".stripMargin)) { (s, dir) =>
    Multimodal.frameSamplePlan(
      Multimodal.assetsFromDocuments(Tables.documents(s, dir)), everyMs = 5000)
  }

  // ==========================================================================
  // Similarity search (embeddings)
  // ==========================================================================

  register("embed_cosine_topk", Some(
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
      |           FROM embeddings WHERE vec_id < 8),
      |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      |p AS (
      |  SELECT query_id, neighbor_id,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(1, len(qv) + 1),
      |        i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))),
      |      (a, b) -> a + b) AS dot,
      |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (a, b) -> a + b)) AS nq,
      |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (a, b) -> a + b)) AS nc
      |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
      |s AS (SELECT query_id, neighbor_id,
      |  CASE WHEN nq * nc > 0 THEN dot / (nq * nc) ELSE 0.0 END AS cs FROM p),
      |r AS (SELECT query_id, neighbor_id, cs,
      |  row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id)
      |    AS rank FROM s)
      |SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim, rank
      |FROM r WHERE rank <= 5""".stripMargin)) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    // round AFTER ranking so the order is decided on full-precision doubles
    // (bit-identical in both engines: same fold order, all-double math).
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
      .withColumn("cos_sim", round(col("cos_sim"), 6))
  }

  register("embed_cosine_topk_sql", Some(sql("embed_cosine_topk"))) { (s, dir) =>
    // The same top-k THROUGH THE SQL SURFACE: cosine_similarity is the
    // native codegen'd expression registered by GraftExtensions, called
    // from spark.sql — so the extension path itself sits under the DuckDB
    // oracle (identical SQL oracle as embed_cosine_topk).
    GraftExtensions.register(s)
    Tables.embeddings(s, dir).createOrReplaceTempView("embeddings_v")
    s.sql("""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                 FROM embeddings_v WHERE vec_id < 8),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings_v),
      scored AS (
        SELECT query_id, neighbor_id,
          cosine_similarity(qv, cv) AS cos_sim
        FROM c JOIN q ON query_id <> neighbor_id),
      r AS (SELECT query_id, neighbor_id, cos_sim,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cos_sim DESC, neighbor_id) AS rank FROM scored)
      SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim, rank
      FROM r WHERE rank <= 5""")
  }

  register("embed_bitext_margin", Some(
    """WITH x AS (SELECT vec_id AS x_id, embedding AS xv
      |           FROM embeddings WHERE vec_id % 2 = 0),
      |y AS (SELECT vec_id AS y_id, embedding AS yv
      |      FROM embeddings WHERE vec_id % 2 = 1),
      |p0 AS (
      |  SELECT x_id, y_id,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(1, len(xv) + 1),
      |        i -> CAST(xv[i] AS DOUBLE) * CAST(yv[i] AS DOUBLE))),
      |      (a, b) -> a + b) AS dot,
      |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(xv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
      |      (a, b) -> a + b)) AS nx,
      |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(yv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
      |      (a, b) -> a + b)) AS ny
      |  FROM x CROSS JOIN y),
      |p AS (SELECT x_id, y_id,
      |  CASE WHEN nx * ny > 0 THEN dot / (nx * ny) ELSE 0.0 END AS cs
      |  FROM p0),
      |fr AS (SELECT x_id, y_id, cs,
      |  row_number() OVER (PARTITION BY x_id ORDER BY cs DESC, y_id) AS r
      |  FROM p),
      |br AS (SELECT x_id, y_id, cs,
      |  row_number() OVER (PARTITION BY y_id ORDER BY cs DESC, x_id) AS r
      |  FROM p),
      |mx AS (SELECT x_id,
      |  CAST(sum(CAST(cs AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS mx
      |  FROM fr WHERE r <= 4 GROUP BY 1),
      |my AS (SELECT y_id,
      |  CAST(sum(CAST(cs AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS my
      |  FROM br WHERE r <= 4 GROUP BY 1),
      |c AS (SELECT f.x_id, f.y_id, f.cs,
      |  f.cs / ((mx.mx + my.my) / 2) AS margin
      |  FROM fr f JOIN mx ON f.x_id = mx.x_id JOIN my ON f.y_id = my.y_id
      |  WHERE f.r <= 4),
      |rr AS (SELECT x_id, y_id, cs, margin,
      |  row_number() OVER (PARTITION BY x_id
      |    ORDER BY round(margin, 6) DESC, y_id) AS rk FROM c)
      |SELECT x_id, y_id, round(cs, 6) AS cos_sim, round(margin, 6) AS margin
      |FROM rr WHERE rk = 1 AND round(margin, 6) >= 1.0""".stripMargin)) {
    (s, dir) =>
      // Ratio-margin pair mining (the bitext-mining criterion) between the
      // even- and odd-id halves of the embedding corpus: each x keeps its
      // best y by cos(x,y) normalized by both endpoints' top-4 mean
      // similarity — the hubness-robust score. All-pairs scoring runs as
      // the block-pair equi-join (bounded per-task memory, no corpus
      // broadcast), both directions' neighbourhoods come from the bounded-
      // heap CollectTopK aggregate, and the means are decimal-routed so
      // fold order can't move a margin. Margin ranks on its 1e-6 quantum
      // with an id tiebreak — the same both-engines-stable ordering rule
      // as text_bm25_topk.
      val emb = Tables.embeddings(s, dir)
      graft.functions.Similarity.marginMine(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        k = 4, minMargin = 1.0)
  }

  register("embed_ann_lsh", None) { (s, dir) =>
    // Parameters from a measured recall/cost sweep (see BENCH_NOTES —
    // round 5): 6 bits × 10 tables + Hamming-1 multiprobe holds recall
    // 0.90-0.93 across all three fixture scales (SimilaritySpec keeps the
    // ≥0.8 gate) at a candidate fraction of ~0.68, while writing the corpus
    // into 10 tables instead of the previous 12 and probing 7 buckets/table
    // instead of 8. At larger corpus scale raise nPlanes to keep bucket
    // occupancy (|corpus| / 2^nPlanes) bounded and add tables to hold
    // recall.
    val emb = Tables.embeddings(s, dir)
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8), k = 5,
      nPlanes = 6, nTables = 10)
  }

  register("mm_embed_neardup", None) { (s, dir) =>
    // The end-to-end multimodal flow a training corpus runs: binary
    // payloads -> batched per-partition decode+embed (honest STUB for the
    // codec/encoder; dataflow real) -> top-10 closest pairs from the
    // block-partitioned exact pairwise join (byte-identical payloads embed
    // identically, cos 1.0, and rank first; this fixture happens to carry
    // none, so the closest stub pairs surface instead of an empty result).
    // no_oracle (mapPartitions Dataset); MultimodalSpec gates determinism
    // and the duplicate <-> cos 1.0 pair equivalence on constructed data.
    val feats = graft.functions.Multimodal.imageFeatures(
      graft.functions.Multimodal.assetsFromDocuments(Tables.documents(s, dir)))
    val vecs = feats.toDF()
      .select(col("assetId").as("vec_id"), col("embedding"))
    Similarity.cosineThresholdPairs(vecs, threshold = -1.0, nBlocks = 8)
      .orderBy(col("cos_sim").desc, col("vec_a"), col("vec_b"))
      .limit(10)
  }

  register("mm_dhash_neardup", None) { (s, dir) =>
    // Perceptual image dedup: per-image 64-bit dHash (9x8 luma-gradient
    // grid — real decode for real images, deterministic stub for the
    // fixture's text-blob payloads) -> banded Hamming blocking (pigeonhole
    // over 4 x 16-bit bands, lossless at maxDistance < bands) -> exact
    // bit_count verify. The image sibling of dedup_simhash: re-encodes and
    // mild edits land within a few bits where byte hashes see brand-new
    // payloads. no_oracle (binary decode path); MultimodalSpec gates
    // banded==exhaustive, real-PNG perturbation distance, and the
    // stub's distance-0 == exact-dup-pairs equivalence. A real image
    // corpus calls this with maxDistance=3, bands=4 (lossless pigeonhole);
    // the fixture's text-blob payloads stub-hash uniformly, so — like
    // mm_embed_neardup — the entry surfaces the 10 CLOSEST banded
    // candidates (16 x 4-bit bands admit ~2/3 of pairs) instead of an
    // empty thresholded set; byte-identical payloads rank first at 0.
    val assets = graft.functions.Multimodal.assetsFromDocuments(
      Tables.documents(s, dir))
    val hashes = graft.functions.Multimodal.imageDHashes(assets)
    graft.functions.Multimodal.dhashNearDupPairs(hashes,
        maxDistance = 64, bands = 16)
      .orderBy(col("distance"), col("asset_a"), col("asset_b"))
      .limit(10)
  }

  register("mm_audio_levels", None) { (s, dir) =>
    // Audio-level curation stats: batched per-partition decode via
    // javax.sound.sampled — REAL WAV decode (rate/channels/duration from
    // the stream header, RMS + peak from one normalized-PCM pass over the
    // samples), deterministic stub for payloads the reader rejects (this
    // fixture's text-blob payloads; flagged decoded=false). no_oracle
    // (mapPartitions Dataset over a JVM codec); MultimodalSpec gates the
    // real-decode path on a planted half-scale square wave (RMS == peak
    // == 0.5, header rate beats lying metadata) and stub determinism.
    graft.functions.Multimodal.audioFeatures(
        graft.functions.Multimodal.assetsFromDocuments(
          Tables.documents(s, dir)))
      .toDF()
      .orderBy(col("assetId"))
      .limit(100)
  }

  register("mm_video_meta", None) { (s, dir) =>
    // Video container stats: batched per-partition ISO-BMFF box walking —
    // REAL MP4/MOV header parse (duration from moov/mvhd, dimensions and
    // track count from trak/tkhd; no frame decode — per-asset work is the
    // box walk, independent of media size), deterministic stub for
    // payloads that don't parse (this fixture's text blobs; flagged
    // decoded=false). no_oracle (mapPartitions Dataset); MultimodalSpec
    // gates the real parse on a hand-assembled MP4 (header beats lying
    // metadata) and stub determinism.
    graft.functions.Multimodal.videoMeta(
        graft.functions.Multimodal.assetsFromDocuments(
          Tables.documents(s, dir)))
      .toDF()
      .orderBy(col("assetId"))
      .limit(100)
  }

  register("embed_quantized_topk", Some(
    """WITH base AS (
      |  SELECT vec_id, list_transform(embedding, x ->
      |    round(127.0 * CAST(x AS DOUBLE) /
      |      list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))))) AS qv
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, qv AS qqv FROM base WHERE vec_id < 8),
      |c AS (SELECT vec_id AS neighbor_id, qv AS cqv FROM base),
      |p AS (
      |  SELECT query_id, neighbor_id,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(1, len(qqv) + 1), i -> qqv[i] * cqv[i])),
      |      (a, b) -> a + b) AS dot,
      |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(qqv, x -> x * x)), (a, b) -> a + b)) AS nq,
      |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(cqv, x -> x * x)), (a, b) -> a + b)) AS nc
      |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
      |s AS (SELECT query_id, neighbor_id,
      |  CASE WHEN nq * nc > 0 THEN dot / (nq * nc) ELSE 0.0 END AS cs FROM p),
      |r AS (SELECT query_id, neighbor_id, cs,
      |  row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id)
      |    AS rank FROM s)
      |SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim, rank
      |FROM r WHERE rank <= 5""".stripMargin)) { (s, dir) =>
    // Top-k over int8-QUANTIZED embeddings — the 4×-smaller storage/shuffle
    // representation (Quantize.toInt8). Cosine is scale-invariant so the
    // int8 codes are scored directly (re-widened to float, exact ≤ 127);
    // the oracle replays the identical round(127·x/max|x|) quantizer and
    // cosine in DuckDB, so quantization arithmetic itself sits under the
    // hash compare. QuantizeSpec gates the semantic property (overlap vs
    // exact top-k) separately.
    val quant = graft.functions.Quantize.toInt8(Tables.embeddings(s, dir))
      .select(col("vec_id"),
        graft.functions.Quantize.asFloats(col("qvec")).as("embedding"))
    Similarity.bruteForceTopK(quant, quant.filter(col("vec_id") < 8), k = 5)
      .withColumn("cos_sim", round(col("cos_sim"), 6))
  }

  register("embed_rproj_neardup", Some(
    """WITH proj AS (
      |  SELECT vec_id, list_transform(range(0, 8), j ->
      |    CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(0, 64), i ->
      |        (CASE WHEN CAST(('0x' || substring(md5(
      |            'rp:0:' || CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)),
      |            1, 8)) AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END)
      |        * CAST(embedding[i + 1] AS DOUBLE))),
      |      (x, y) -> x + y) / sqrt(8.0) AS FLOAT)) AS p
      |  FROM embeddings),
      |pairs AS (
      | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |   list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |     list_transform(range(1, len(a.p) + 1),
      |       i -> CAST(a.p[i] AS DOUBLE) * CAST(b.p[i] AS DOUBLE))),
      |     (x, y) -> x + y) AS dot,
      |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |     list_transform(a.p, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |     (x, y) -> x + y)) AS nx,
      |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |     list_transform(b.p, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |     (x, y) -> x + y)) AS ny
      | FROM proj a JOIN proj b ON a.vec_id < b.vec_id)
      |SELECT vec_a, vec_b,
      |  round(CASE WHEN nx * ny > 0 THEN dot / (nx * ny) ELSE 0.0 END, 6) AS cos_sim
      |FROM pairs
      |WHERE CASE WHEN nx * ny > 0 THEN dot / (nx * ny) ELSE 0.0 END >= 0.8""".stripMargin)) { (s, dir) =>
    // JL random projection 64 -> 8 dims (codegen'd RandomProject; the md5
    // sign matrix rebuilds identically in the oracle), then exact
    // near-dup pairs on the PROJECTED vectors via the block-partitioned
    // pairwise join — the compress-before-ANN shape: at 100 TB the
    // projection is a narrow 8×-smaller pass and candidates re-rank on
    // full vectors (embed_rproj_rerank). Projection arithmetic itself sits
    // under the hash compare; SimilaritySpec gates the JL distortion bound.
    val proj = Tables.embeddings(s, dir).select(col("vec_id"),
      graft.functions.Quantize.randomProject(
        col("embedding"), outDim = 8, inDim = 64).as("embedding"))
    Similarity.cosineThresholdPairs(proj, 0.8)
      .select(col("vec_a"), col("vec_b"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  register("embed_rproj_rerank", Some(
    """WITH proj AS (
      |  SELECT vec_id, list_transform(range(0, 16), j ->
      |    CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(0, 64), i ->
      |        (CASE WHEN CAST(('0x' || substring(md5(
      |            'rp:0:' || CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)),
      |            1, 8)) AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END)
      |        * CAST(embedding[i + 1] AS DOUBLE))),
      |      (x, y) -> x + y) / sqrt(16.0) AS FLOAT)) AS p
      |  FROM embeddings),
      |cand AS (
      | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      | FROM proj a JOIN proj b ON a.vec_id < b.vec_id
      | WHERE (CASE WHEN
      |     sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |       list_transform(a.p, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |       (x, y) -> x + y)) *
      |     sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |       list_transform(b.p, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |       (x, y) -> x + y)) > 0
      |   THEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |       list_transform(range(1, len(a.p) + 1),
      |         i -> CAST(a.p[i] AS DOUBLE) * CAST(b.p[i] AS DOUBLE))),
      |       (x, y) -> x + y) /
      |     (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |       list_transform(a.p, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |       (x, y) -> x + y)) *
      |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |       list_transform(b.p, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |       (x, y) -> x + y)))
      |   ELSE 0.0 END) >= 0.15),
      |rer AS (
      | SELECT c.vec_a, c.vec_b,
      |   list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |     list_transform(range(1, len(ea.embedding) + 1),
      |       i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))),
      |     (x, y) -> x + y) AS dot,
      |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |     list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |     (x, y) -> x + y)) AS nx,
      |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |     list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |     (x, y) -> x + y)) AS ny
      | FROM cand c
      | JOIN embeddings ea ON ea.vec_id = c.vec_a
      | JOIN embeddings eb ON eb.vec_id = c.vec_b)
      |SELECT vec_a, vec_b,
      |  round(CASE WHEN nx * ny > 0 THEN dot / (nx * ny) ELSE 0.0 END, 6) AS cos_sim
      |FROM rer
      |WHERE CASE WHEN nx * ny > 0 THEN dot / (nx * ny) ELSE 0.0 END >= 0.4""".stripMargin)) { (s, dir) =>
    // The COMPLETE compress→candidates→re-rank pipeline: candidate pairs
    // come from the 16-dim projected space at a LOWERED threshold (0.15 —
    // the margin absorbs JL distortion at the fixture's τ=0.4 pair-mass
    // regime, the same τ as dedup_embedding_neardup), then survivors
    // re-rank on the full 64-dim vectors and only the exact cosine
    // decides membership. Measured at sf0.01: the candidate filter skips
    // ~70% of pairs at recall 0.90 (SimilaritySpec gates ≥ 0.8 vs ground
    // truth). The compression cuts constant factors — 4× narrower
    // vectors through the n²/2 candidate stage, exact 64-dim cosine only
    // on candidate-sized data — not the n² shape itself; sub-quadratic
    // candidate generation is the ANN entries' job (embed_ann_*).
    // Wrong-by-projection candidates cost extra work, never wrong
    // output; misses are the recall trade. The re-rank joins hash on
    // vec_id and AQE picks broadcast when the candidate frame is small.
    val emb = Tables.embeddings(s, dir)
    val proj = emb.select(col("vec_id"),
      graft.functions.Quantize.randomProject(
        col("embedding"), outDim = 16, inDim = 64).as("embedding"))
    val cand = Similarity.cosineThresholdPairs(proj, 0.15)
      .select(col("vec_a"), col("vec_b"))
    val ea = emb.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
    val eb = emb.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
    cand.join(ea, "vec_a").join(eb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        Similarity.cosineFast(col("va"), col("vb")).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
      .select(col("vec_a"), col("vec_b"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  register("dedup_semantic", None) { (s, dir) =>
    // SemDeDup (cluster-then-dedup): spherical k-means lists, cosine
    // comparisons only WITHIN a cluster — Σ|cluster|² pairwise cost instead
    // of |n|², the embedding-dedup shape that scales to corpus size by
    // raising nLists. no_oracle (k-means isn't DuckDB-expressible);
    // SimilaritySpec proves nLists=1 equals the exact global rule and that
    // cluster-local drops match the exact pair list restricted to
    // same-cluster pairs.
    Similarity.semanticDedup(Tables.embeddings(s, dir), threshold = 0.35,
      nLists = 8, iters = 2)
  }

  register("embed_ann_ivf", None) { (s, dir) =>
    // The other standard ANN scale path: IVF index (spherical k-means
    // lists, nProbe nearest lists scanned per query). On this corpus the
    // cluster structure is weak (top-5 cosine ≈0.26-0.49), so nProbe=8/16
    // is what holds recall ≥0.8 (measured 0.83 in SimilaritySpec); sharper
    // corpora run nProbe ≪ nLists. Unlike LSH the corpus is stored once
    // (one list per vector), not ×nTables.
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8), k = 5,
      nLists = 16, nProbe = 8, iters = 3)
  }

  register("embed_ann_ivf_indexed", None) { (s, dir) =>
    // The IVF index as an ON-DISK PARTITIONED LAYOUT: inverted lists are
    // Hive partitions (vectors/cid=<list>/), so probing is partition
    // pruning — a query batch reads nProbe/nLists of the index bytes where
    // the in-memory form re-assigns the whole corpus per run. Output is
    // proven identical to ivfTopK at the same parameters (SimilaritySpec);
    // no_oracle for the same reason as the other ANN entries.
    val emb = Tables.embeddings(s, dir)
    val path = s"$sinkRoot/ivf-index-${dir.replaceAll("[^0-9]", "")}"
    Similarity.writeIvfIndex(emb, path, nLists = 16, iters = 3)
    Similarity.searchIvfIndex(s, path, emb.filter(col("vec_id") < 8),
      k = 5, nProbe = 8)
  }

  register("embed_ann_ivfpq", None) { (s, dir) =>
    // The FUSED production index (FAISS's IVFPQ shape): the coarse
    // quantizer prunes WHICH lists a query reads (Hive partition pruning
    // on cid=), PQ codes compress WHAT each list stores (16 bytes/vector,
    // 16×), ADC scores the survivors with the query LUT broadcast, and an
    // id-keyed re-rank against the source table restores exact ordering —
    // at 100 TB the only ANN tier whose index both FITS and PRUNES.
    // no_oracle (k-means); PqSpec proves probe-all + deep re-rank ==
    // brute force EXACTLY, recall ≥0.8 at these parameters, append ==
    // rebuild, and the codes-only layout schema.
    val emb = Tables.embeddings(s, dir)
    val path = s"$sinkRoot/ivfpq-index-${dir.replaceAll("[^0-9]", "")}"
    graft.functions.Pq.writeIvfPqIndex(emb, path, nLists = 16, m = 16,
      kCodes = 32, ivfIters = 3)
    graft.functions.Pq.searchIvfPqIndex(s, path,
      emb.filter(col("vec_id") < 8), emb, k = 5, nProbe = 8, rerank = 50)
  }

  register("embed_ann_pq", None) { (s, dir) =>
    // The MEMORY-COMPRESSION ANN tier (product quantization, Jégou 2011):
    // 64-dim float32 vectors (256 B) become 16 byte codes — 16× — and the
    // scoring pass streams CODES, not vectors, at m float adds per pair
    // (the fused ADC expression). Candidates re-rank on true cosine over
    // an id-keyed candidate-sized join, so the lossy tier decides
    // candidacy, never the final ordering. no_oracle (k-means training);
    // PqSpec gates recall ≥0.8 vs brute force at exactly these parameters
    // plus bit-exact ADC arithmetic against a driver-side replay.
    val emb = Tables.embeddings(s, dir)
    graft.functions.Pq.pqTopK(emb, emb.filter(col("vec_id") < 8), k = 5,
      m = 16, kCodes = 32, iters = 3, rerank = 30)
  }

  register("text_bpe_vocab", None) { (s, dir) =>
    // Learned BPE merge table (Sennrich 2016) from the corpus: ONE
    // distributed pass compresses the corpus to its capped word-frequency
    // dict (token-keyed hash agg, TakeOrdered top-maxVocab), then the
    // merge loop runs driver-side over that model-sized dict with
    // incremental pair maintenance — training cost is never a second
    // corpus scan. no_oracle (iterative trainer); BpeSpec pins the
    // hand-computed Sennrich example and rank-prefix stability.
    import s.implicits._
    graft.functions.Bpe.learnMerges(Tables.documents(s, dir), nMerges = 200)
      .map(m => (m.rank, m.left, m.right))
      .toDF("rank", "left", "right")
  }

  register("text_bpe_tokens", None) { (s, dir) =>
    // Token counts under the LEARNED tokenizer — the real budget operator
    // behind every mixing/packing/sampling decision (the bpe_token_estimate
    // heuristic stays for scans that can't afford training). Application is
    // one narrow codegen'd pass (native expression + per-thread Zipf
    // cache). no_oracle; BpeSpec proves count==tokenize-size, monotonicity
    // in merges, and word reconstruction.
    val docs = Tables.documents(s, dir)
    val merges = graft.functions.Bpe.learnMerges(docs, nMerges = 200)
    docs.select(col("doc_id"), col("source"),
      graft.functions.Bpe.tokenCount(col("text"), merges).as("n_tokens_bpe"),
      graft.functions.TextFunctions.bpeTokenEstimate(col("text"))
        .as("n_tokens_est"))
  }

  register("text_wordpiece_tokens", None) { (s, dir) =>
    // Token counts under the LEARNED WordPiece vocabulary (Schuster &
    // Nakajima 2012; the BERT-family tokenizer) — the third production
    // tokenizer beside BPE and unigram-LM, same scale split: one
    // distributed capped word-dict pass, likelihood-scored merge loop
    // driver-side, application as greedy longest-match in one narrow
    // codegen'd scan. no_oracle (iterative trainer); WordPieceSpec pins
    // the likelihood-vs-frequency fixture (WordPiece ≠ BPE on the same
    // dict), the classic un/##aff/##able greedy example, [UNK] whole-word
    // fallback, total training-corpus coverage, reconstruction,
    // count==tokenize-size, and determinism.
    val docs = Tables.documents(s, dir)
    val vocab = graft.functions.WordPiece.learnVocab(docs, nMerges = 200)
    docs.select(col("doc_id"), col("source"),
      graft.functions.WordPiece.tokenCount(col("text"), vocab)
        .as("n_tokens_wordpiece"))
  }

  register("text_unigram_tokens", None) { (s, dir) =>
    // Token counts under the LEARNED unigram-LM tokenizer (Kudo 2018 /
    // SentencePiece — the model family behind T5/LLaMA tokenizers), next
    // to the BPE counter: seed-substring EM + loss-ranked shrink on the
    // driver over the capped word-frequency dict (ONE distributed corpus
    // pass), then Viterbi application as one narrow codegen'd pass.
    // no_oracle (EM); UnigramSpec proves ML segmentation on a hand model,
    // total coverage (reconstruction incl. unseen chars), determinism,
    // count==tokenize-size, compression vs the char baseline, and EM
    // monotonicity on the dict cost.
    val docs = Tables.documents(s, dir)
    val vocab = graft.functions.Unigram.train(docs, vocabSize = 500,
      maxVocab = 5000)
    docs.select(col("doc_id"), col("source"),
      graft.functions.Unigram.tokenCount(col("text"), vocab)
        .as("n_tokens_unigram"))
  }

  register("text_quality_classifier", Some(
    """WITH d AS (SELECT doc_id, (lang = 'en') AS is_positive,
      |    str_split(text, ' ') AS t FROM documents),
      |f AS (SELECT doc_id, is_positive,
      |    unnest(list_transform(t, x ->
      |      CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) % 4096)) AS bkt
      |  FROM d),
      |bc AS (SELECT bkt, count(*) FILTER (WHERE is_positive) AS pos_n,
      |    count(*) FILTER (WHERE NOT is_positive) AS neg_n FROM f GROUP BY 1),
      |tot AS (SELECT sum(pos_n) AS pos_total, sum(neg_n) AS neg_total FROM bc),
      |lo AS (SELECT bkt,
      |    ln((pos_n + 0.5) / (pos_total + 0.5 * 4096)) -
      |    ln((neg_n + 0.5) / (neg_total + 0.5 * 4096)) AS lo
      |  FROM bc CROSS JOIN tot),
      |w AS (SELECT doc_id, count(*) AS n_toks,
      |    round(CAST(sum(CAST(lo AS DECIMAL(38,9))) AS DOUBLE) / count(*), 6)
      |      AS nb_logodds
      |  FROM f JOIN lo USING (bkt) GROUP BY 1)
      |SELECT d.doc_id, d.is_positive,
      |  coalesce(w.n_toks, 0) AS n_toks,
      |  coalesce(w.nb_logodds, 0.0) AS nb_logodds
      |FROM d LEFT JOIN w USING (doc_id)""".stripMargin)) { (s, dir) =>
    // Seed-set quality CLASSIFIER (the GPT-3/LLaMA curation recipe:
    // positive = reference slice, negative = rest of the crawl, score
    // everything): hashed-bucket Naive Bayes, where training IS one
    // partial-aggregated bucket-count pass, the model is 4096 log-odds
    // doubles (broadcast — bounded at ANY corpus size BY CONSTRUCTION),
    // and scoring is one doc-keyed mean. The generative sibling of the
    // DSIR importance weights and the trained-model alternative to the
    // heuristic quality score; whole thing SQL-expressible so the
    // classifier itself sits under the DuckDB hash gate.
    graft.functions.Classifier.nbSeedScore(
      Tables.documents(s, dir), isPositive = col("lang") === "en")
  }

  register("text_quality_classifier_bigram", Some(
    """WITH d AS (SELECT doc_id, (lang = 'en') AS is_positive,
      |    str_split(text, ' ') AS t FROM documents),
      |d2 AS (SELECT doc_id, is_positive,
      |    t || list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
      |      AS terms FROM d),
      |f AS (SELECT doc_id, is_positive,
      |    unnest(list_transform(terms, x ->
      |      CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) % 4096)) AS bkt
      |  FROM d2),
      |bc AS (SELECT bkt, count(*) FILTER (WHERE is_positive) AS pos_n,
      |    count(*) FILTER (WHERE NOT is_positive) AS neg_n FROM f GROUP BY 1),
      |tot AS (SELECT sum(pos_n) AS pos_total, sum(neg_n) AS neg_total FROM bc),
      |lo AS (SELECT bkt,
      |    ln((pos_n + 0.5) / (pos_total + 0.5 * 4096)) -
      |    ln((neg_n + 0.5) / (neg_total + 0.5 * 4096)) AS lo
      |  FROM bc CROSS JOIN tot),
      |w AS (SELECT doc_id, count(*) AS n_toks,
      |    round(CAST(sum(CAST(lo AS DECIMAL(38,9))) AS DOUBLE) / count(*), 6)
      |      AS nb_logodds
      |  FROM f JOIN lo USING (bkt) GROUP BY 1)
      |SELECT d.doc_id, d.is_positive,
      |  coalesce(w.n_toks, 0) AS n_toks,
      |  coalesce(w.nb_logodds, 0.0) AS nb_logodds
      |FROM d LEFT JOIN w USING (doc_id)""".stripMargin)) { (s, dir) =>
    // The bigram sibling of text_quality_classifier: same generative NB,
    // wordNgrams=2 hashed features — the transition signal that separates
    // sources whose unigram profiles coincide (the signal the r10 LR
    // rework exploits), still one aggregation pass, still fully
    // SQL-expressible: TRAINING over unigram+bigram features is replayed
    // in DuckDB (bigrams via list_transform over the token array) and the
    // whole classifier sits under the hash gate.
    graft.functions.Classifier.nbSeedScore(
      Tables.documents(s, dir), isPositive = col("lang") === "en",
      wordNgrams = 2)
  }

  register("text_quality_classifier_lr", None) { (s, dir) =>
    // The iterative sibling: fastText-style logistic regression over
    // hashed unigram+bigram features (wordNgrams=2 — bigrams carry the
    // transition signal the generative unigram NB cannot see), full-batch
    // AdaGrad — each epoch is ONE distributed pass (broadcast weights in,
    // one nBuckets-bounded gradient aggregate back), decimal-routed so
    // training is bit-deterministic. Iterative = not SQL-expressible;
    // ClassifierSpec gates separable-fixture accuracy, determinism,
    // en-vs-zh separation (mean-sigmoid margin >= 0.2) on this corpus,
    // label-precision domination over the oracled NB entry, and the
    // bigram-vs-unigram separation contract.
    graft.functions.Classifier.lrSeedScore(
        Tables.documents(s, dir), isPositive = col("lang") === "en",
        epochs = 8)
      .orderBy(desc("lr_score"), asc("doc_id")).limit(50)
  }

  register("graph_pagerank_trade", Some(
    """WITH e AS (
      |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
      |    CAST(count(*) AS DOUBLE) AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      |ow AS (SELECT src, CAST(sum(CAST(w AS DECIMAL(38,12))) AS DOUBLE) AS outw
      |  FROM e GROUP BY 1),
      |r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
      |c1 AS (SELECT e.dst, CAST(r.r * e.w / ow.outw AS DECIMAL(38,12)) AS c
      |  FROM e JOIN r0 r ON e.src = r.node JOIN ow ON e.src = ow.src),
      |f1 AS (SELECT dst, CAST(sum(c) AS DOUBLE) AS infl FROM c1 GROUP BY 1),
      |d1 AS (SELECT coalesce(CAST(sum(CAST(r.r AS DECIMAL(38,12))) AS DOUBLE),
      |    0.0) AS dm
      |  FROM r0 r LEFT JOIN ow ON r.node = ow.src WHERE ow.src IS NULL),
      |r1 AS (SELECT n.node,
      |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
      |      + CAST(0.85 AS DOUBLE) * (coalesce(f.infl, 0.0) + d.dm / nn.n) AS r
      |  FROM nodes n LEFT JOIN f1 f ON n.node = f.dst
      |  CROSS JOIN d1 d CROSS JOIN nn),
      |c2 AS (SELECT e.dst, CAST(r.r * e.w / ow.outw AS DECIMAL(38,12)) AS c
      |  FROM e JOIN r1 r ON e.src = r.node JOIN ow ON e.src = ow.src),
      |f2 AS (SELECT dst, CAST(sum(c) AS DOUBLE) AS infl FROM c2 GROUP BY 1),
      |d2 AS (SELECT coalesce(CAST(sum(CAST(r.r AS DECIMAL(38,12))) AS DOUBLE),
      |    0.0) AS dm
      |  FROM r1 r LEFT JOIN ow ON r.node = ow.src WHERE ow.src IS NULL),
      |r2 AS (SELECT n.node,
      |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
      |      + CAST(0.85 AS DOUBLE) * (coalesce(f.infl, 0.0) + d.dm / nn.n) AS r
      |  FROM nodes n LEFT JOIN f2 f ON n.node = f.dst
      |  CROSS JOIN d2 d CROSS JOIN nn),
      |c3 AS (SELECT e.dst, CAST(r.r * e.w / ow.outw AS DECIMAL(38,12)) AS c
      |  FROM e JOIN r2 r ON e.src = r.node JOIN ow ON e.src = ow.src),
      |f3 AS (SELECT dst, CAST(sum(c) AS DOUBLE) AS infl FROM c3 GROUP BY 1),
      |d3 AS (SELECT coalesce(CAST(sum(CAST(r.r AS DECIMAL(38,12))) AS DOUBLE),
      |    0.0) AS dm
      |  FROM r2 r LEFT JOIN ow ON r.node = ow.src WHERE ow.src IS NULL),
      |r3 AS (SELECT n.node,
      |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
      |      + CAST(0.85 AS DOUBLE) * (coalesce(f.infl, 0.0) + d.dm / nn.n) AS r
      |  FROM nodes n LEFT JOIN f3 f ON n.node = f.dst
      |  CROSS JOIN d3 d CROSS JOIN nn)
      |SELECT r3.node, na.n_name, round(r3.r, 6) AS pagerank
      |FROM r3 JOIN nation na ON r3.node = na.n_nationkey""".stripMargin)) { (s, dir) =>
    // Host-graph centrality, the curation primitive web-scale pipelines
    // rank sources with (Common Crawl publishes host-level ranks), over
    // the fixture's nation-level trade graph: supplier-nation → customer-
    // nation edges weighted by order-line count. Fixed 3-iteration
    // weighted PageRank — fixed depth keeps the whole power method
    // declarative, so the oracle replays every iteration as chained CTEs
    // and the ranks hash-match. Per iteration: ONE edge-keyed shuffle +
    // a 1-row dangling-mass broadcast; rank sums decimal-quantized so
    // accumulation order can't perturb the fixpoint at any parallelism.
    val edges = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(
          Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).cast("double").as("w"))
    graft.functions.Graphs.pageRank(edges, iterations = 3,
        weightCol = Some("w"))
      .join(broadcast(Tables.nation(s, dir)),
        col("node") === col("n_nationkey"))
      .select(col("node"), col("n_name"), col("pagerank"))
  }

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
    "agg_meta_sketch_profile",
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
