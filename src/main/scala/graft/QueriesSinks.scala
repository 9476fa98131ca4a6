package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.CdcEnvelope
import graft.operators.{Batching, Enrichment, Filters, PartitionKeys}
import graft.functions.{Dedup, Multimodal, Similarity, TextFunctions => TF}

/** Serializer / sink round-trips (SURVEY §2.3 T1-T7 + §2.8) and the quality/layout entries that ride the sink root.
  *
  * One slice of the [[Queries]] catalog — registrations run at
  * trait initialization, in the linearization order [[Queries]]
  * declares, so the catalog order is identical to the pre-split
  * single file. */
private[graft] trait QueriesSinks { this: QueryDomain =>

  // ==========================================================================
  // Serializer / sink round-trips (SURVEY §2.3 T1-T7 + §2.8): each writes
  // the envelope through a real DataFrameWriter (format × compression ×
  // key strategy), reads the files back, and aggregates — the oracle runs
  // the same aggregate on the ORIGINAL events, so a pass proves the write
  // path is lossless end-to-end (the reference's s3_integration_test
  // contract, one query per format family).
  // ==========================================================================


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

  register("agg_meta_join_dim_grouped", Some(
    """SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
      |  count(*) AS n_events, min(value) AS v_min
      |FROM events e JOIN (
      |  SELECT DISTINCT event_type FROM events
      |  WHERE event_type IN ('purchase', 'signup')) d
      |ON e.event_type = d.event_type
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // The grouped dim-join composition — every manifest-tier leg at once:
    // the fact layout is clustered by (event_type, ts), so files are
    // key-homogeneous AND week-homogeneous; the rewrite joins their
    // manifest rows against the dim, groups them by the KEY-DERIVED
    // date_trunc('week', ts) evaluated over each file's zone, and scans
    // only the files straddling a type or week boundary (replaying the
    // original join there). REQUIREs the dim-join rewrite fired AND fewer
    // fact files than the layout holds. At 100 TB this is the
    // per-week-per-dimension dashboard costed by cluster boundaries.
    val path =
      s"$sinkRoot/agg_meta_join_dim_grp-${dir.replaceAll("[^0-9.]", "")}"
    Tables.events(s, dir)
      .repartitionByRange(16, col("event_type"), col("ts"))
      .write.mode("overwrite").parquet(path)
    graft.sources.ZoneMap.write(s, path,
      Seq("event_type", "ts", "value"))
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
        .groupBy(to_date(date_trunc("week", col("ts"))).as("wk"))
        .agg(count(lit(1)).as("n_events"),
          min(col("value")).as("v_min"))
      val totalFiles = s.read.parquet(s"$path/_zonemap").count()
      val dataFiles = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case fr: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if fr.location.rootPaths.exists(p =>
                  p.toString.contains("agg_meta_join_dim_grp") &&
                    !p.toString.contains("_zonemap")) =>
              fr.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(graft.plans.MetaAgg.servedJoin.get() > fired0 &&
          dataFiles < totalFiles,
        s"agg_meta_join_dim_grouped: expected grouped dim-join serving " +
          s"($dataFiles of $totalFiles)")
      q.localCheckpoint()
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

  register("agg_meta_join_star", Some(
    """SELECT count(*) AS n_events, count(user_id) AS users_cnt,
      |  min(value) AS v_min, max(value) AS v_max
      |FROM (SELECT *, substring(event_type, 1, 2) AS category FROM events) e
      |JOIN (SELECT DISTINCT event_type FROM events
      |      WHERE event_type IN ('purchase', 'signup', 'click')) d1
      |ON e.event_type = d1.event_type
      |JOIN (SELECT DISTINCT substring(event_type, 1, 2) AS cat FROM events
      |      WHERE event_type IN ('purchase', 'click', 'error')) d2
      |ON e.category = d2.cat""".stripMargin)) { (s, dir) =>
    // MANIFEST-SERVED aggregates under a MULTI-DIM STAR — the round-14
    // widening of the dim-join tier: the fact layout is clustered by
    // event_type (and category, a prefix of it, rides the same
    // clustering), so most files are homogeneous in BOTH join keys and
    // their manifest rows join dim1 AND dim2 as whole files —
    // multiplicities multiplying across dims exactly as the nested joins
    // do; only type-boundary files scan raw and replay the original
    // star. REQUIREs the dim-join rewrite fired AND fewer fact files than
    // the layout holds were read. At 100 TB: the two-dimension dashboard
    // costs the dims plus the boundary files, never a fact scan. Rows
    // hash-matched against DuckDB replaying the same star on the raw
    // tables.
    val path =
      s"$sinkRoot/agg_meta_join_star-${dir.replaceAll("[^0-9.]", "")}"
    Tables.events(s, dir)
      .withColumn("category", substring(col("event_type"), 1, 2))
      .repartitionByRange(8, col("event_type"), col("event_id"))
      .write.mode("overwrite").parquet(path)
    graft.sources.ZoneMap.write(s, path,
      Seq("event_type", "category", "user_id", "value"))
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.MetaAgg.install(s)
    try {
      val fired0 = graft.plans.MetaAgg.servedJoin.get()
      val d1 = Tables.events(s, dir)
        .where(col("event_type").isin("purchase", "signup", "click"))
        .select(col("event_type").as("d_type")).distinct()
      val d2 = Tables.events(s, dir)
        .where(col("event_type").isin("purchase", "click", "error"))
        .select(substring(col("event_type"), 1, 2).as("cat")).distinct()
      val f = s.read.parquet(path)
      val q = f.join(d1, f("event_type") === d1("d_type"))
        .join(d2, f("category") === d2("cat"))
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
                  p.toString.contains("agg_meta_join_star") &&
                    !p.toString.contains("_zonemap")) =>
              fr.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(graft.plans.MetaAgg.servedJoin.get() > fired0 &&
          dataFiles < totalFiles,
        s"agg_meta_join_star: expected key-homogeneous files served under " +
          s"the star ($dataFiles of $totalFiles)\n" +
          q.queryExecution.optimizedPlan.toString)
      q.localCheckpoint()
    } finally {
      graft.plans.MetaAgg.uninstall(s)
      graft.plans.BloomJoins.clear()
    }
  }

  register("agg_meta_grouped_part", Some(
    """SELECT event_type, count(*) AS n_events, count(user_id) AS users_cnt,
      |  min(value) AS v_min, max(value) AS v_max
      |FROM events GROUP BY 1""".stripMargin)) { (s, dir) =>
    // GROUP BY a HIVE PARTITION COLUMN served from the manifest with NO
    // zones on it: a directory-derived column is homogeneous per file by
    // construction and `part_dir` is already a manifest column, so the
    // per-partition dashboard reads ZERO data files (REQUIREd below) even
    // though the zone tier only ever indexed user_id and value. At 100 TB
    // this is "rows per tenant/day" costed as a files-sized manifest
    // aggregate. Rows hash-matched against DuckDB grouping the raw table.
    val path =
      s"$sinkRoot/agg_meta_grouped_part-${dir.replaceAll("[^0-9.]", "")}"
    Tables.events(s, dir).repartition(2)
      .write.mode("overwrite").partitionBy("event_type").parquet(path)
    graft.sources.ZoneMap.write(s, path, Seq("user_id", "value"))
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.MetaAgg.install(s)
    try {
      val fired0 = graft.plans.MetaAgg.served.get()
      val q = s.read.parquet(path).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count(col("user_id")).as("users_cnt"),
          min(col("value")).as("v_min"),
          max(col("value")).as("v_max"))
      val dataFiles = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case fr: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if fr.location.rootPaths.exists(p =>
                  p.toString.contains("agg_meta_grouped_part") &&
                    !p.toString.contains("_zonemap")) =>
              fr.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(graft.plans.MetaAgg.served.get() > fired0 && dataFiles == 0L,
        s"agg_meta_grouped_part: expected partition-column groups served " +
          s"from the manifest alone ($dataFiles files read)\n" +
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

  register("agg_meta_join_semi", Some(
    """SELECT count(*) AS n_events, count(user_id) AS users_cnt,
      |  min(value) AS v_min, max(value) AS v_max
      |FROM events WHERE event_type IN (
      |  SELECT event_type FROM events
      |  WHERE event_type IN ('purchase', 'error'))""".stripMargin)) {
    (s, dir) =>
    // MANIFEST-SERVED aggregates under a LEFT SEMI join — the
    // `IN (subquery)` dashboard shape: the fact layout is clustered by
    // event_type, so key-homogeneous files semi-join the dim AS UNITS
    // (kept once however many dim rows match — the dim here is the raw
    // un-deduplicated feed, so multiplicity-freedom is load-bearing);
    // only type-boundary files scan raw and replay the semi join.
    // REQUIREs the dim-join rewrite fired AND fewer fact files than the
    // layout holds were read. Rows hash-matched against DuckDB replaying
    // the IN-subquery on the raw table.
    val path =
      s"$sinkRoot/agg_meta_join_semi-${dir.replaceAll("[^0-9.]", "")}"
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
        .where(col("event_type").isin("purchase", "error"))
        .select(col("event_type").as("d_type"))
      val f = s.read.parquet(path)
      val q = f.join(dim, f("event_type") === dim("d_type"), "left_semi")
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
                  p.toString.contains("agg_meta_join_semi") &&
                    !p.toString.contains("_zonemap")) =>
              fr.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(graft.plans.MetaAgg.servedJoin.get() > fired0 &&
          dataFiles < totalFiles,
        s"agg_meta_join_semi: expected key-homogeneous files served under " +
          s"the semi join ($dataFiles of $totalFiles)\n" +
          q.queryExecution.optimizedPlan.toString)
      q.localCheckpoint()
    } finally {
      graft.plans.MetaAgg.uninstall(s)
      graft.plans.BloomJoins.clear()
    }
  }

  register("agg_meta_part_filter", Some(
    """SELECT event_type, count(*) AS n_events, min(value) AS v_min
      |FROM events WHERE event_type IN ('purchase', 'click')
      |GROUP BY 1""".stripMargin)) { (s, dir) =>
    // WHERE + GROUP BY on a HIVE PARTITION COLUMN, both served from the
    // manifest with NO zones on that column: partition files are
    // single-valued by construction, so the IN-list covers the matching
    // partitions whole and excludes the rest — ZERO data files read
    // (REQUIREd). At 100 TB: "count per selected tenant" costs a
    // files-sized manifest aggregate however many tenants the layout
    // holds. Rows hash-matched against DuckDB filtering the raw table.
    val path =
      s"$sinkRoot/agg_meta_part_filter-${dir.replaceAll("[^0-9.]", "")}"
    Tables.events(s, dir).repartition(2)
      .write.mode("overwrite").partitionBy("event_type").parquet(path)
    graft.sources.ZoneMap.write(s, path, Seq("user_id", "value"))
    graft.plans.BloomJoins.clear()
    graft.plans.GraftCatalog.clearCache()
    graft.plans.MetaAgg.install(s)
    try {
      val fired0 = graft.plans.MetaAgg.served.get()
      val q = s.read.parquet(path)
        .where(col("event_type").isin("purchase", "click"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), min(col("value")).as("v_min"))
      val dataFiles = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case fr: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if fr.location.rootPaths.exists(p =>
                  p.toString.contains("agg_meta_part_filter") &&
                    !p.toString.contains("_zonemap")) =>
              fr.location.inputFiles.length.toLong
            case _ => 0L
          }
      }.sum
      require(graft.plans.MetaAgg.served.get() > fired0 && dataFiles == 0L,
        s"agg_meta_part_filter: expected partition-filtered groups served " +
          s"from the manifest alone ($dataFiles files read)\n" +
          q.queryExecution.optimizedPlan.toString)
      q.localCheckpoint()
    } finally {
      graft.plans.MetaAgg.uninstall(s)
      graft.plans.BloomJoins.clear()
    }
  }

  register("agg_meta_sketch_semijoin", None) { (s, dir) =>
    // The sketch tier UNDER A SEMI-JOIN (ZoneMap.metaApproxProfileSemiJoin):
    // "p50/p99 of value and distinct users, for the dim-selected event
    // types" answered by merging only the key-homogeneous matching files'
    // KLL/HLL blobs and re-sketching the type-boundary files' matching
    // rows — never a fact scan on a key-clustered layout. No DuckDB
    // oracle (sketch estimates are engine-specific — same argument as
    // agg_meta_sketch_profile); the REQUIREs gate the contracts against
    // exact answers on the raw feed instead: n_rows exact, KLL rank
    // error ≤ 2·1.65% per quantile, HLL relative error ≤ 5%.
    // ZoneMapSpec pins the exact regime and the leg split.
    val path =
      s"$sinkRoot/agg_meta_sketch_semijoin-${dir.replaceAll("[^0-9.]", "")}"
    val ev = Tables.events(s, dir)
    ev.repartitionByRange(8, col("event_type"), col("event_id"))
      .write.mode("overwrite").parquet(path)
    graft.sources.ZoneMap.write(s, path,
      Seq("event_type", "value", "user_id"),
      updateCatalog = false, sketchCols = Seq("value", "user_id"))
    val dim = ev.where(col("event_type").isin("purchase", "click"))
      .select(col("event_type").as("d_type")).distinct()
    val prof = graft.sources.ZoneMap.metaApproxProfileSemiJoin(
      s, path, "event_type", dim, "d_type",
      Seq("value", "user_id"), Seq(0.5, 0.99)).head()
    val n = prof.getAs[Long]("n_rows")
    val p50 = prof.getAs[Double]("value_p50")
    val p99 = prof.getAs[Double]("value_p99")
    val du = prof.getAs[Long]("user_id_approx_distinct")
    val matching = ev.where(col("event_type").isin("purchase", "click"))
    val exact = matching.agg(count(lit(1)).as("n"),
      countDistinct(col("user_id")).as("du"),
      (count(when(col("value") <= p50, 1)) / count(col("value")))
        .as("rank50"),
      (count(when(col("value") <= p99, 1)) / count(col("value")))
        .as("rank99")).head()
    require(n == exact.getAs[Long]("n"),
      s"semi-join n_rows must be exact: $n vs ${exact.getAs[Long]("n")}")
    require(math.abs(exact.getAs[Double]("rank50") - 0.5) <= 0.033 &&
        math.abs(exact.getAs[Double]("rank99") - 0.99) <= 0.033,
      s"KLL rank contract violated under the semi-join: " +
        s"rank(p50)=${exact.getAs[Double]("rank50")}, " +
        s"rank(p99)=${exact.getAs[Double]("rank99")}")
    val exactDu = exact.getAs[Long]("du")
    require(math.abs(du - exactDu).toDouble / exactDu <= 0.05,
      s"HLL estimate off under the semi-join: $du vs $exactDu")
    import s.implicits._
    Seq((n, p50, p99, du, exactDu))
      .toDF("n_rows", "value_p50", "value_p99",
        "approx_users", "exact_users")
  }

  register("agg_meta_sketch_by", None) { (s, dir) =>
    // The sketch tier GROUPED (ZoneMap.metaApproxProfileBy): "p50 of
    // value and distinct users PER EVENT TYPE" from the manifest —
    // homogeneous files' blobs merge straight into their group, the
    // type-boundary files re-sketch their rows grouped, per-group n_rows
    // exact. No DuckDB oracle (engine-specific estimates — the standing
    // sketch-tier argument); REQUIREs gate every group against exact
    // answers instead: n_rows exact, KLL rank error ≤ 2·1.65%, HLL
    // relative error ≤ 5%. ZoneMapSpec pins the exact regime, the leg
    // split and the Hive-partition form.
    val path =
      s"$sinkRoot/agg_meta_sketch_by-${dir.replaceAll("[^0-9.]", "")}"
    val ev = Tables.events(s, dir)
    ev.repartitionByRange(8, col("event_type"), col("event_id"))
      .write.mode("overwrite").parquet(path)
    graft.sources.ZoneMap.write(s, path,
      Seq("event_type", "value", "user_id"),
      updateCatalog = false, sketchCols = Seq("value", "user_id"))
    val prof = graft.sources.ZoneMap.metaApproxProfileBy(
        s, path, Seq("event_type"), Seq("value", "user_id"), Seq(0.5))
      .select(col("event_type").as("et"), col("n_rows"),
        col("value_p50"), col("user_id_approx_distinct"))
      // materialize once: the group-set check and the gated join below
      // would otherwise each re-run the whole manifest merge + boundary
      // scan
      .localCheckpoint()
    // the group SET must match exactly — a silently dropped or invented
    // group would survive the join-based per-group comparison below
    val profTypes = prof.select("et").collect().map(_.getString(0)).toSet
    val exactTypes = ev.select("event_type").distinct().collect()
      .map(_.getString(0)).toSet
    require(profTypes == exactTypes,
      s"agg_meta_sketch_by: group sets differ — " +
        s"missing ${exactTypes -- profTypes}, spurious ${profTypes -- exactTypes}")
    val gated = ev.join(broadcast(prof), ev("event_type") === col("et"))
      .groupBy(col("et"), col("n_rows"), col("value_p50"),
        col("user_id_approx_distinct"))
      .agg(count(lit(1)).as("n_exact"),
        countDistinct(col("user_id")).as("du_exact"),
        (count(when(col("value") <= col("value_p50"), 1)) /
          count(col("value"))).as("rank50"))
    val rows = gated.collect()
    require(rows.nonEmpty, "agg_meta_sketch_by: no groups came back")
    rows.foreach { r =>
      val et = r.getAs[String]("et")
      require(r.getAs[Long]("n_rows") == r.getAs[Long]("n_exact"),
        s"[$et] per-group n_rows must be exact: " +
          s"${r.getAs[Long]("n_rows")} vs ${r.getAs[Long]("n_exact")}")
      require(math.abs(r.getAs[Double]("rank50") - 0.5) <= 0.033,
        s"[$et] KLL rank contract violated: ${r.getAs[Double]("rank50")}")
      val du = r.getAs[Long]("user_id_approx_distinct")
      val duE = r.getAs[Long]("du_exact")
      require(math.abs(du - duE).toDouble / duE <= 0.05,
        s"[$et] HLL estimate off: $du vs $duE")
    }
    gated.select(col("et").as("event_type"), col("n_rows"),
      col("value_p50"), col("user_id_approx_distinct"),
      col("du_exact").as("exact_users"))
  }

  register("agg_meta_sketch_semijoin_by", None) { (s, dir) =>
    // The sketch tier GROUPED AND GATED in one call
    // (ZoneMap.metaApproxProfileSemiJoinBy) — the real monitoring query:
    // "p50 of value and distinct users PER DAY, for the dim-selected
    // event types". Group values come from the Hive partition dirs (zero
    // zone configuration), the gate from the event_type zones; files
    // homogeneous in both merge their blobs straight into their day iff
    // their type matches the dim, type-boundary files re-sketch their
    // MATCHING rows grouped, per-day n_rows exact over matching rows
    // only. No DuckDB oracle (engine-specific estimates — the standing
    // sketch-tier argument); REQUIREs gate every group against exact
    // answers AND the group SET itself (no day may vanish or appear).
    // ZoneMapSpec pins the exact regime, the per-leg routing and the
    // never-touched all-null-key files.
    val path = s"$sinkRoot/agg_meta_sketch_semijoin_by-${
      dir.replaceAll("[^0-9.]", "")}"
    val ev = Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")).cast("string"))
    ev.repartitionByRange(8, col("day"), col("event_type"), col("event_id"))
      .write.mode("overwrite").partitionBy("day").parquet(path)
    graft.sources.ZoneMap.write(s, path,
      Seq("event_type", "value", "user_id"),
      updateCatalog = false, sketchCols = Seq("value", "user_id"))
    val dim = ev.where(col("event_type").isin("purchase", "click"))
      .select(col("event_type").as("d_type")).distinct()
    val prof = graft.sources.ZoneMap.metaApproxProfileSemiJoinBy(
        s, path, "event_type", dim, "d_type", Seq("day"),
        Seq("value", "user_id"), Seq(0.5))
      // the partition dirs read back as DATE under Spark's partition
      // type inference — compare as the strings the feed carries
      .select(col("day").cast("string").as("d"), col("n_rows"),
        col("value_p50"), col("user_id_approx_distinct"))
      // materialize once (group-set check + gated join both read it)
      .localCheckpoint()
    val matching = ev.where(col("event_type").isin("purchase", "click"))
    // the group SET must match exactly — a silently dropped or invented
    // day would survive a join-only comparison
    val profDays = prof.select("d").collect().map(_.getString(0)).toSet
    val exactDays = matching.select("day").distinct().collect()
      .map(_.getString(0)).toSet
    require(profDays == exactDays,
      s"agg_meta_sketch_semijoin_by: group sets differ — " +
        s"missing ${exactDays -- profDays}, spurious ${profDays -- exactDays}")
    val gated = matching.join(broadcast(prof), matching("day") === col("d"))
      .groupBy(col("d"), col("n_rows"), col("value_p50"),
        col("user_id_approx_distinct"))
      .agg(count(lit(1)).as("n_exact"),
        countDistinct(col("user_id")).as("du_exact"),
        (count(when(col("value") <= col("value_p50"), 1)) /
          count(col("value"))).as("rank50"))
    val rows = gated.collect()
    require(rows.nonEmpty, "agg_meta_sketch_semijoin_by: no groups came back")
    rows.foreach { r =>
      val d = r.getAs[String]("d")
      require(r.getAs[Long]("n_rows") == r.getAs[Long]("n_exact"),
        s"[$d] per-group n_rows over MATCHING rows must be exact: " +
          s"${r.getAs[Long]("n_rows")} vs ${r.getAs[Long]("n_exact")}")
      // + 1/n: a tiny group's EXACT median is itself ceil(n/2)/n — up to
      // one item-rank off the nominal 0.5 (sf0.001 days carry ~10 rows)
      require(math.abs(r.getAs[Double]("rank50") - 0.5) <=
          0.033 + 1.0 / r.getAs[Long]("n_exact"),
        s"[$d] KLL rank contract violated: ${r.getAs[Double]("rank50")}")
      val du = r.getAs[Long]("user_id_approx_distinct")
      val duE = r.getAs[Long]("du_exact")
      require(math.abs(du - duE).toDouble / duE <= 0.05,
        s"[$d] HLL estimate off: $du vs $duE")
    }
    gated.select(col("d").as("day"), col("n_rows"),
      col("value_p50"), col("user_id_approx_distinct"),
      col("du_exact").as("exact_users"))
  }

  register("agg_meta_sketch_banded", None) { (s, dir) =>
    // The sketch tier under a RANGE PREDICATE (the `bands` axis of the
    // profile engine): "p50 of value and distinct users PER DAY, for
    // value in [lo, hi]" over a layout range-clustered on value within
    // each day partition — value-covered files serve their blobs whole,
    // partially-overlapping files re-sketch only their passing rows,
    // disjoint files are never opened. No DuckDB oracle (engine-specific
    // estimates); REQUIREs gate every group against exact answers over
    // the band rows, plus group-SET equality. ZoneMapSpec pins the
    // covered/partial/disjoint routing in the exact regime.
    val path = s"$sinkRoot/agg_meta_sketch_banded-${
      dir.replaceAll("[^0-9.]", "")}"
    val ev = Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")).cast("string"))
    ev.repartitionByRange(8, col("day"), col("value"))
      .write.mode("overwrite").partitionBy("day").parquet(path)
    graft.sources.ZoneMap.write(s, path, Seq("value", "user_id"),
      updateCatalog = false, sketchCols = Seq("value", "user_id"))
    // a deterministic mid-mass band from the feed's own quartiles
    val qs = ev.stat.approxQuantile("value", Array(0.25, 0.75), 0.0)
    val (lo, hi) = (qs(0), qs(1))
    val prof = graft.sources.ZoneMap.metaApproxProfileBy(
        s, path, Seq("day"), Seq("value", "user_id"), Seq(0.5),
        bands = Seq(("value", lo, hi)))
      .select(col("day").cast("string").as("d"), col("n_rows"),
        col("value_p50"), col("user_id_approx_distinct"))
      // materialize once (group-set check + gated join both read it)
      .localCheckpoint()
    val matching = ev.where(col("value") >= lo && col("value") <= hi)
    val profDays = prof.select("d").collect().map(_.getString(0)).toSet
    val exactDays = matching.select("day").distinct().collect()
      .map(_.getString(0)).toSet
    require(profDays == exactDays,
      s"agg_meta_sketch_banded: group sets differ — " +
        s"missing ${exactDays -- profDays}, spurious ${profDays -- exactDays}")
    val gated = matching.join(broadcast(prof), matching("day") === col("d"))
      .groupBy(col("d"), col("n_rows"), col("value_p50"),
        col("user_id_approx_distinct"))
      .agg(count(lit(1)).as("n_exact"),
        countDistinct(col("user_id")).as("du_exact"),
        (count(when(col("value") <= col("value_p50"), 1)) /
          count(col("value"))).as("rank50"))
    val rows = gated.collect()
    require(rows.nonEmpty, "agg_meta_sketch_banded: no groups came back")
    rows.foreach { r =>
      val d = r.getAs[String]("d")
      require(r.getAs[Long]("n_rows") == r.getAs[Long]("n_exact"),
        s"[$d] per-group n_rows over BAND rows must be exact: " +
          s"${r.getAs[Long]("n_rows")} vs ${r.getAs[Long]("n_exact")}")
      require(math.abs(r.getAs[Double]("rank50") - 0.5) <=
          0.033 + 1.0 / r.getAs[Long]("n_exact"),
        s"[$d] KLL rank contract violated: ${r.getAs[Double]("rank50")}")
      val du = r.getAs[Long]("user_id_approx_distinct")
      val duE = r.getAs[Long]("du_exact")
      require(math.abs(du - duE).toDouble / duE <= 0.05,
        s"[$d] HLL estimate off: $du vs $duE")
    }
    gated.select(col("d").as("day"), col("n_rows"),
      col("value_p50"), col("user_id_approx_distinct"),
      col("du_exact").as("exact_users"))
  }

  register("agg_meta_topk_by", Some(
    """SELECT day, event_type, n_events, rk FROM (
      |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
      |    count(*) AS n_events,
      |    row_number() OVER (PARTITION BY CAST(CAST(ts AS DATE) AS VARCHAR)
      |      ORDER BY count(*) DESC, event_type) AS rk
      |  FROM events GROUP BY 1, 2)
      |WHERE rk <= 3""".stripMargin)) { (s, dir) =>
    // HEAVY HITTERS from the manifest: "top event types per day" answered
    // by merging the per-file frequent-items blobs (`_frqs`,
    // ItemsSketch<String>) — the manifest's third sketch family beside
    // KLL and HLL. This one IS DuckDB-oracled: the per-day distinct item
    // count sits far below the 0.75·1024 saturation threshold, so no
    // sketch ever purges, every estimate is the exact count, and the
    // (est desc, item asc) report order is the true top-k — the driver
    // hash-matches day/item/count/rank against DuckDB's row_number over
    // the raw feed. At 100 TB "which templates dominate per day" costs a
    // files-sized manifest job plus the day-boundary files; saturated
    // regimes degrade to the deterministic Misra-Gries error envelope
    // (SketchesSpec pins both regimes).
    val path = s"$sinkRoot/agg_meta_topk_by-${dir.replaceAll("[^0-9.]", "")}"
    val ev = Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")).cast("string"))
    ev.repartitionByRange(8, col("day"), col("event_type"))
      .write.mode("overwrite").partitionBy("day").parquet(path)
    graft.sources.ZoneMap.write(s, path, Seq("event_type"),
      updateCatalog = false, sketchCols = Seq("event_type"))
    val prof = graft.sources.ZoneMap.metaApproxProfileBy(
      s, path, Seq("day"), Seq("event_type"), Seq(0.5), topK = 3)
    prof.select(col("day").cast("string").as("day"),
        posexplode(col("event_type_topk")).as(Seq("pos", "hh")))
      .select(col("day"), col("hh.item").as("event_type"),
        col("hh.est").as("n_events"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  register("agg_meta_overlap_days", None) { (s, dir) =>
    // SET OVERLAP from the manifest's THETA tier
    // (ZoneMap.metaApproxOverlap): "how many users were active in the
    // first half of the window AND the second" — the retention question
    // HLL cannot answer (no sound intersection), served by merging
    // per-file theta blobs per scope, intersecting once. No DuckDB
    // oracle (engine-specific estimates); REQUIREs gate every output
    // against the exact answers computed from the raw feed: scope row
    // counts exact, per-scope distincts within 5%, overlap/only-in
    // within 10% (the published intersection envelope at lgK=12 and
    // these set sizes). ZoneMapSpec pins the exact regime, the
    // boundary-file routing and maintenance preservation.
    val path = s"$sinkRoot/agg_meta_overlap_days-${
      dir.replaceAll("[^0-9.]", "")}"
    val ev = Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")).cast("string"))
    ev.repartitionByRange(8, col("day"), col("event_id"))
      .write.mode("overwrite").partitionBy("day").parquet(path)
    graft.sources.ZoneMap.write(s, path, Seq("event_id"),
      updateCatalog = false,
      sketchCols = Seq(graft.sources.ZoneMap.ThetaTag + "user_id"))
    val days = ev.select("day").distinct().orderBy("day")
      .collect().map(_.getString(0))
    val (daysA, daysB) = days.splitAt(days.length / 2)
    val r = graft.sources.ZoneMap.metaApproxOverlap(s, path, "user_id",
      Seq(("day", daysA.head, daysA.last)),
      Seq(("day", daysB.head, daysB.last))).head()
    val exact = ev.agg(
      count(when(col("day").between(daysA.head, daysA.last), 1)).as("na"),
      count(when(col("day").between(daysB.head, daysB.last), 1)).as("nb"),
      countDistinct(when(col("day").between(daysA.head, daysA.last),
        col("user_id"))).as("da"),
      countDistinct(when(col("day").between(daysB.head, daysB.last),
        col("user_id"))).as("db")).head()
    val exactOverlap = ev
      .filter(col("day").between(daysA.head, daysA.last))
      .select("user_id").distinct()
      .intersect(ev.filter(col("day").between(daysB.head, daysB.last))
        .select("user_id").distinct())
      .count()
    require(r.getAs[Long]("n_rows_a") == exact.getAs[Long]("na") &&
        r.getAs[Long]("n_rows_b") == exact.getAs[Long]("nb"),
      s"agg_meta_overlap_days: scope row counts must be exact: $r vs $exact")
    def within(got: Long, want: Long, tol: Double, what: String): Unit =
      require(math.abs(got - want).toDouble / math.max(want, 1L) <= tol,
        s"agg_meta_overlap_days: $what off: $got vs $want")
    within(r.getAs[Long]("user_id_distinct_a"), exact.getAs[Long]("da"),
      0.05, "distinct_a")
    within(r.getAs[Long]("user_id_distinct_b"), exact.getAs[Long]("db"),
      0.05, "distinct_b")
    within(r.getAs[Long]("user_id_overlap"), exactOverlap, 0.10, "overlap")
    within(r.getAs[Long]("user_id_only_a"),
      exact.getAs[Long]("da") - exactOverlap, 0.10, "only_a")
    within(r.getAs[Long]("user_id_only_b"),
      exact.getAs[Long]("db") - exactOverlap, 0.10, "only_b")
    import s.implicits._
    Seq((r.getAs[Long]("n_rows_a"), r.getAs[Long]("n_rows_b"),
      r.getAs[Long]("user_id_distinct_a"), r.getAs[Long]("user_id_distinct_b"),
      r.getAs[Long]("user_id_overlap"), exactOverlap))
      .toDF("n_rows_a", "n_rows_b", "distinct_a", "distinct_b",
        "overlap_approx", "overlap_exact")
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
}
