package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality primitives for the ingest gate of a training-data
  * pipeline: a single-pass column profiler and a declarative constraint
  * checker. Both produce small, fixed-schema summary frames — the
  * artifacts a 100 TB ingestion job publishes next to its output so the
  * next stage can decide "safe to train on?" without re-scanning.
  *
  * Profiling/validation here parallels what rigatoni leaves to its
  * destination consumers: the reference ships bytes and counts per batch
  * (`rigatoni-core/src/metrics.rs`) but has no relational engine to
  * validate content. On Spark the same scan that would merely copy the
  * data can also fold every per-column statistic in one aggregate pass.
  */
object Quality {

  /** One constraint over a table; each evaluates to a violation count. */
  sealed trait Check { def name: String }

  /** `col` must never be NULL. Scan-local. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null:$col"
  }

  /** `col` must lie in [lo, hi] (inclusive); NULLs don't violate (pair
    * with [[NotNull]] to forbid them). Scan-local. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"range:$col[$lo,$hi]"
  }

  /** `col` must be one of `values`; NULLs don't violate. Scan-local. */
  final case class AcceptedValues(col: String, values: Seq[String]) extends Check {
    def name = s"accepted:$col{${values.mkString(",")}}"
  }

  /** The column tuple must be unique across the table. One keyed
    * aggregation; violations = rows in excess of one per duplicated key. */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique:${cols.mkString(",")}"
  }

  /** Every non-NULL `col` value must exist in `parentCol` of `parent` —
    * referential integrity. One left-anti join; broadcast when the parent
    * key set is dimension-sized. */
  final case class ForeignKey(col: String, parent: DataFrame,
                              parentCol: String) extends Check {
    def name = s"fk:$col"
  }

  private def violationExpr(c: Check): Column = c match {
    case NotNull(col)      => col_(col).isNull
    case InRange(col, lo, hi) =>
      col_(col).isNotNull && (col_(col) < lo || col_(col) > hi)
    case AcceptedValues(col, vs) =>
      col_(col).isNotNull && !col_(col).isin(vs: _*)
    case other => throw new IllegalArgumentException(
      s"${other.name} is not scan-local")
  }

  private def col_(name: String) = org.apache.spark.sql.functions.col(name)

  /** Evaluate `checks` against `df` → one row per check:
    * `(check, violations, status)` with status `pass`/`fail`.
    *
    * Plan shape, deliberately stratified by what each check class needs:
    *  - ALL scan-local checks ([[NotNull]]/[[InRange]]/[[AcceptedValues]])
    *    fold into ONE aggregate over ONE scan — adding a tenth range check
    *    adds a conditional sum to the same pass, never a pass;
    *  - each [[Unique]] is one keyed count (map-side partial agg: the
    *    shuffle carries distinct keys, not rows) reduced to one row;
    *  - each [[ForeignKey]] is one anti-join reduced to one row — Catalyst
    *    broadcasts the parent side when it fits, which is the common
    *    dimension-key case.
    * The result is checks.length rows; the unions are unions of 1-row
    * frames, not data unions. */
  def runChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "runChecks needs at least one check")
    val spark = df.sparkSession

    val scanLocal = checks.collect {
      case c @ (_: NotNull | _: InRange | _: AcceptedValues) => c
    }
    val scanFrame: Option[DataFrame] =
      if (scanLocal.isEmpty) None
      else {
        // internal positional aliases: check NAMES carry `[`/`.`/`{` which
        // col() would parse as field-path syntax
        val aggs = scanLocal.zipWithIndex.map { case (c, i) =>
          // coalesce: sum over ZERO rows is NULL — an empty input must
          // read 0/'pass', matching the Unique/ForeignKey branches
          coalesce(sum(when(violationExpr(c), 1L).otherwise(0L)), lit(0L))
            .as(s"__chk_$i")
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        // melt the 1-row wide aggregate into (check, violations)
        Some(row.select(explode(array(scanLocal.zipWithIndex.map {
          case (c, i) => struct(lit(c.name).as("check"),
            col(s"__chk_$i").as("violations"))
        }: _*)).as("r")).select(col("r.check"), col("r.violations")))
      }

    val keyed = checks.collect { case u: Unique =>
      df.groupBy(u.cols.map(col_): _*)
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))
        .select(lit(u.name).as("check"), col("violations"))
    }

    val fks = checks.collect { case f: ForeignKey =>
      df.filter(col_(f.col).isNotNull)
        .join(f.parent.select(col_(f.parentCol).as(f.col)).distinct(),
          Seq(f.col), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(f.name).as("check"), col("violations"))
    }

    val all = (scanFrame.toSeq ++ keyed ++ fks).reduce(_ unionByName _)
    all.select(col("check"), col("violations"),
      when(col("violations") === 0, "pass").otherwise("fail").as("status"))
  }

  /** Pairwise Pearson correlation over numeric `cols`, every pair from
    * ONE no-grouping aggregate pass: all Σx, Σx², Σxy moments fold into
    * the same scan, decimal-routed so accumulation order is irrelevant —
    * the correlation is then one double expression over EXACT sums, and
    * engines agree where a double-folded corr() drifts in the last ulps.
    * Output `(col_a, col_b, n, corr)` for pairs in column-POSITION order;
    * rows with a NULL in either column of a pair are excluded pairwise
    * (that pair's `n` says how many survived). The moment count is
    * 6·C(k,2) — profile-sized, never data-sized. */
  def correlations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlations needs at least two columns")
    require(cols.forall(c =>
      df.schema(c).dataType.isInstanceOf[NumericType]),
      "correlations needs numeric columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (i, j)
    def dsum(c: Column) = sum(c.cast("decimal(38,8)"))
    val aggs: Seq[Column] = pairs.zipWithIndex.flatMap { case ((i, j), p) =>
      val both = col_(cols(i)).isNotNull && col_(cols(j)).isNotNull
      val x = when(both, col_(cols(i)))
      val y = when(both, col_(cols(j)))
      Seq(
        count(when(both, lit(1))).as(s"__n_$p"),
        dsum(x).as(s"__sx_$p"), dsum(y).as(s"__sy_$p"),
        dsum(x * x).as(s"__sxx_$p"), dsum(y * y).as(s"__syy_$p"),
        dsum(x * y).as(s"__sxy_$p"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(pairs.zipWithIndex.map { case ((i, j), p) =>
      val n = col(s"__n_$p").cast("double")
      val sx = col(s"__sx_$p").cast("double")
      val sy = col(s"__sy_$p").cast("double")
      val cov = n * col(s"__sxy_$p").cast("double") - sx * sy
      val vx = n * col(s"__sxx_$p").cast("double") - sx * sx
      val vy = n * col(s"__syy_$p").cast("double") - sy * sy
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        col(s"__n_$p").as("n"),
        round(cov / sqrt(vx * vy), 6).as("corr"))
    }: _*)).as("p")).select(col("p.*"))
  }

  /** Distribution DRIFT between a reference table and a current table,
    * per numeric column, as the population stability index —
    * `PSI = Σ_b (p_cur(b) − p_ref(b)) · ln(p_cur(b) / p_ref(b))` over
    * `nBuckets` equal-width buckets derived from the REFERENCE's
    * [min, max] (the published recipe: the reference pins the binning so
    * a drifted current lands in the clamp buckets instead of silently
    * re-binning). The monitoring question a training-data pipeline asks
    * between ingests: "is today's feed still yesterday's distribution?"
    * — rule of thumb: PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 major.
    *
    * Plan shape: ONE no-grouping aggregate on the reference for all
    * columns' min/max (model-sized), then ONE pass per table that melts
    * the k columns into (col, bucket) pairs and partial-aggregates counts
    * — the shuffle carries k·(nBuckets+2) count partials, never rows.
    * NULLs occupy their own bucket (−1): a null-rate change IS drift.
    * Out-of-range current values clamp to the edge buckets. A constant
    * reference column (zero width) puts everything in bucket 0.
    * Proportions are ε-smoothed (`eps`) so an empty bucket on one side
    * contributes a finite, large term instead of ±∞. Terms sum
    * decimal-routed — accumulation order cannot move the reported PSI.
    * Output: `(col_name, psi, n_ref, n_cur)`. */
  def driftPsi(reference: DataFrame, current: DataFrame, cols: Seq[String],
               nBuckets: Int = 10, eps: Double = 1e-4): DataFrame = {
    require(cols.nonEmpty, "driftPsi needs at least one column")
    cols.foreach(c => require(
      current.schema(c).dataType.isInstanceOf[NumericType],
      s"driftPsi needs numeric columns (got $c)"))
    val bounds = psiBounds(reference, cols)
    def counts(df: DataFrame) =
      psiMelted(df, cols, bounds, nBuckets)
        .groupBy(col("col_name"), col("bucket"))
        .agg(count(lit(1)).as("n"))
    psiFromCounts(counts(reference), counts(current), eps)
  }

  /** The binning model of [[driftPsi]]: the reference's per-column
    * [min, max], ONE no-grouping aggregate pass, 2k doubles. Pinning
    * these (rather than re-deriving from the current side) is the
    * published PSI recipe — a drifted current lands in the clamp buckets
    * instead of silently re-binning. Exposed so a STREAMING monitor can
    * compute them once from the reference table and bucket every
    * micro-batch under the same frozen model. */
  def psiBounds(reference: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    require(cols.nonEmpty, "psiBounds needs at least one column")
    cols.foreach(c => require(
      reference.schema(c).dataType.isInstanceOf[NumericType],
      s"psiBounds needs numeric columns (got $c)"))
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col_(c)).cast("double").as(s"__mn_$i"),
        max(col_(c)).cast("double").as(s"__mx_$i"))
    }
    val mm = reference.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      val mn = if (mm.isNullAt(2 * i)) 0.0 else mm.getDouble(2 * i)
      val mx = if (mm.isNullAt(2 * i + 1)) 0.0 else mm.getDouble(2 * i + 1)
      (mn, mx)
    }
  }

  /** Melt k columns to (col_name, bucket) rows under a pinned binning
    * model — a PURE NARROW projection (explode + scan-local arithmetic:
    * no aggregate, no shuffle, no state), so it drops onto a streaming
    * DataFrame unchanged; the caller picks the aggregation (batch
    * groupBy here, incremental state-store counts on a stream). NULLs
    * bucket to −1 (a null-rate change IS drift); out-of-range values
    * clamp to the edge buckets; a zero-width column buckets everything
    * to 0. */
  def psiMelted(df: DataFrame, cols: Seq[String],
                bounds: Seq[(Double, Double)], nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2 (got $nBuckets)")
    require(bounds.length == cols.length, "one (min,max) per column")
    val pairs = cols.zipWithIndex.map { case (c, i) =>
      val (mn, mx) = bounds(i)
      val b =
        if (mx <= mn) when(col_(c).isNull, lit(-1)).otherwise(lit(0))
        else when(col_(c).isNull, lit(-1)).otherwise(
          least(greatest(
            floor((col_(c).cast("double") - mn) / ((mx - mn) / nBuckets))
              .cast("int"), lit(0)), lit(nBuckets - 1)))
      struct(lit(c).as("col_name"), b.as("bucket"))
    }
    df.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.bucket").as("bucket"))
  }

  /** PSI per GROUP — the segment-resolution drift question the
    * whole-table monitor can't answer: "WHICH event type / source /
    * tenant moved between reference and current?" One value column,
    * one grouping column; the binning model is pinned GLOBALLY from the
    * reference (one min/max pass) so groups share comparable buckets —
    * and then each group gets its own full-resolution PSI over
    * (group, bucket) count partials. Same scale shape as [[driftPsi]]
    * (the shuffle carries groups·(nBuckets+2) count rows, never data),
    * same ε-smoothing/decimal-routing via [[psiFromCounts]] — the group
    * key simply rides where the column name rode. Groups NULL on either
    * side are a '∅' group (a null-segment change is drift). Output:
    * `(groupCol, psi, n_ref, n_cur)`. */
  def driftPsiByGroup(reference: DataFrame, current: DataFrame,
                      valueCol: String, groupCol: String,
                      nBuckets: Int = 10, eps: Double = 1e-4): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2 (got $nBuckets)")
    val bounds = psiBounds(reference, Seq(valueCol))
    // the same bucket rule psiMelted compiles, inlined with the group
    // value riding as the key
    val (mn, mx) = bounds.head
    val v = col_(valueCol)
    val b =
      if (mx <= mn) when(v.isNull, lit(-1)).otherwise(lit(0))
      else when(v.isNull, lit(-1)).otherwise(
        least(greatest(
          floor((v.cast("double") - mn) / ((mx - mn) / nBuckets))
            .cast("int"), lit(0)), lit(nBuckets - 1)))
    def bucketCounts(df: DataFrame) = df
      .select(coalesce(col_(groupCol).cast("string"), lit("∅")).as("col_name"),
        b.as("bucket"))
      .groupBy(col("col_name"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    psiFromCounts(bucketCounts(reference), bucketCounts(current), eps)
      .withColumnRenamed("col_name", groupCol)
  }

  /** The PSI finisher over two bucket-count tables `(col_name, bucket,
    * n)` — model-sized inputs (k·(nBuckets+2) rows), so this runs in
    * milliseconds wherever the counts came from: [[driftPsi]]'s batch
    * aggregation or a streaming monitor's state store. A zero-padded
    * union + per-key sum aligns buckets empty on one side; proportions are ε-smoothed; terms sum
    * decimal-routed so accumulation order cannot move the reported PSI.
    * Output: `(col_name, psi, n_ref, n_cur)`. */
  def psiFromCounts(refCounts: DataFrame, curCounts: DataFrame,
                    eps: Double = 1e-4): DataFrame = {
    // Bucket alignment is a union + one summed aggregate, not a FULL
    // OUTER join: each side carries its key at most once, so summing
    // zero-padded sides per key is exactly the join's coalesce-to-0 —
    // same rows, same longs — without the SortMergeJoin FullOuter and
    // its two sorted exchanges (guide §2.4; the inputs are
    // k·(nBuckets+2)-bounded count tables).
    val ref = refCounts.select(col("col_name"), col("bucket"),
      col("n").as("n_ref"), lit(0L).as("n_cur"))
    val cur = curCounts.select(col("col_name"), col("bucket"),
      lit(0L).as("n_ref"), col("n").as("n_cur"))
    val totals = Window.partitionBy(col("col_name"))
    ref.unionAll(cur)
      .groupBy(col("col_name"), col("bucket"))
      .agg(sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"))
      .withColumn("__tr", sum(col("n_ref")).over(totals))
      .withColumn("__tc", sum(col("n_cur")).over(totals))
      .withColumn("__pr",
        greatest(col("n_ref") / col("__tr"), lit(eps)))
      .withColumn("__pc",
        greatest(col("n_cur") / col("__tc"), lit(eps)))
      .groupBy(col("col_name"))
      .agg(
        round(sum(((col("__pc") - col("__pr")) *
            log(col("__pc") / col("__pr"))).cast("decimal(38,12)"))
          .cast("double"), 6).as("psi"),
        max(col("__tr")).as("n_ref"),
        max(col("__tc")).as("n_cur"))
  }

  /** Distribution drift as the two-sample Kolmogorov–Smirnov statistic —
    * the binning-free sibling of [[driftPsi]]: per numeric column,
    * `KS = sup_x |F_ref(x) − F_cur(x)|` over the empirical CDFs. Where
    * PSI answers "how much mass moved between my 10 buckets", KS answers
    * "what is the worst-case CDF gap anywhere" — it catches a tight shift
    * inside one PSI bucket that equal-width binning averages away, and it
    * has no binning hyper-parameter to tune per column.
    *
    * Plan shape: ONE pass per table melts the k columns into
    * (col, value) pairs and partial-aggregates counts, so the shuffle
    * carries one row per DISTINCT value per column, never data rows; a
    * zero-padded union merge plus a per-column running sum turns counts
    * into CDFs. The per-column window sorts NDV rows with parallelism = k —
    * fine for ids/categories/quantized metrics; for a truly continuous
    * 100 TB column, round upstream or take quantiles from the mergeable
    * KLL sketch ([[graft.functions.Sketches]]) and difference those
    * instead. NULLs are excluded (KS is defined over values); a null-RATE
    * change is [[driftPsi]]'s bucket −1 job. Counts are integers and the
    * max over exact rational CDF gaps is order-independent, so the
    * reported statistic is engine-portable.
    *
    * Output: `(col_name, ks, n_ref, n_cur)` — n_* are non-null counts;
    * rule of thumb at these sizes: reject when
    * `ks > c(α)·sqrt((n_ref+n_cur)/(n_ref·n_cur))`, c(0.05) ≈ 1.36. */
  def driftKs(reference: DataFrame, current: DataFrame,
              cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "driftKs needs at least one column")
    cols.foreach(c => require(
      reference.schema(c).dataType.isInstanceOf[NumericType] &&
        current.schema(c).dataType.isInstanceOf[NumericType],
      s"driftKs needs numeric columns (got $c)"))
    def counted(df: DataFrame): DataFrame = {
      val pairs = cols.map(c =>
        struct(lit(c).as("col_name"), col_(c).cast("double").as("v")))
      df.select(explode(array(pairs: _*)).as("p"))
        .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("col_name"), col("v"))
        .agg(count(lit(1)).as("n"))
    }
    // same union-instead-of-FULL-OUTER alignment as [[psiFromCounts]]:
    // per-key sums of zero-padded sides == the join's coalesce-to-0
    val ref = counted(reference).select(col("col_name"), col("v"),
      col("n").as("n_ref"), lit(0L).as("n_cur"))
    val cur = counted(current).select(col("col_name"), col("v"),
      lit(0L).as("n_ref"), col("n").as("n_cur"))
    val byVal = Window.partitionBy(col("col_name")).orderBy(col("v"))
    val whole = Window.partitionBy(col("col_name"))
    ref.unionAll(cur)
      .groupBy(col("col_name"), col("v"))
      .agg(sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"))
      .withColumn("__cr", sum(col("n_ref")).over(byVal))
      .withColumn("__cc", sum(col("n_cur")).over(byVal))
      .withColumn("__tr", sum(col("n_ref")).over(whole))
      .withColumn("__tc", sum(col("n_cur")).over(whole))
      .groupBy(col("col_name"))
      .agg(
        round(max(abs(col("__cr") / col("__tr") - col("__cc") / col("__tc"))),
          6).as("ks"),
        max(col("__tr")).as("n_ref"),
        max(col("__tc")).as("n_cur"))
  }

  /** The 100 TB path [[driftKs]]'s scaladoc promises: approximate
    * two-sample KS from MERGEABLE KLL sketches (DataSketches, built into
    * Spark 4) instead of exact per-value counts. Where exact KS shuffles
    * one count row per distinct value (NDV-bounded — fine for discrete
    * columns, quadratic-ish pain for a continuous 100 TB metric), this
    * folds each side into ONE fixed-size sketch per column: the shuffle
    * carries k sketch partials (KBs), the per-column "sort" disappears,
    * and — because KLL merges losslessly within its rank-error bound —
    * the same sketches can be persisted per ingest partition and
    * differenced over ANY date range later without re-scanning
    * (the agg_kll_mergeable architecture, applied to drift).
    *
    * Estimation: each side's CDF is read back from its sketch as a
    * `grid`-point quantile curve; `KS ≈ max over both curves' points of
    * |F_ref − F_cur|`, each F estimated as the fraction of its OWN curve
    * ≤ x (step interpolation). Error ≤ grid resolution (1/grid, 0.8% at
    * the default 128) + twice the KLL rank error (~1.65% at k=200) —
    * QualitySpec gates |approx − exact| ≤ 0.05 against [[driftKs]]. KLL compaction is RANDOMIZED, so
    * readings vary run to run inside the bound (no_oracle by nature,
    * like the other sketch entries). The curve arithmetic runs as
    * interpreted HOFs — correct here because inputs are k rows of
    * (grid+1)-point arrays, model-sized by construction, never the
    * corpus. Output: `(col_name, ks_approx, n_ref, n_cur)`. */
  def driftKsSketch(reference: DataFrame, current: DataFrame,
                    cols: Seq[String], k: Int = 200,
                    grid: Int = 128): DataFrame = {
    require(cols.nonEmpty, "driftKsSketch needs at least one column")
    require(grid >= 16, s"grid must be >= 16 (got $grid)")
    cols.foreach(c => require(
      reference.schema(c).dataType.isInstanceOf[NumericType] &&
        current.schema(c).dataType.isInstanceOf[NumericType],
      s"driftKsSketch needs numeric columns (got $c)"))
    def sketched(df: DataFrame, side: String): DataFrame = {
      val pairs = cols.map(c =>
        struct(lit(c).as("col_name"), col_(c).cast("double").as("v")))
      df.select(explode(array(pairs: _*)).as("p"))
        .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("col_name"))
        .agg(expr(s"kll_sketch_agg_double(v, $k)").as(s"sk_$side"),
          count(lit(1)).as(s"n_$side"))
    }
    sketched(reference, "ref").join(sketched(current, "cur"), "col_name")
      .withColumn("__qr", quantileCurve(col("sk_ref"), grid))
      .withColumn("__qc", quantileCurve(col("sk_cur"), grid))
      .select(col("col_name"),
        round(ksGapFromCurves(col("__qr"), col("__qc"), grid), 6)
          .as("ks_approx"),
        col("n_ref"), col("n_cur"))
  }

  /** A KLL sketch read back as a (grid+1)-point quantile curve. The
    * sketch function requires a FOLDABLE rank, so the curve unrolls as
    * grid+1 literal-rank calls — (grid+1) exprs over model-sized rows,
    * not a corpus-wide unrolled plan (the Hilbert lesson does not
    * apply). */
  private def quantileCurve(sk: Column, grid: Int): Column =
    array((0 to grid).map(i =>
      call_function("kll_sketch_get_quantile_double",
        sk, lit(i.toDouble / grid))): _*)

  /** Max CDF gap between two quantile curves: each side's F estimated as
    * the fraction of its OWN curve ≤ x (step interpolation), evaluated
    * at both curves' points. Pass MATERIALIZED curve columns (withColumn
    * first), not raw `quantileCurve` calls — the expression references
    * each curve three times. */
  private def ksGapFromCurves(qa: Column, qb: Column, grid: Int): Column = {
    def cdfAt(curveCol: Column, x: Column): Column =
      size(filter(curveCol, q => q <= x)).cast("double") /
        lit((grid + 1).toDouble)
    array_max(transform(concat(qa, qb),
      x => abs(cdfAt(qa, x) - cdfAt(qb, x))))
  }

  /** Day-over-day drift TIMELINE from daily KLL sketches — the
    * monitoring architecture [[driftKsSketch]] enables, composed: fold
    * each ingest day into one fixed-size quantile sketch (the artifact a
    * 100 TB pipeline would PERSIST next to the day's partition, exactly
    * as `agg_kll_mergeable` persists weekly rollups), then difference
    * consecutive days' curves for an approximate KS per day — "which
    * ingest day broke the feed?" answered over any history WITHOUT
    * re-scanning a single data row: the timeline costs one pass over
    * the table (or zero, reading persisted sketches) plus arithmetic on
    * one model-sized row per day.
    *
    * The day-ordered `lag` window is a single partition BY DESIGN: its
    * input is one sketch row per day (bounded by calendar, not data) —
    * same justification as the profiler's summary frames. Readings
    * inherit [[driftKsSketch]]'s error bound; QualitySpec gates the
    * timeline against the exact per-day-pair statistic. NULL values are
    * excluded scan-side (KS is over values); `n` is the day's non-null
    * count. Output: `(day, prev_day, ks_vs_prev, n)` — the first day has
    * no predecessor and is not emitted. */
  def driftTimeline(df: DataFrame, valueCol: String, tsCol: String,
                    k: Int = 200, grid: Int = 128): DataFrame = {
    require(grid >= 16, s"grid must be >= 16 (got $grid)")
    require(df.schema(valueCol).dataType.isInstanceOf[NumericType],
      s"driftTimeline needs a numeric value column (got $valueCol)")
    val daily = df.filter(col_(valueCol).isNotNull)
      .groupBy(to_date(col_(tsCol)).as("day"))
      .agg(expr(s"kll_sketch_agg_double(CAST($valueCol AS DOUBLE), $k)")
        .as("sk"),
        count(lit(1)).as("n"))
    val byDay = Window.orderBy(col("day"))
    daily
      .withColumn("prev_sk", lag(col("sk"), 1).over(byDay))
      .withColumn("prev_day", lag(col("day"), 1).over(byDay))
      .filter(col("prev_sk").isNotNull)
      .withColumn("__qa", quantileCurve(col("prev_sk"), grid))
      .withColumn("__qb", quantileCurve(col("sk"), grid))
      .select(col("day"), col("prev_day"),
        round(ksGapFromCurves(col("__qa"), col("__qb"), grid), 6)
          .as("ks_vs_prev"),
        col("n"))
  }

  /** Distribution drift for CATEGORICAL columns — the third leg of the
    * drift suite ([[driftPsi]] equal-width numeric, [[driftKs]]
    * binning-free numeric): per string column, PSI over category
    * proportions plus Pearson's chi-square statistic against the
    * reference proportions. The monitoring question for the discrete
    * dimensions of a feed (lang, source, event_type): "did today's
    * category mix move?" — a new language appearing, a source going
    * dark, a label flipping majority all land here, invisible to the
    * numeric legs.
    *
    * Plan shape: ONE melted pass per table partial-aggregates
    * (col, category) counts — the shuffle carries one row per category
    * per column, never data rows; a zero-padded union + per-key sum aligns the two
    * sides so categories seen on only one side still contribute. NULL is
    * a first-class category (sentinel '∅' — a null-rate change IS mix
    * drift here, matching driftPsi's bucket −1 policy). PSI proportions
    * are ε-smoothed exactly like [[driftPsi]]; chi-square expected counts
    * are add-half smoothed (`(n_ref + 0.5) / (tr + 0.5·k)`) so a
    * category absent from the reference contributes a finite term. Both
    * term sums are decimal-routed — accumulation order cannot move the
    * reported statistics.
    *
    * Output: `(col_name, psi, chi2, n_categories, n_ref, n_cur)`;
    * chi-square's null reference is the chi2(k−1) distribution — at
    * these df, chi2 > ~3·k already means a real mix change. */
  def driftCategorical(reference: DataFrame, current: DataFrame,
                       cols: Seq[String], eps: Double = 1e-4): DataFrame = {
    require(cols.nonEmpty, "driftCategorical needs at least one column")
    cols.foreach(c => require(
      reference.schema(c).dataType == StringType &&
        current.schema(c).dataType == StringType,
      s"driftCategorical needs string columns (got $c)"))
    def counted(df: DataFrame): DataFrame = {
      val pairs = cols.map(c =>
        struct(lit(c).as("col_name"),
          coalesce(col_(c), lit("∅")).as("cat")))
      df.select(explode(array(pairs: _*)).as("p"))
        .groupBy(col("p.col_name").as("col_name"), col("p.cat").as("cat"))
        .agg(count(lit(1)).as("n"))
    }
    // same union-instead-of-FULL-OUTER alignment as [[psiFromCounts]]
    val ref = counted(reference).select(col("col_name"), col("cat"),
      col("n").as("n_ref"), lit(0L).as("n_cur"))
    val cur = counted(current).select(col("col_name"), col("cat"),
      lit(0L).as("n_ref"), col("n").as("n_cur"))
    val whole = Window.partitionBy(col("col_name"))
    ref.unionAll(cur)
      .groupBy(col("col_name"), col("cat"))
      .agg(sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"))
      .withColumn("__tr", sum(col("n_ref")).over(whole))
      .withColumn("__tc", sum(col("n_cur")).over(whole))
      .withColumn("__k", count(lit(1)).over(whole))
      // ANSI guards: an empty side has a zero total — proportions fall
      // back to ε and the expected count to a dummy 1 (chi2 is nulled
      // below for that case), instead of ANSI DIVIDE_BY_ZERO aborting
      .withColumn("__pr", greatest(
        when(col("__tr") > 0, col("n_ref") / col("__tr")).otherwise(lit(0.0)),
        lit(eps)))
      .withColumn("__pc", greatest(
        when(col("__tc") > 0, col("n_cur") / col("__tc")).otherwise(lit(0.0)),
        lit(eps)))
      // add-half smoothed expected count for the chi-square term
      .withColumn("__e",
        when(col("__tc") > 0, col("__tc") * (col("n_ref") + lit(0.5)) /
          (col("__tr") + lit(0.5) * col("__k"))).otherwise(lit(1.0)))
      .groupBy(col("col_name"))
      .agg(
        round(sum(((col("__pc") - col("__pr")) *
            log(col("__pc") / col("__pr"))).cast("decimal(38,12)"))
          .cast("double"), 6).as("psi"),
        round(sum(((col("n_cur") - col("__e")) * (col("n_cur") - col("__e")) /
            col("__e")).cast("decimal(38,12)"))
          .cast("double"), 6).as("chi2"),
        max(col("__k")).as("n_categories"),
        max(col("__tr")).as("n_ref"),
        max(col("__tc")).as("n_cur"))
      // chi-square against an EMPTY side is undefined (every expected
      // count is 0 → 0/0): report NULL, not NaN — PSI stays finite via
      // its ε-smoothing and still reads the drift
      .withColumn("chi2",
        when(col("n_ref") > 0 && col("n_cur") > 0, col("chi2")))
  }

  /** EQUI-DEPTH histogram of a numeric column — the profiler feature
    * [[profile]] stops short of: `nBuckets` buckets holding (near-)equal
    * row counts, with each bucket's observed [lo, hi] — the shape
    * equal-WIDTH histograms get wrong on skewed data, where one bucket
    * swallows the distribution and the rest sit empty (and the boundary
    * artifact an optimizer's NDV/selectivity estimates are built on).
    *
    * Construction: one percentile pass yields the nBuckets−1 interior
    * boundaries (exact = the oracle-parity mode; swap `exact=false` for
    * the approx_percentile sketch at 100 TB, same shape); each value's
    * bucket is then the COUNT OF BOUNDARIES BELOW IT — a pinned,
    * engine-replayable rule (ties land in the lower bucket) compiled as
    * a codegen'd sum of comparisons against nBuckets−1 broadcast
    * literals, never an interpreted loop; one grouped count/min/max pass
    * finishes. Buckets deviate from n/nBuckets exactly where tied values
    * straddle a boundary — the honest answer (a value equal to the
    * boundary cannot be split). NULLs are excluded ([[profile]] counts
    * them). Output: `(bucket, n, lo, hi)`, bucket 0-indexed; empty
    * buckets (possible under heavy ties) simply don't appear. */
  def histogram(df: DataFrame, valueCol: String, nBuckets: Int = 10,
                exact: Boolean = true): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2 (got $nBuckets)")
    require(df.schema(valueCol).dataType.isInstanceOf[NumericType],
      s"histogram needs a numeric column (got $valueCol)")
    val vals = df.filter(col_(valueCol).isNotNull)
      .select(col_(valueCol).cast("double").as("__x"))
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val pcts = array(ps.map(lit): _*)
    val brow = vals.agg(
      (if (exact) percentile(col("__x"), pcts)
       else approx_percentile(col("__x"), pcts, lit(10000))).as("bs"))
      .head()
    if (brow.isNullAt(0)) return vals.limit(0)
      .select(lit(0).as("bucket"), lit(0L).as("n"),
        col("__x").as("lo"), col("__x").as("hi"))
    val bs = brow.getSeq[Double](0)
    val bucket = bs.map(b => (col("__x") > lit(b)).cast("int"))
      .reduce(_ + _)
    vals.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("__x")), 6).as("lo"),
        round(max(col("__x")), 6).as("hi"))
  }

  /** Robust per-group outlier detection — the modified z-score over
    * median/MAD (Iglewicz & Hoaglin 1993, the published robust recipe):
    * a value is an outlier in its group when
    * `|x − median| / (1.4826 · MAD) > threshold` (default 3.5, the
    * recommended cut). Mean/stddev outlier rules break on the data they
    * are supposed to catch — one wild value drags the mean toward itself
    * and inflates the stddev until nothing is flagged; median and MAD
    * have a 50% breakdown point, so the gate stays honest under heavy
    * contamination. The quality question between ingests: "which metric
    * groups carry broken values, and how many?"
    *
    * Policy edges, pinned: NULL values are excluded (a null is
    * [[NotNull]]'s job, not an outlier); a zero-MAD group (over half the
    * group identical) flags every value that deviates AT ALL — a
    * constant metric that moved is the clearest break there is.
    *
    * Plan shape: two grouped EXACT percentile passes (median, then MAD
    * over |x − median|) plus one counting pass, with the group-stats
    * table broadcast back between passes (it is group-cardinality-sized,
    * never data-sized). Exact percentiles buffer a group's values — the
    * oracle-parity choice (Spark `percentile` == DuckDB quantile_cont);
    * at 100 TB swap `approx_percentile` in, same shape (the
    * agg_percentiles entry documents the same trade).
    *
    * Output: `(groupCol, n, median, mad, n_outliers)`. */
  def outliersMad(df: DataFrame, valueCol: String, groupCol: String,
                  threshold: Double = 3.5,
                  exact: Boolean = true): DataFrame = {
    require(threshold > 0, s"threshold must be > 0 (got $threshold)")
    require(df.schema(valueCol).dataType.isInstanceOf[NumericType],
      s"outliersMad needs a numeric value column (got $valueCol)")
    // exact = the oracle-parity mode (buffers a group's values);
    // exact=false = the 100 TB mode: approx_percentile folds a bounded
    // sketch per group instead — same three-pass shape, bounded memory
    // (QualitySpec gates the two modes against each other)
    def p50(c: Column): Column =
      if (exact) percentile(c, lit(0.5))
      else approx_percentile(c, lit(0.5), lit(10000))
    val vals = df.filter(col_(valueCol).isNotNull)
      .select(col_(groupCol), col_(valueCol).cast("double").as("__x"))
    val med = vals.groupBy(col_(groupCol))
      .agg(p50(col("__x")).as("__med"))
    val dev = vals.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col("__x") - col("__med")))
    val mad = dev.groupBy(col_(groupCol))
      .agg(p50(col("__dev")).as("__mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .withColumn("__out",
        when(col("__mad") > 0,
          col("__dev") / (lit(1.4826) * col("__mad")) > threshold)
          .otherwise(col("__dev") > 0))
      .groupBy(col_(groupCol))
      .agg(count(lit(1)).as("n"),
        round(max(col("__med")), 6).as("median"),
        round(max(col("__mad")), 6).as("mad"),
        count(when(col("__out"), 1)).as("n_outliers"))
  }

  /** Row-level gate — the streaming-safe sibling of [[runChecks]]: tag
    * each row with the FIRST scan-local check it violates (`null` = the
    * row is valid), in `checks` order. A pure narrow projection — no
    * aggregate, no shuffle, no state — so it drops into a streaming
    * `transform` unchanged: route `quarantine_reason IS NULL` to the
    * sink and the rest to the dead-letter path, which is exactly the
    * at-scale answer to "one malformed row must not kill (or silently
    * pollute) a 100 TB load". Only scan-local checks are allowed —
    * Unique/ForeignKey are not row-local facts. */
  def quarantine(df: DataFrame, checks: Seq[Check],
                 reasonCol: String = "quarantine_reason"): DataFrame = {
    require(checks.nonEmpty, "quarantine needs at least one check")
    require(!df.columns.contains(reasonCol),
      s"input already has a '$reasonCol' column")
    val tagged = checks.map(c => when(violationExpr(c), lit(c.name)))
    df.withColumn(reasonCol, coalesce(tagged: _*))
  }

  /** [[quarantine]] split into (valid, quarantined-with-reason). */
  def split(df: DataFrame, checks: Seq[Check],
            reasonCol: String = "quarantine_reason")
      : (DataFrame, DataFrame) = {
    val tagged = quarantine(df, checks, reasonCol)
    (tagged.filter(col(reasonCol).isNull).drop(reasonCol),
      tagged.filter(col(reasonCol).isNotNull))
  }

  /** Single-pass column profiler: per column —
    * `(col_name, n_rows, n_nulls, null_frac, n_distinct, min_value,
    * max_value, avg_value)`.
    *
    * Every statistic for every column folds into ONE no-grouping aggregate
    * (partial-agg'd to a single row), then the 1-row result melts to
    * columns.length rows driver-side — the scan count does not grow with
    * the column count. min/max are computed on the NATIVE type (numeric/
    * temporal ordering, not lexicographic) and cast to string only for the
    * uniform output schema. avg is decimal-routed (exact accumulation,
    * order-free) and only emitted for numeric columns.
    *
    * Exact-distinct plan note: `countDistinct(a), countDistinct(b), min,
    * max…` in ONE agg is a trap — Catalyst's multi-distinct rewrite
    * expands the scan ×(k+1) and the string-buffered `first(min(…))`
    * shims force the whole expanded set through a SORT aggregate (an
    * n·k sort on a k+1-column key; measured 11 s on 600 K rows where
    * this shape takes ~1 s). So exact mode runs the distincts as their
    * own narrow pass: explode to (col_idx, value-string) pairs and
    * hash-dedup them — map-side partial aggregation means the shuffle
    * carries each partition's DISTINCT pairs, not its rows. Two
    * column-pruned scans total. `exact = false` swaps the distinct pass
    * for HLL sketches (`approx_count_distinct` at `rsd` relative standard
    * deviation, sketch ∝ 1/rsd²) folded into the stats pass — ONE scan,
    * zero extra shuffle: the 100 TB default. */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = true, rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    def isNumeric(c: String) =
      schema(c).dataType.isInstanceOf[NumericType]
    // injective string image for the distinct pass: Spark's shortest-
    // round-trip float formatting is 1:1 except -0.0 vs 0.0, which
    // countDistinct (and SQL DISTINCT) treat as equal — normalize first
    def distinctImage(c: String): Column = schema(c).dataType match {
      case DoubleType | FloatType =>
        val v = col_(c)
        when(v === 0.0, lit(0.0)).otherwise(v).cast("string")
      case _ => col_(c).cast("string")
    }

    // internal aliases are INDEX-based, never name-based: a profiled
    // column named `a.b` must not turn an alias into field-path syntax
    val aggs: Seq[Column] = count(lit(1)).as("__rows") +:
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          count(col_(c)).as(s"__nn_$i"),
          min(col_(c)).cast("string").as(s"__min_$i"),
          max(col_(c)).cast("string").as(s"__max_$i")) ++
          (if (exact) Nil
           else Seq(approx_count_distinct(col_(c), rsd).as(s"__nd_$i"))) ++
          (if (isNumeric(c))
            Seq((sum(col_(c).cast("decimal(38,6)")).cast("double") /
              count(col_(c))).as(s"__avg_$i"))
          else Nil)
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val melted = row.select(explode(array(cols.zipWithIndex.map {
      case (c, i) =>
        struct(
          lit(i).as("__idx"),
          lit(c).as("col_name"),
          col("__rows").as("n_rows"),
          (col("__rows") - col(s"__nn_$i")).as("n_nulls"),
          round((col("__rows") - col(s"__nn_$i")).cast("double") /
            col("__rows"), 6).as("null_frac"),
          (if (exact) lit(0L) else col(s"__nd_$i")).as("n_distinct"),
          col(s"__min_$i").as("min_value"),
          col(s"__max_$i").as("max_value"),
          (if (isNumeric(c)) round(col(s"__avg_$i"), 6)
           else lit(null).cast("double")).as("avg_value"))
    }: _*)).as("p")).select(col("p.*"))

    val out =
      if (!exact) melted
      else {
        val nd = df.select(explode(array(cols.zipWithIndex.map {
            case (c, i) => struct(lit(i).as("__idx"),
              distinctImage(c).as("__val"))
          }: _*)).as("kv"))
          .select(col("kv.__idx").as("__idx"), col("kv.__val").as("__val"))
          .filter(col("__val").isNotNull)
          .distinct()
          .groupBy(col("__idx"))
          .agg(count(lit(1)).as("__nd"))
        // left join: an all-NULL column has no distinct pairs at all
        melted.drop("n_distinct")
          .join(broadcast(nd), Seq("__idx"), "left")
          .withColumn("n_distinct", coalesce(col("__nd"), lit(0L)))
          .drop("__nd")
      }
    out.select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("null_frac"), col("n_distinct"), col("min_value"),
        col("max_value"), col("avg_value"))
      .orderBy(col("col_name"))
  }

  /** Approximate functional-dependency discovery — does `determinant →
    * dependent` hold, and if not, how badly is it broken? The schema
    * question a profiler answers BEFORE a pipeline trusts a column as a
    * join key, a partition key, or a dedup identity ("is doc_id really
    * one source?", "does user_id pin country?"). Strength is the
    * published g3 measure (Kivinen & Mannila, TCS '95): the minimum
    * fraction of rows to delete for the FD to hold exactly —
    * `violation_rows = Σ_groups (group size − modal dependent count)`,
    * `strength = 1 − violation_rows / n_rows`. A candidate KEY reads as
    * a determinant whose every FD holds with one row per group.
    *
    * Plan shape: ONE scan — each row explodes to its k (determinant,
    * dependent) cells, then two partial-aggregated groupBys whose shuffle
    * carries DISTINCT value cells, never rows (the second and third
    * reductions run over group-count-sized data). No per-pair rescans, no
    * windows, no driver state: at 100 TB the wide state is the distinct
    * (pair, lhs, rhs) combination count, the same bound a
    * `countDistinct` profile pays. NULLs are first-class `∅` values on
    * both sides (an FD that "holds" only because NULLs vanished is a
    * false positive — the [[driftPsiByGroup]] ∅-segment discipline).
    *
    * Output per pair: `(determinant, dependent, n_groups,
    * violating_groups, violation_rows, n_rows, holds, strength)`;
    * strength is one long-ratio division, engine-identical. */
  def fdProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "fdProfile needs at least one (lhs, rhs) pair")
    val cells = df.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("determinant"), lit(b).as("dependent"),
          coalesce(col_(a).cast("string"), lit("∅")).as("lhs"),
          coalesce(col_(b).cast("string"), lit("∅")).as("rhs"))
      }: _*)).as("p")).select(col("p.*"))
      .groupBy(col("determinant"), col("dependent"), col("lhs"), col("rhs"))
      .agg(count(lit(1)).as("cnt"))
    val groups = cells
      .groupBy(col("determinant"), col("dependent"), col("lhs"))
      .agg(count(lit(1)).as("nd"), sum(col("cnt")).as("n"),
        max(col("cnt")).as("modal"))
    groups.groupBy(col("determinant"), col("dependent"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("violating_groups"),
        sum(col("n") - col("modal")).as("violation_rows"),
        sum(col("n")).as("n_rows"))
      .withColumn("holds", col("violating_groups") === 0)
      .withColumn("strength",
        lit(1.0) - col("violation_rows").cast("double") /
          col("n_rows").cast("double"))
  }
}
