package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable Count-Min frequency sketches — the FREQUENCY third of the
  * incremental-stats trio, next to HLL (distinct counts,
  * `agg_hll_mergeable`) and KLL (quantiles, `agg_kll_mergeable`): persist
  * one fixed-size CMS per ingest partition (built once, by Spark's
  * built-in `count_min_sketch` aggregate), then answer "how often did item
  * X occur over ANY range" by merging sketches — never re-scanning events.
  *
  * Spark ships the BUILD side ([[org.apache.spark.util.sketch.CountMinSketch]]
  * behind the `count_min_sketch(col, eps, confidence, seed)` SQL
  * aggregate) but no re-aggregation of the serialized sketches; this
  * object supplies that missing half. CMS merge is a cell-wise counter
  * sum, so — unlike KLL's randomized compaction — merging partials is
  * LOSSLESS: union-of-dailies is bit-identical to the one-shot sketch
  * built over the same rows at equal (eps, confidence, seed), which is
  * exactly what SketchesSpec asserts. Estimates carry the published CMS
  * one-sided guarantee: never below the true count, above it by at most
  * eps·N with the configured confidence.
  *
  * Scale shape: a sketch is eps/confidence-sized (width·depth counters),
  * independent of data volume; the merge aggregator moves only sketches
  * across the exchange (partial-aggregated map-side like any Aggregator),
  * and the per-reduce deserialize/serialize cost is bounded by the number
  * of PARTIALS (days × partitions), never by event count. Probing is a
  * per-output-row lookup over a model-sized frame — a scalar UDF is
  * acceptable there because it runs once per (group, probe), not per
  * event.
  *
  * This is the THIRD of the library's metadata tiers (README "metadata
  * tiers"): exact count/min/max/null-count compose from zone manifests
  * ([[graft.sources.ZoneMap.metaProfile]]), exact grouped SUM/COUNT/AVG
  * from maintained summaries ([[graft.plans.SummaryViews]]); sketches
  * cover what provably cannot be exact at bounded state — distincts,
  * quantiles, heavy hitters — within stated error.
  */
object Sketches {

  /** Missing-input sentinel: `Aggregator.zero` must be non-null for Spark
    * to thread it, so the empty buffer is a zero-length array and
    * `finish` maps it back to NULL (SQL aggregate convention: no rows →
    * NULL, matching `count_min_sketch` itself over an empty group). */
  private object CmsMerge
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
      combine(buf, in)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = combine(a, b)
    def finish(buf: Array[Byte]): Array[Byte] =
      if (buf == null || buf.isEmpty) null else buf
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    /** Null/empty-safe pairwise merge; incompatible shapes (different
      * eps/confidence/seed) fail loudly via
      * [[org.apache.spark.util.sketch.IncompatibleMergeException]] rather
      * than silently mixing hash spaces. */
    private def combine(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a == null || a.isEmpty) { if (b == null) Array.emptyByteArray else b }
      else if (b == null || b.isEmpty) a
      else {
        val sa = CountMinSketch.readFrom(a)
        sa.mergeInPlace(CountMinSketch.readFrom(b))
        sa.toByteArray
      }
    }
  }

  /** Aggregate: merge serialized CMS sketches (the binary produced by
    * Spark's `count_min_sketch` aggregate or a previous [[cmsMerge]]) into
    * one sketch covering their union. All inputs must share (eps,
    * confidence, seed). */
  def cmsMerge(sketch: Column): Column = udaf(CmsMerge).apply(sketch)

  private val estimateStringUdf =
    org.apache.spark.sql.functions.udf((sk: Array[Byte], item: String) =>
      if (sk == null || item == null) null
      else java.lang.Long.valueOf(
        CountMinSketch.readFrom(sk).estimateCount(item)))

  /** Point frequency estimate of a string item from a serialized sketch
    * (NULL sketch or item → NULL). Runs once per output row of a
    * sketch-sized frame — keep it off per-event paths. */
  def cmsEstimateString(sketch: Column, item: Column): Column =
    estimateStringUdf(sketch, item)

  // --- theta sketches: the set-algebra sketch (∪, ∩, \) ---------------------

  import org.apache.datasketches.memory.Memory
  import org.apache.datasketches.theta.{SetOperation, Sketches => Theta}
  import graft.functions.expressions.{ThetaSketchAgg, ThetaUnionAgg}
  import org.apache.spark.sql.GraftBridge

  /** Aggregate: theta sketch of a long/int/string/double column. Exact
    * below 2^lgK distinct values per group; ~1/sqrt(2^lgK) relative error
    * beyond. See [[graft.functions.expressions.ThetaSketchAgg]]. */
  def thetaSketch(value: Column, lgK: Int = 16): Column =
    GraftBridge.column(
      ThetaSketchAgg(GraftBridge.expression(value), lgK)
        .toAggregateExpression())

  /** Aggregate: union of serialized theta sketches — the any-range rollup
    * (empty group → empty sketch, estimate 0). */
  def thetaUnion(sketch: Column, lgK: Int = 16): Column =
    GraftBridge.column(
      ThetaUnionAgg(GraftBridge.expression(sketch), lgK)
        .toAggregateExpression())

  private def wrapTheta(b: Array[Byte]) =
    Theta.heapifySketch(Memory.wrap(b))

  private val thetaEstimateUdf =
    org.apache.spark.sql.functions.udf((sk: Array[Byte]) =>
      if (sk == null) null
      else java.lang.Double.valueOf(wrapTheta(sk).getEstimate))

  private val thetaIntersectUdf =
    org.apache.spark.sql.functions.udf((a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) null
      else java.lang.Double.valueOf(
        SetOperation.builder().buildIntersection()
          .intersect(wrapTheta(a), wrapTheta(b)).getEstimate))

  private val thetaAnotBUdf =
    org.apache.spark.sql.functions.udf((a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) null
      else java.lang.Double.valueOf(
        SetOperation.builder().buildANotB()
          .aNotB(wrapTheta(a), wrapTheta(b)).getEstimate))

  /** Distinct-count estimate of a serialized theta sketch. Exact (an
    * integer-valued double) while the sketch is in its exact regime. */
  def thetaEstimate(sketch: Column): Column = thetaEstimateUdf(sketch)

  /** |A ∩ B| estimate from two serialized sketches — the question HLL
    * cannot answer. Scalar probe over sketch-sized frames. */
  def thetaIntersectEstimate(a: Column, b: Column): Column =
    thetaIntersectUdf(a, b)

  /** |A \ B| estimate from two serialized sketches ("how many are new"). */
  def thetaAnotBEstimate(a: Column, b: Column): Column =
    thetaAnotBUdf(a, b)

  // --- frequent items: the heavy-hitters sketch (WHICH items dominate) -----

  import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
  import graft.functions.expressions.{FreqMergeAgg, FreqSketchAgg}

  /** One reported heavy hitter: the point estimate plus the sketch's
    * deterministic bounds (`lb <= true <= ub`; `ub - lb <= maximumError`,
    * which is 0 while the sketch never saturated — the exact regime). */
  case class FreqItem(item: Long, est: Long, lb: Long, ub: Long)

  /** Aggregate: frequent-items sketch of a long/int column. Exact while
    * distinct items per group stay under ~0.75·maxMapSize; beyond that,
    * Misra-Gries purges bound the error by ~3.5·N/maxMapSize. See
    * [[graft.functions.expressions.FreqSketchAgg]]. */
  def freqSketch(value: Column, maxMapSize: Int = 1024): Column =
    GraftBridge.column(
      FreqSketchAgg(GraftBridge.expression(value), maxMapSize)
        .toAggregateExpression())

  /** Aggregate: merge serialized frequency sketches — the any-range
    * rollup (empty group → empty sketch; NULL rows skipped). */
  def freqMerge(sketch: Column, maxMapSize: Int = 1024): Column =
    GraftBridge.column(
      FreqMergeAgg(GraftBridge.expression(sketch), maxMapSize)
        .toAggregateExpression())

  private val freqTopKUdf =
    org.apache.spark.sql.functions.udf((sk: Array[Byte], k: Int) =>
      if (sk == null) null
      else {
        val s = LongsSketch.getInstance(Memory.wrap(sk))
        // NO_FALSE_NEGATIVES at threshold 0 returns every retained item;
        // the deterministic (estimate desc, item asc) order makes top-k
        // reproducible — and equal to the true top-k in the exact regime.
        s.getFrequentItems(0L, ErrorType.NO_FALSE_NEGATIVES)
          .map(r => FreqItem(r.getItem, r.getEstimate, r.getLowerBound,
            r.getUpperBound))
          .sortBy(r => (-r.est, r.item))
          .take(k).toSeq
      })

  /** Top-k heavy hitters of a serialized frequency sketch as an array of
    * (item, est, lb, ub) structs, ordered by estimate desc then item asc.
    * Scalar probe over sketch-sized frames — keep it off per-event
    * paths. */
  def freqTopK(sketch: Column, k: Int): Column =
    freqTopKUdf(sketch, org.apache.spark.sql.functions.lit(k))

  private val freqMaxErrorUdf =
    org.apache.spark.sql.functions.udf((sk: Array[Byte]) =>
      if (sk == null) null
      else java.lang.Long.valueOf(
        LongsSketch.getInstance(Memory.wrap(sk)).getMaximumError))

  /** The sketch's deterministic error envelope: 0 iff every estimate it
    * reports is exact (the sketch never purged). */
  def freqMaxError(sketch: Column): Column = freqMaxErrorUdf(sketch)

  // --- frequent items over STRINGS (event types, domains, languages) -------

  import org.apache.datasketches.frequencies.{ItemsSketch => DsItemsSketch}
  import org.apache.datasketches.common.ArrayOfStringsSerDe
  import graft.functions.expressions.{FreqStringsMergeAgg, FreqStringsSketchAgg}

  /** One reported string heavy hitter — [[FreqItem]]'s categorical twin. */
  case class FreqStrItem(item: String, est: Long, lb: Long, ub: Long)

  /** Aggregate: frequent-items sketch of a STRING column (DataSketches
    * `ItemsSketch<String>`). Exactness/error regimes as [[freqSketch]]. */
  def freqSketchStr(value: Column, maxMapSize: Int = 1024): Column =
    GraftBridge.column(
      FreqStringsSketchAgg(GraftBridge.expression(value), maxMapSize)
        .toAggregateExpression())

  /** Aggregate: merge serialized STRING frequency sketches. */
  def freqMergeStr(sketch: Column, maxMapSize: Int = 1024): Column =
    GraftBridge.column(
      FreqStringsMergeAgg(GraftBridge.expression(sketch), maxMapSize)
        .toAggregateExpression())

  private val freqTopKStrUdf =
    org.apache.spark.sql.functions.udf((sk: Array[Byte], k: Int) =>
      if (sk == null) null
      else {
        val s = DsItemsSketch.getInstance(Memory.wrap(sk),
          new ArrayOfStringsSerDe)
        s.getFrequentItems(0L, ErrorType.NO_FALSE_NEGATIVES)
          .map(r => FreqStrItem(r.getItem, r.getEstimate, r.getLowerBound,
            r.getUpperBound))
          .sortBy(r => (-r.est, r.item))
          .take(k).toSeq
      })

  /** Top-k string heavy hitters, ordered (estimate desc, item asc) —
    * deterministic, and equal to the true top-k in the exact regime. */
  def freqTopKStr(sketch: Column, k: Int): Column =
    freqTopKStrUdf(sketch, org.apache.spark.sql.functions.lit(k))

  private val freqMaxErrorStrUdf =
    org.apache.spark.sql.functions.udf((sk: Array[Byte]) =>
      if (sk == null) null
      else java.lang.Long.valueOf(DsItemsSketch.getInstance(Memory.wrap(sk),
        new ArrayOfStringsSerDe).getMaximumError))

  /** [[freqMaxError]] for string sketches. */
  def freqMaxErrorStr(sketch: Column): Column = freqMaxErrorStrUdf(sketch)
}
