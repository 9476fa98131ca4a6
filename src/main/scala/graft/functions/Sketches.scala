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
}
