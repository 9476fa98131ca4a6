package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no built-in operator for, expressed in shapes
  * that survive 100 TB: an as-of join that never materializes candidate
  * pairs (union + one keyed shuffle + a running window, the kdb/Flink
  * "last value at or before" semantic), and a banded range join that turns
  * an inequality-only predicate into an equi-join on time buckets so
  * Catalyst plans a hash join instead of a broadcast-nested-loop product.
  *
  * Neither exists in the reference (rigatoni joins nothing — its enrichment
  * path is a stream-static lookup); these extend the §7.4 training-pipeline
  * surface where event feeds must be stitched to the most recent dimension
  * snapshot (as-of) or windowed activity (range) at corpus scale.
  */
object AsOf {

  /** Left as-of join: every `left` row picks the LAST `right` row with the
    * same key and `rightTime <= leftTime` (inclusive), or nulls when none
    * precedes it. `payload` columns from `right` ride along under their own
    * names (they must not collide with `left` column names).
    *
    * Shape: `union → repartition(key) → running last_value` — ONE shuffle
    * of |L|+|R| rows and no pair materialization, vs. the naive
    * `L ⋈ R on key ∧ t≤T → rank` whose inner join explodes to every
    * (row, earlier-row) pair (quadratic per hot key). Window state is a
    * single row (running last), so memory is flat regardless of key skew.
    *
    * Ties: at equal timestamps right rows sort BEFORE left rows (so a
    * same-instant right row IS visible, the inclusive contract), and equal
    * right timestamps resolve to the largest `(rightTime, tiebreak)` struct
    * — pass a unique `tiebreak` column for a total order.
    *
    * NULL semantics match the SQL join the operator replaces: a right row
    * with a NULL key or NULL time can never satisfy `key = key AND t <= T`
    * and is excluded up front — without that filter the window's
    * partitionBy would group NULL keys TOGETHER (and sort NULL times
    * first), silently handing null-key left rows another null-key row's
    * payload. Null-key left rows still come back, null-extended. */
  def asOfJoin(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String], tiebreak: String): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      s"payload ${payload.mkString(",")} collides with left columns")
    // result extraction walks struct field PATHS, so dotted names would
    // mis-parse as nested access and the internal (__rt, __tb) slots must
    // stay unique inside the payload struct
    require((leftCols ++ payload).forall(c => !c.contains(".")),
      "asOfJoin does not support column names containing '.' — rename first")
    require(!payload.exists(Set("__rt", "__tb")),
      "payload columns may not be named __rt or __tb (internal slots)")
    // __p carries (rightTime, tiebreak, payload...): its ASCENDING struct
    // order makes "last" = greatest (time, tiebreak) — the deterministic
    // winner under timestamp ties
    val rowType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rPrep = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
      col(rightKey).as("__key"), col(rightTime).as("__t"), lit(0).as("__side"),
      struct((col(rightTime).as("__rt") +: col(tiebreak).as("__tb") +:
        payload.map(col)): _*).as("__p"),
      lit(null).cast(rowType).as("__row"))
    val lPrep = left.select(
      col(leftKey).as("__key"), col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(rPrep.schema("__p").dataType).as("__p"),
      struct(leftCols.map(col): _*).as("__row"))
    val w = Window.partitionBy("__key")
      .orderBy(col("__t").asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rPrep.unionByName(lPrep)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(
      (leftCols.map(c => col(s"__row.$c").as(c)) ++
        payload.map(c => col(s"__m.$c").as(c))): _*)
  }

  /** Banded range join: pairs every `intervals` row with every `points` row
    * sharing `keys` whose `pt` lies in `[lo, hi]` (inclusive). Each
    * interval is exploded onto the `bucketWidth`-sized time buckets it
    * covers; each point lands on exactly one bucket, so the pair appears
    * exactly once and the join is a plain equi-join on (keys..., bucket)
    * with the range predicate as a residual filter — a shuffled hash join
    * Catalyst can run partitioned, never a nested-loop product.
    *
    * `bucketWidth` trades replication for selectivity: an interval spans
    * `span/width + 1` buckets (keep ≲ a few), while a too-wide bucket
    * degrades the equi-key's selectivity toward the cross product. Size it
    * near the typical interval span. */
  def rangeJoin(
      intervals: DataFrame, lo: String, hi: String,
      points: DataFrame, pt: String,
      keys: Seq[(String, String)], // (intervalCol, pointCol) equi-key pairs
      bucketWidth: Column): DataFrame = {
    // a width that casts to 0 (e.g. a sub-microsecond fraction truncated by
    // the long cast) would NULL every bucket through the division and the
    // equi-join would return an empty result with no error — fail loudly
    // instead (folded away entirely for valid literal widths)
    val raw = bucketWidth.cast("long")
    val w = when(raw > 0, raw).otherwise(raise_error(concat(
      lit("rangeJoin bucketWidth must be a positive microsecond count, got "),
      raw.cast("string"))))
    val iPrep = intervals.withColumn("__b",
      explode(sequence(floor(unix_micros(col(lo)) / w),
        floor(unix_micros(col(hi)) / w))))
    val pPrep = points.withColumn("__b",
      floor(unix_micros(col(pt)) / w))
    val cond = (keys.map { case (ik, pk) => iPrep(ik) === pPrep(pk) } :+
      (iPrep("__b") === pPrep("__b")) :+
      pPrep(pt).between(iPrep(lo), iPrep(hi))).reduce(_ && _)
    iPrep.join(pPrep, cond).drop("__b")
  }
}
