package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout — multi-dimensional clustering for range
  * queries, the layout decision warehouses make when ONE sort column is not
  * enough: sorting a 100 TB fact by `a` makes `a`-range scans cheap and
  * `b`-range scans full-table; interleaving the bits of both into one sort
  * key gives every dimension locality, so parquet row-group min/max stats
  * stay narrow on BOTH columns and a two-sided range predicate skips most
  * row groups (the same mechanism behind Delta/Iceberg Z-ORDER OPTIMIZE).
  *
  * The z-value is a pure bitwise spread/interleave over built-in
  * expressions (shift/and/or — codegen'd, ANSI-safe on longs, and
  * engine-portable: DuckDB evaluates the identical arithmetic, so the
  * mapping itself sits under the SQL oracle).
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (Morton spread):
    * bit i moves to bit 2i. Classic mask ladder, all long arithmetic. */
  private def spread16(x: Column): Column = {
    val m0 = lit(0xFFFFL)
    val m1 = lit(0x00FF00FFL)
    val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L)
    val m4 = lit(0x55555555L)
    val s0 = x.cast("long").bitwiseAND(m0)
    val s1 = s0.bitwiseOR(shiftleft(s0, 8)).bitwiseAND(m1)
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(m2)
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(m3)
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(m4)
  }

  /** 32-bit z-value interleaving the low 16 bits of two non-negative
    * columns: z = spread(a) | spread(b) << 1. Equal-range dimensions
    * should be pre-quantized to [0, 65536) by the caller. */
  def zValue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Rewrite `df` z-ordered on (a, b): range-partition by z-value (so
    * files tile the z-curve, not hash-scatter it), sort within partitions,
    * drop the helper column, write parquet. `nFiles` is the file-count
    * knob — at scale, size it so row groups hold enough rows for stats
    * skipping to pay. */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
                    nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1 (got $nFiles)")
    df.withColumn("__z", zValue2(a, b))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert curve index for two `order`-bit coordinates — the
    * LOCALITY-superior space-filling curve: unlike Morton order, every
    * consecutive pair of Hilbert indexes is GRID-ADJACENT (|Δa|+|Δb| = 1,
    * no diagonal jumps across the plane at power-of-2 seams), so a file
    * holding a contiguous index range covers a more compact rectangle and
    * its per-dimension min/max stats are tighter — the reason Iceberg
    * grew a Hilbert option next to Z-ORDER. Backed by the codegen'd
    * [[graft.functions.expressions.HilbertIndex]] kernel: the rotate
    * recurrence is a 10-line integer loop, and an unrolled Column form
    * measured a 200 MiB serialized plan at order 8 (each level references
    * both prior coordinates — ~3^order tree nodes; the scaladoc there
    * tells the story). The identical ladder replays in SQL CTE stages
    * ([[hilbertOracleCtes]]), so the mapping sits under the DuckDB
    * oracle, like [[zValue2]]. */
  def hilbert2(aIn: Column, bIn: Column, order: Int = 8): Column =
    graft.functions.expressions.HilbertIndex.hilbertNative(aIn, bIn, order)

  /** [[writeZOrdered]]'s Hilbert sibling: range-partition + sort by the
    * Hilbert index so files tile the curve. Same knobs, tighter
    * per-dimension zones (adjacency — no seam jumps splitting a file's
    * rectangle across the plane). */
  def writeHilbertOrdered(df: DataFrame, path: String, a: Column, b: Column,
                          nFiles: Int, order: Int = 8): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1 (got $nFiles)")
    df.withColumn("__h", hilbert2(a, b, order))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** The SQL replay of [[hilbert2]] as chained CTEs over input columns
    * `(aExpr, bExpr)` — one stage per level, linear (named columns, no
    * tree blowup). Produces a query fragment ending in a relation with
    * columns (…carry, d). Used by the catalog oracle so the Hilbert
    * mapping itself sits under the DuckDB gate. */
  def hilbertOracleCtes(aExpr: String, bExpr: String, order: Int,
                        fromClause: String,
                        carryCols: String = ""): String = {
    val carry = if (carryCols.isEmpty) "" else s"$carryCols, "
    val mask = (1L << order) - 1
    val init = s"""h0 AS (
      |  SELECT $carry($aExpr) & $mask AS x, ($bExpr) & $mask AS y,
      |    CAST(0 AS BIGINT) AS d
      |  $fromClause)""".stripMargin
    val stages = (0 until order).map { i =>
      val s = 1L << (order - 1 - i)
      val p = s"h$i"
      s"""h${i + 1} AS (
        |  SELECT $carry
        |    CASE WHEN (y & $s) = 0
        |         THEN CASE WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END
        |         ELSE x END AS x,
        |    CASE WHEN (y & $s) = 0
        |         THEN CASE WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END
        |         ELSE y END AS y,
        |    d + $s * $s *
        |      xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
        |          CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d
        |  FROM $p)""".stripMargin
    }
    (init +: stages).mkString(",\n")
  }
}
