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
}
