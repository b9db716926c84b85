package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-dimensional data skipping for a
  * columnar lake. A linear sort gives tight min/max file statistics in ONE
  * dimension and useless ones in every other; interleaving the key bits
  * puts rows close in z-value when they are close in EVERY dimension, so a
  * range predicate on ANY of the interleaved columns prunes most files
  * (parquet row-group stats, partition min/max) instead of only predicates
  * on the leading sort key.
  *
  * Everything here is exact integer bit arithmetic on built-in codegen
  * expressions (shifts/and/sum — no HOFs, no UDF), so the z-value is
  * engine-reproducible and oracle-checkable, and the layout write is one
  * range shuffle + in-partition sort: the same cost as a linear
  * sort-by-key, with strictly better multi-column skipping.
  */
object ZOrderOps {

  /** Morton z-value of two non-negative integer columns: interleave the
    * low `bits` bits (x even positions, y odd). `bits ≤ 31` keeps the
    * result within a positive BIGINT in any engine (top bit 2·bits−1 ≤ 61).
    * Values wider than `bits` bits wrap (only the low bits interleave) —
    * callers size `bits` to the key domain.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits)
      .map { i =>
        shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }
      .reduce(_ + _)
  }

  /** LAYOUT TIME — cluster `df` on the z-curve of (`xCol`, `yCol`): one
    * range shuffle on the z-value, then an in-partition sort, so every
    * output partition (→ parquet file / row group) covers a compact
    * z-range ≈ a small rectangle in (x, y) space. Write the result with
    * any sink; min/max stats then prune on BOTH columns
    * (locality audited in ZOrderSpec against a linear x-sort).
    */
  def zorderLayout(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      partitions: Int
  ): DataFrame = {
    require(partitions > 0, "partitions must be positive")
    df.withColumn("zval", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(partitions, col("zval"))
      .sortWithinPartitions("zval")
  }
}
