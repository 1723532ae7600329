package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering — the multi-dimensional data-layout
 * operator behind min/max data skipping on a 100 TB table (the Delta
 * `OPTIMIZE ZORDER BY` / Iceberg sort-order idea): interleaving the bits
 * of two dimension keys gives a single sort key whose contiguous ranges
 * are tight rectangles in (x, y) space, so range-partitioning + sorting
 * by it clusters every file's footer min/max stats on BOTH dimensions at
 * once — a predicate on either column prunes files, not just a predicate
 * on the leading sort column.
 *
 * The bit interleave is the textbook mask-spread sequence (Morton 1966;
 * the "Interleave bits by Binary Magic Numbers" bit-twiddling identity):
 * pure 64-bit integer ops, exactly reproducible in any engine — the
 * DuckDB twin runs the same five mask/shift steps.
 */
object ZOrder {

  /** Spread the low 16 bits of `v` so bit i lands at position 2i:
   * v & 0xFFFF, then (v | v<<8) & 0x00FF00FF, (v | v<<4) & 0x0F0F0F0F,
   * (v | v<<2) & 0x33333333, (v | v<<1) & 0x55555555. */
  private def spread16(v: Column): Column =
    Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L,
        1 -> 0x55555555L)
      .foldLeft(v.bitwiseAND(lit(0xFFFFL))) { case (r, (sh, mask)) =>
        r.bitwiseOR(shiftleft(r, sh)).bitwiseAND(lit(mask))
      }

  /** 32-bit Morton code of two 16-bit dimension keys: x's bits at even
   * positions, y's at odd. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Cluster a DataFrame for writing: global range partitioning on the
   * z-value, rows sorted by it within each partition — each output file
   * covers one tight z-range, i.e. a tight (x, y) rectangle for the
   * footer stats. One exchange (range, sampled bounds), one local sort. */
  def zOrderBy(df: DataFrame, x: Column, y: Column): DataFrame =
    df.withColumn("z", zValue(x, y))
      .repartitionByRange(col("z"))
      .sortWithinPartitions(col("z"))
}
