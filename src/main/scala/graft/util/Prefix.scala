package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed running (prefix) sum over a total order — the scalable
 * replacement for `sum(...).over(Window.orderBy(...))`, which Spark plans
 * as a SINGLE-partition window (every row through one task: the classic
 * 100x-scale killer).
 *
 * Classic two-phase scan:
 *  1. range-repartition the rows on the order keys, so partition i holds a
 *     contiguous slice of the total order;
 *  2. per-partition totals (tiny: one row per partition) get a driver-size
 *     prefix-sum via a window over #partitions rows;
 *  3. broadcast the per-partition offsets back and finish with a window
 *     PARTITIONED by the physical partition — each task scans only its own
 *     slice.
 *
 * The result is identical to the single-partition window for any total
 * order (ties across partition boundaries would be ambiguous, so the order
 * must be unique — all call sites order by a distinct key).
 */
object Prefix {

  /** Adds `out` = running sum of `value` (inclusive of the current row)
   * over rows totally ordered by `order`. */
  def runningSum(df: DataFrame, order: Seq[Column], value: Column, out: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(n, order: _*)
      .withColumn("_pid", spark_partition_id())
    val partSums = ranged.groupBy("_pid").agg(sum(value).as("_psum"))
    // one row per partition: the window is over <= n rows, safe anywhere
    val offsets = partSums.withColumn("_offset",
        coalesce(sum(col("_psum")).over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .select(col("_pid"), col("_offset"))
    ranged.join(broadcast(offsets), Seq("_pid"))
      .withColumn(out,
        col("_offset") + sum(value).over(
          Window.partitionBy("_pid").orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_pid", "_offset")
  }
}
