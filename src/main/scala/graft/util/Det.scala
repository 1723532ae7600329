package graft.util

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic-aggregation gate. Double sums under partial (hash)
 * aggregation depend on partition/arrival order; the DuckDB oracle compare
 * hashes values bit-for-bit, so verification runs fold the addends
 * sequentially over a sorted list — an O(group) collect_list per group
 * that costs real memory/CPU on hot aggregates (measured 225s -> 80s for
 * one such aggregate at sf0.1).
 *
 * Production/bench runs don't need bit-stable doubles: `Verify` sets
 * `spark.graft.exactSums=true`; everything else gets the plain codegen'd
 * `sum`, whose result differs only in final-ulp addition order.
 */
object Det {

  def exactSums(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.exactSums").contains("true")

  /** Double sum of SQL expression `e` per group: sorted sequential fold in
   * exact mode, plain sum otherwise. */
  def sumD(exact: Boolean, e: String): Column =
    if (exact)
      expr(s"aggregate(array_sort(collect_list($e)), cast(0.0 as double), (acc, x) -> acc + x)")
    else
      expr(s"sum($e)")
}
