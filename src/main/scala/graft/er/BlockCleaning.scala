package graft.er

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Block-collection cleaning: purging (drop oversized blocks by a global
 * comparison-level scan) and filtering (per profile keep the smallest
 * blocks). Both are pure DataFrame transformations; the only "driver-side"
 * value in the reference (the purging threshold) stays distributed here as a
 * 1-row DataFrame cross-joined back in, so the plan is fully lazy.
 */
object BlockCleaning {

  /**
   * Comparison-level threshold for block purging. Mirrors
   * python/sparker/filters.py:26-55 exactly:
   *  - group blocks by comparison level, per level sum comparisons (cc) and
   *    block sizes (bc);
   *  - sort levels ascending, prefix-sum;
   *  - scan from the largest level down; at the first level i where
   *    bc_cum(i) * cc_cum(i+1) < smooth * cc_cum(i) * bc_cum(i+1)
   *    return level(i+1) (the level scanned just before);
   *  - if the scan completes, return the second-smallest level (or 0 when
   *    there is a single level) — the loop's residual `previous_size`.
   *
   * Returns a 1-row DataFrame (max_comparisons: double).
   */
  def purgingThreshold(stats: DataFrame, smoothFactor: Double): DataFrame = {
    val levels = stats.groupBy(col("comparisons").cast("double").as("lvl"))
      .agg(sum(col("comparisons")).cast("double").as("cc_l"),
           sum(col("size")).cast("double").as("bc_l"))
    // The global window below runs over DISTINCT comparison levels — one
    // row per distinct block size, already aggregated: bounded by the
    // largest block's cardinality (~1e5 even at 100 TB), not by the number
    // of blocks or rows, so a single-partition scan is safe here. (The
    // O(edges)-input windows elsewhere use util.Prefix / orderBy().limit.)
    val wAsc = Window.orderBy("lvl")
    val cum = levels
      .withColumn("cc", sum(col("cc_l")).over(wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bc", sum(col("bc_l")).over(wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(wAsc))
      .withColumn("lvl_next", lead(col("lvl"), 1).over(wAsc))
      .withColumn("cc_next", lead(col("cc"), 1).over(wAsc))
      .withColumn("bc_next", lead(col("bc"), 1).over(wAsc))
    // scanning top-down and returning at the first hit == the largest level
    // index where the condition holds; levels increase with rn, so that is
    // max(lvl_next) over the qualifying rows.
    cum.agg(
      max(when(col("bc") * col("cc_next") < lit(smoothFactor) * col("cc") * col("bc_next"),
        col("lvl_next"))).as("hit"),
      max(when(col("rn") === 2, col("lvl"))).as("second_lvl"))
      .select(coalesce(col("hit"), col("second_lvl"), lit(0.0)).as("max_comparisons"))
  }

  /** Block purging: keep blocks whose comparison count does not exceed the
   * threshold (python/sparker/filters.py:5-57). */
  def purge(stats: DataFrame, smoothFactor: Double): DataFrame = {
    val thr = purgingThreshold(stats, smoothFactor)
    stats.crossJoin(thr)
      .filter(col("comparisons").cast("double") <= col("max_comparisons"))
      .drop("max_comparisons")
  }

  /**
   * Block filtering: per profile, keep its blocks with the fewest
   * comparisons. `profileBlocks` is the inverted layout
   * (profile_id, key, comparisons); the cutoff is the comparison count of the
   * block at 1-based position max(round_half_even(n*r), 1) in ascending
   * order, and ties at the cutoff are kept — exactly
   * python/sparker/filters.py:60-91 (including Python's banker's rounding
   * on `round(len*r)`, which `bround` matches).
   */
  def filterProfileBlocks(profileBlocks: DataFrame, r: Double): DataFrame = {
    val byProfile = Window.partitionBy("profile_id")
    val ordered = byProfile.orderBy(col("comparisons").asc, col("key").asc)
    profileBlocks
      .withColumn("_rn", row_number().over(ordered))
      .withColumn("_n", count(lit(1)).over(byProfile))
      .withColumn("_k",
        least(greatest(bround(col("_n") * lit(r)).cast("long"), lit(1L)), col("_n")))
      .withColumn("_cutoff",
        max(when(col("_rn") === col("_k"), col("comparisons"))).over(byProfile))
      .filter(col("comparisons") <= col("_cutoff"))
      .drop("_rn", "_n", "_k", "_cutoff")
  }
}
