package graft.er

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pivots between the block-major and profile-major layouts
 * (python/sparker/converters.py:59-112, scala/.../Utilities/Converters.scala).
 *
 * In this engine both layouts are long-form DataFrames over the blocking
 * key, so the pivots are projections/aggregations rather than data
 * reshapes — Catalyst eliminates them entirely when composed with
 * downstream groupBys. The nested forms (arrays per block / per profile)
 * exist for API parity with the reference objects.
 */
object Converters {

  /** Block-major nested view: one row per block with its member ids
   * (BlockDirty/BlockClean analog). */
  def blocksNested(members: DataFrame, stats: DataFrame): DataFrame =
    members.groupBy("key")
      .agg(sort_array(collect_list(col("profile_id"))).as("profiles"))
      .join(stats, Seq("key"))
      .select("key", "profiles", "size", "comparisons")

  /** Profile-major nested view (ProfileBlocks analog): one row per profile
   * with its blocks and their comparison counts. */
  def profileBlocksNested(members: DataFrame, stats: DataFrame): DataFrame =
    members.join(stats.select("key", "comparisons"), Seq("key"))
      .groupBy("profile_id")
      .agg(sort_array(collect_list(struct(col("key"), col("comparisons"))))
        .as("blocks"))

  /** blocks -> profile-blocks long form (blocks_to_profile_blocks,
   * converters.py:59-84): the inverted index rows. */
  def blocksToProfileBlocks(members: DataFrame, stats: DataFrame): DataFrame =
    members.join(stats.select("key", "comparisons"), Seq("key"))
      .select("profile_id", "source_id", "key", "comparisons")

  /** profile-blocks -> blocks long form (profiles_block_to_blocks,
   * converters.py:86-112): re-validate (>= 2 profiles, cross-source when
   * clean) and drop zero-comparison blocks. */
  def profileBlocksToBlocks(profileBlocks: DataFrame, clean: Boolean): DataFrame =
    Blocking.validBlocks(
      profileBlocks.select("key", "profile_id", "source_id"), clean)
}
