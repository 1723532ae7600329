package graft.er

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Standalone per-block statistics estimators
 * (scala ref Utilities/StatisticsEstimator.scala:296-342).
 */
object Statistics {

  /**
   * Per-block key-entropy estimate: for each block, take the multiset of
   * block keys across its members' (filtered) block lists; with s = the
   * multiplicity of a key and n = the multiset size,
   *
   *   entropy(block) = -( sum over keys of (s/n) * ln(s/n) ) / n
   *
   * — the reference divides the Shannon sum by n a second time
   * (StatisticsEstimator.scala:336-340), a faithful quirk kept here.
   * `normalized = true` additionally divides by the block size
   * (estimateNormalizedEntropy, :296-316); `stats` is only needed then.
   *
   * The reference broadcasts the whole profile->blocks map to do this; here
   * it is a join + two hash aggregates, distributed at any scale.
   *
   * members: (key, profile_id); profileBlocks: (profile_id, key) — the
   * filtered profile-block index. Returns (key, entropy).
   */
  def estimateBlockEntropy(members: DataFrame, profileBlocks: DataFrame,
                           normalized: Boolean = false,
                           stats: Option[DataFrame] = None): DataFrame = {
    val exact = graft.util.Det.exactSums(members.sparkSession)
    val occ = members.select(col("key"), col("profile_id"))
      .join(profileBlocks.select(col("profile_id"), col("key").as("other_key")),
        Seq("profile_id"))
    val counts = occ.groupBy("key", "other_key")
      .agg(count(lit(1)).cast("double").as("s"))
    val totals = counts.groupBy("key").agg(sum(col("s")).as("n"))
    val ent = counts.join(totals, Seq("key"))
      .groupBy(col("key"), col("n"))
      .agg(graft.util.Det.sumD(exact, "(s / n) * ln(s / n)").as("ent_sum"))
      .select(col("key"), ((-col("ent_sum")) / col("n")).as("entropy"))
    if (!normalized) ent
    else ent.join(
        stats.getOrElse(sys.error("normalized entropy needs block stats"))
          .select(col("key"), col("size")), Seq("key"))
      .select(col("key"), (col("entropy") / col("size").cast("double")).as("entropy"))
  }
}
