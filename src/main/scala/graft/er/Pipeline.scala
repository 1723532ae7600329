package graft.er

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * End-to-end blocking + cleaning pipeline state. All members are lazy
 * DataFrames; persist() the ones reused across several downstream queries.
 *
 *  - members0/stats0: the raw valid block collection from the keys
 *  - stats1/members1: after block purging
 *  - profileBlocksF:  after per-profile block filtering (profile_id, key,
 *                     comparisons) — the reference's profile_blocks_filtered
 *  - members2/stats2: blocks regenerated from the filtered profile index,
 *                     re-validated (>=2 profiles, cross-source for clean) —
 *                     the reference's block index for meta-blocking
 */
final case class CleanedBlocks(
    clean: Boolean,
    members0: DataFrame,
    stats0: DataFrame,
    stats1: DataFrame,
    members1: DataFrame,
    profileBlocksF: DataFrame,
    members2: DataFrame,
    stats2: DataFrame) {

  /** 1-row DataFrame with the valid-block count (|B| in ECBS/chi2). */
  def numberOfBlocks: DataFrame =
    stats2.agg(count(lit(1)).as("number_of_blocks"))

  /** Per-profile stats for the weight schemes. */
  def profileStats: DataFrame = MetaBlocking.profileStats(profileBlocksF, stats2)

  /** Undirected CBS comparison graph. */
  def pairs(blockEntropies: Option[DataFrame] = None): DataFrame =
    MetaBlocking.cbsPairs(members2, clean, blockEntropies)

  /** Weighted comparison graph for a scheme. */
  def weighted(wt: WeightType.Value, useEntropy: Boolean = false,
               blockEntropies: Option[DataFrame] = None): DataFrame =
    MetaBlocking.weightedPairs(pairs(blockEntropies), profileStats, numberOfBlocks, wt, useEntropy)
}

object Pipeline {
  /**
   * Canonical pipeline spine (README.md:42-47 of the reference): blocking
   * keys -> valid blocks -> purging -> filtering -> re-validated blocks.
   *
   * keys: (profile_id, source_id, key) distinct — from Blocking.tokenKeys /
   * ngramKeys / AttributeClustering-qualified keys.
   *
   * `stage` is applied at every stage boundary. The default (identity)
   * keeps the pipeline fully lazy — fine for a one-shot query Catalyst can
   * plan end to end. Long-lived pipeline state should pass
   * `graft.util.Snapshot.apply`: each stage then CHAINS from the previous
   * stage's materialization instead of re-deriving the whole prefix —
   * snapshotting only the five outputs of a lazy spine executes the
   * blocking stage ~5 times (once per independent lineage).
   */
  def cleanBlocks(keys: DataFrame, clean: Boolean, smoothFactor: Double = 1.005,
                  filterFactor: Double = 0.8, numSources: Int = 2,
                  stage: DataFrame => DataFrame = identity): CleanedBlocks = {
    val members0 = stage(Blocking.validBlocks(keys, clean))
    val stats0 = stage(Blocking.blockStats(members0, clean, numSources))
    val stats1 = stage(BlockCleaning.purge(stats0, smoothFactor))
    val members1 = members0.join(stats1.select("key"), Seq("key"), "left_semi")
    val profileBlocks = members1
      .join(stats1.select("key", "comparisons"), Seq("key"))
      .select("profile_id", "source_id", "key", "comparisons")
    val profileBlocksF = stage(BlockCleaning.filterProfileBlocks(profileBlocks, filterFactor))
    val members2 = stage(Blocking.validBlocks(
      profileBlocksF.select("key", "profile_id", "source_id"), clean))
    val stats2 = stage(Blocking.blockStats(members2, clean, numSources))
    CleanedBlocks(clean, members0, stats0, stats1, members1, profileBlocksF, members2, stats2)
  }
}

/**
 * PC / PQ / F1 evaluation against a ground truth — the reference's
 * correctness currency (python/sparker/utils.py:19-83,
 * supervised_metablocking.py:182-203).
 */
object Evaluation {
  /** candidates: (p1, p2) with p1 < p2; gt: (p1, p2) with p1 < p2.
   * Returns 1 row (num_candidates, num_matches, num_gt, pc, pq, f1).
   *
   * CONTRACT: `gt` must be materialized (a parquet/file-backed scan, as
   * every current caller passes) — its distinct is evaluated TWICE below
   * (join build side + the num_gt aggregate), which is only cheap when
   * each evaluation is a re-scan, not a re-computation of a lazy plan. */
  def pcPq(candidates: DataFrame, gt: DataFrame): DataFrame = {
    // ONE pass over the candidate stream: a left join against the distinct
    // ground truth marks matches, and a single aggregate counts candidates
    // and matches together. GT is small by nature, so the left join
    // broadcasts and the candidate stream is never sorted or re-shuffled
    // (a full-outer one-pass variant was measured 3x SLOWER here: outer
    // joins can't broadcast, forcing a sort-merge over the candidate
    // side). The distinct GT is deliberately NOT snapshotted per
    // evaluation — its two readers (join build side + the num_gt
    // aggregate) re-run a cheap aggregate over the (already materialized)
    // GT input instead of paying a parquet write per PC/PQ run.
    val gtd = gt.select("p1", "p2").distinct()
    val marked = candidates.select("p1", "p2").distinct()
      .join(gtd.withColumn("_m", lit(1)), Seq("p1", "p2"), "left")
    val nCnt = marked.agg(count(lit(1)).as("num_candidates"),
      count(col("_m")).as("num_matches"))
    val ng = gtd.agg(count(lit(1)).as("num_gt"))
    nCnt.crossJoin(ng)
      .withColumn("pc", col("num_matches").cast("double") / col("num_gt"))
      .withColumn("pq", when(col("num_candidates") > 0,
        col("num_matches").cast("double") / col("num_candidates")).otherwise(lit(0.0)))
      .withColumn("f1", when(col("pc") + col("pq") > 0.0,
        lit(2.0) * col("pc") * col("pq") / (col("pc") + col("pq"))).otherwise(lit(0.0)))
  }

  /**
   * PC/PQ over ORIGINAL ids (scala ref StatisticsEstimator.estimatePCPQ,
   * Utilities/StatisticsEstimator.scala:26-48, join-based form): maps the
   * engine-id candidates back through the profiles and intersects the raw
   * (unconverted) ground truth, normalizing both sides to unordered
   * original-id pairs. Stays distributed — the reference's 5 broadcast-map
   * variants are the same semantics with a collected id map.
   */
  def pcPqOriginalIds(candidates: DataFrame, profiles: DataFrame, gt: DataFrame): DataFrame = {
    val m = profiles.select(col("profile_id"), col("original_id"))
    val cand = candidates.select("p1", "p2").distinct()
      .join(m.select(col("profile_id").as("p1"), col("original_id").as("o1")), Seq("p1"))
      .join(m.select(col("profile_id").as("p2"), col("original_id").as("o2")), Seq("p2"))
      .select(least(col("o1"), col("o2")).as("p1"),
        greatest(col("o1"), col("o2")).as("p2"))
    val gtN = gt.select(least(col("id1"), col("id2")).as("p1"),
      greatest(col("id1"), col("id2")).as("p2"))
    pcPq(cand, gtN)
  }

  /**
   * Ground-truth id conversion (python/sparker/converters.py:10-57): maps
   * pairs of original ids to engine profile ids via two joins, emits
   * (least, greatest) and drops pairs with a missing side. Stays distributed
   * (the reference collects to a driver-side set).
   */
  def convertGroundTruth(gt: DataFrame, profiles1: DataFrame, profiles2: DataFrame): DataFrame = {
    val m1 = profiles1.select(col("original_id").as("id1"), col("profile_id").as("_p1"))
    val m2 = profiles2.select(col("original_id").as("id2"), col("profile_id").as("_p2"))
    gt.join(m1, Seq("id1")).join(m2, Seq("id2"))
      .select(least(col("_p1"), col("_p2")).as("p1"),
        greatest(col("_p1"), col("_p2")).as("p2"))
      .distinct()
  }
}
