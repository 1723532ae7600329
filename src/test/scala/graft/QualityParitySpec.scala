package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Wrappers
import graft.er._

/**
 * End-to-end quality parity against the reference on the reference's OWN
 * dataset (BASELINE.md "quality parity" gate): the canonical dirty
 * pipeline of `python/examples/Dirty datasets.ipynb` — CSV load, token
 * blocking, purging smooth=1.025, filtering r=0.8, CBS meta-blocking — on
 * `python/datasets/dirty/cora`.
 *
 * Expected values were produced by executing the reference's Python
 * implementation itself (python/sparker, pyspark local[8]) with exactly
 * the notebook's parameters; every count below (block counts, candidate
 * pairs, retained edges, ground-truth matches) must match EXACTLY — not
 * approximately — because CBS weights are integers and the AVG/global
 * thresholds are ratios of exact integer sums, so there is no
 * floating-point latitude in the pruning decisions.
 *
 *   blocks 891 / purged 870 / after-filtering 865
 *   candidate pairs 198587, matches 17127 of |GT| 17184
 *   WNP CBS OR: edges 58687, matches 16883
 *   WNP CBS AND: edges 41262, matches 16815
 *   WEP CBS: edges 37575, matches 16814
 */
class QualityParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private val coraDir = "/root/reference/python/datasets/dirty/cora"

  private def available = new java.io.File(s"$coraDir/cora.csv").canRead

  test("cora dirty pipeline: exact PC/PQ parity with the reference") {
    assume(available, "reference datasets not present")
    val profiles = Wrappers.loadProfilesCsv(spark, s"$coraDir/cora.csv", realIdField = "id")
      .persist()
    val attrs = Wrappers.toLongLayout(profiles)
    val keys = Blocking.tokenKeys(attrs)
    val cb = Pipeline.cleanBlocks(keys, clean = false,
      smoothFactor = 1.025, filterFactor = 0.8)

    assert(cb.stats0.count() == 891L)   // valid blocks
    assert(cb.stats1.count() == 870L)   // after purging
    assert(cb.stats2.count() == 865L)   // regenerated after filtering

    val gt = Wrappers.loadGroundTruthCsv(spark, s"$coraDir/groundtruth.csv")
    val prof = profiles.select("original_id", "profile_id")
    val gtc = Evaluation.convertGroundTruth(gt, prof, prof).persist()
    assert(gtc.count() == 17184L)

    val pairs = graft.util.Snapshot(cb.pairs())
    assert(pairs.count() == 198587L)    // candidate comparisons after cleaning
    assert(pairs.join(gtc, Seq("p1", "p2"), "left_semi").count() == 17127L)

    val profStats = graft.util.Snapshot(cb.profileStats)
    val weighted = graft.util.Snapshot(
      MetaBlocking.weightedPairs(pairs, profStats, cb.numberOfBlocks, WeightType.CBS))
    // dirty ER: thresholds/sums include the reference's self edges
    val selfW = Some(graft.util.Snapshot(
      MetaBlocking.selfWeights(profStats, cb.numberOfBlocks, WeightType.CBS)))

    val wnpOr = graft.util.Snapshot(MetaBlocking.wnp(
      weighted, ThresholdType.AVG, ComparisonType.OR, WeightType.CBS, selfW = selfW))
    assert(wnpOr.count() == 58687L)
    assert(wnpOr.join(gtc, Seq("p1", "p2"), "left_semi").count() == 16883L)

    val wnpAnd = graft.util.Snapshot(MetaBlocking.wnp(
      weighted, ThresholdType.AVG, ComparisonType.AND, WeightType.CBS, selfW = selfW))
    assert(wnpAnd.count() == 41262L)
    assert(wnpAnd.join(gtc, Seq("p1", "p2"), "left_semi").count() == 16815L)

    val wep = graft.util.Snapshot(MetaBlocking.wep(weighted, selfW = selfW))
    assert(wep.count() == 37575L)
    assert(wep.join(gtc, Seq("p1", "p2"), "left_semi").count() == 16814L)
  }
}
