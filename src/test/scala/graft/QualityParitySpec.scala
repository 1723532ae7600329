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
    import org.apache.spark.sql.functions.{col, lpad}
    // zero-pad the original ids so our deterministic string-ordered dense
    // ids coincide with the reference's numeric file-order ids: the
    // "smaller endpoint" convention matters for the ASYMMETRIC weight
    // schemes (ARCS prunes with the smaller id's denominator)
    val raw = spark.read.option("header", "true").csv(s"$coraDir/cora.csv")
      .withColumn("id", lpad(col("id"), 6, "0"))
    val profiles = Wrappers.fromDataFrame(raw, realIdField = "id").persist()
    val attrs = Wrappers.toLongLayout(profiles)
    val keys = Blocking.tokenKeys(attrs)
    val cb = Pipeline.cleanBlocks(keys, clean = false,
      smoothFactor = 1.025, filterFactor = 0.8)

    assert(cb.stats0.count() == 891L)   // valid blocks
    assert(cb.stats1.count() == 870L)   // after purging
    assert(cb.stats2.count() == 865L)   // regenerated after filtering

    val gt = Wrappers.loadGroundTruthCsv(spark, s"$coraDir/groundtruth.csv")
      .select(lpad(col("id1"), 6, "0").as("id1"), lpad(col("id2"), 6, "0").as("id2"))
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

    // CNP: reference-computed k (floor(sum sizes / N - 1)); the retention
    // pass ranks the self edge too (first_step=True). Exact parity is
    // unattainable by construction: the reference picks top-k TIES via
    // np.argpartition over neighbors in Python-set iteration order
    // (cnp.py:169-170) — arbitrary — while we break ties by neighbor id.
    // The non-tied selections are identical, so counts agree within the
    // tie margin (<1%). Reference: OR 10007/8016, AND 4248/3986.
    def near(x: Long, ref: Long, tolPct: Double = 1.0): Boolean =
      math.abs(x - ref) <= math.max(1, (ref * tolPct / 100).toLong)
    val cnpOr = graft.util.Snapshot(MetaBlocking.cnp(
      weighted, cb.stats2, 1295L, ComparisonType.OR, selfW = selfW))
    assert(near(cnpOr.count(), 10007L))
    assert(near(cnpOr.join(gtc, Seq("p1", "p2"), "left_semi").count(), 8016L))
    // AND (reciprocal) intersects both endpoints' tie choices, doubling
    // the tie sensitivity -> wider margin than OR
    val cnpAnd = graft.util.Snapshot(MetaBlocking.cnp(
      weighted, cb.stats2, 1295L, ComparisonType.AND, selfW = selfW))
    val cnpAndN = cnpAnd.count()
    assert(near(cnpAndN, 4248L, tolPct = 3.0), s"cnp AND count $cnpAndN vs 4248")
    val cnpAndM = cnpAnd.join(gtc, Seq("p1", "p2"), "left_semi").count()
    assert(near(cnpAndM, 3986L, tolPct = 3.0), s"cnp AND matches $cnpAndM vs 3986")

    // CEP: K = floor(sum sizes / 2); the retained-edge COUNT is exact, but
    // threshold-level ties are filled in partition order by the reference
    // vs deterministic (p1, p2) order here (documented divergence in
    // MetaBlocking.cep), so the match count may differ by the tie choice.
    // Reference: 8521 edges / 7940 matches.
    // fractional weight schemes, same pipeline: JS / ECBS / ARCS /
    // chi-square (the chi2 rule replaces OR/AND for the chi-square
    // scheme). JS/ECBS/chi2 are exact. ARCS carries a tiny ulp margin:
    // the reference's denominator is applied as SEQUENTIAL divisions in
    // Python-set block order ((cbs/c1)/c2/...), ours divides once by a
    // sorted product — last-ulp rounding flips a handful of edges sitting
    // exactly on a threshold (9 of 99597 observed). Reference values:
    // JS 51369/16897, ECBS 58423/16878, ARCS 99597/16881,
    // CHI2 34362/16684.
    for ((wt, refEdges, refMatches, ulpTol) <- Seq(
        (WeightType.JS, 51369L, 16897L, 0L),
        (WeightType.ECBS, 58423L, 16878L, 0L),
        (WeightType.ARCS, 99597L, 16881L, 60L),
        (WeightType.ChiSquare, 34362L, 16684L, 0L))) {
      val w = graft.util.Snapshot(
        MetaBlocking.weightedPairs(pairs, profStats, cb.numberOfBlocks, wt))
      val sw = Some(graft.util.Snapshot(
        MetaBlocking.selfWeights(profStats, cb.numberOfBlocks, wt)))
      val kept = graft.util.Snapshot(MetaBlocking.wnp(
        w, ThresholdType.AVG, ComparisonType.OR, wt, selfW = sw))
      val n = kept.count()
      assert(math.abs(n - refEdges) <= ulpTol, s"WNP $wt edges $n vs $refEdges")
      val m = kept.join(gtc, Seq("p1", "p2"), "left_semi").count()
      assert(math.abs(m - refMatches) <= ulpTol, s"WNP $wt matches $m vs $refMatches")
    }

    val cep = graft.util.Snapshot(MetaBlocking.cep(weighted, cb.stats2))
    assert(cep.count() == 8521L)
    // integer CBS weights put a large tie pool AT the K-th level; which
    // ties fill the remaining quota is partition-order-dependent in the
    // reference, so the match count varies within the tie pool (~2.5%
    // here: 7745 deterministic vs 7940 in the captured reference run)
    val cepMatches = cep.join(gtc, Seq("p1", "p2"), "left_semi").count()
    assert(math.abs(cepMatches - 7940L) <= 240L,
      s"CEP matches $cepMatches too far from the reference's 7940")
  }

  test("census dirty pipeline: exact parity on blocks, candidates, WNP x5, WEP") {
    // Second dirty-CSV dataset (r8 VERDICT stretch #7): locks the dirty
    // loader + pipeline against reference counts the way cora does, on a
    // corpus with a very different shape (841 short census records, 344
    // GT pairs). Expected values produced by executing the reference's
    // python/sparker with the Dirty-datasets.ipynb parameters
    // (token blocking, purging 1.025, filtering 0.8):
    //   blocks 549 / purged 519 / filtered 512; candidates 2551 / 243
    //   WNP CBS OR 958/53, AND 758/45; WEP CBS 859/39
    //   WNP OR: JS 791/45, ECBS 817/43, CHI2 1012/57, ARCS 1484/102
    val dir = "/root/reference/python/datasets/dirty/census"
    assume(new java.io.File(s"$dir/census.csv").canRead, "reference datasets not present")
    import org.apache.spark.sql.functions.{col, lpad}
    val raw = spark.read.option("header", "true").csv(s"$dir/census.csv")
      .withColumn("id", lpad(col("id"), 6, "0"))
    val profiles = Wrappers.fromDataFrame(raw, realIdField = "id").persist()
    val attrs = Wrappers.toLongLayout(profiles)
    val keys = Blocking.tokenKeys(attrs)
    val cb = Pipeline.cleanBlocks(keys, clean = false,
      smoothFactor = 1.025, filterFactor = 0.8)
    assert(cb.stats0.count() == 549L)
    assert(cb.stats1.count() == 519L)
    assert(cb.stats2.count() == 512L)

    val gt = Wrappers.loadGroundTruthCsv(spark, s"$dir/census_groundtruth.csv")
      .select(lpad(col("id1"), 6, "0").as("id1"), lpad(col("id2"), 6, "0").as("id2"))
    val prof = profiles.select("original_id", "profile_id")
    val gtc = Evaluation.convertGroundTruth(gt, prof, prof).persist()
    assert(gtc.count() == 344L)

    val pairs = graft.util.Snapshot(cb.pairs())
    assert(pairs.count() == 2551L)
    assert(pairs.join(gtc, Seq("p1", "p2"), "left_semi").count() == 243L)

    val profStats = graft.util.Snapshot(cb.profileStats)
    val weighted = graft.util.Snapshot(
      MetaBlocking.weightedPairs(pairs, profStats, cb.numberOfBlocks, WeightType.CBS))
    val selfW = Some(graft.util.Snapshot(
      MetaBlocking.selfWeights(profStats, cb.numberOfBlocks, WeightType.CBS)))

    val wnpOr = graft.util.Snapshot(MetaBlocking.wnp(
      weighted, ThresholdType.AVG, ComparisonType.OR, WeightType.CBS, selfW = selfW))
    assert(wnpOr.count() == 958L)
    assert(wnpOr.join(gtc, Seq("p1", "p2"), "left_semi").count() == 53L)

    val wnpAnd = graft.util.Snapshot(MetaBlocking.wnp(
      weighted, ThresholdType.AVG, ComparisonType.AND, WeightType.CBS, selfW = selfW))
    assert(wnpAnd.count() == 758L)
    assert(wnpAnd.join(gtc, Seq("p1", "p2"), "left_semi").count() == 45L)

    val wep = graft.util.Snapshot(MetaBlocking.wep(weighted, selfW = selfW))
    assert(wep.count() == 859L)
    assert(wep.join(gtc, Seq("p1", "p2"), "left_semi").count() == 39L)

    // fractional schemes, same ARCS ulp caveat as the cora test — census's
    // short records put far more edges exactly ON the mean threshold, so
    // the sequential-vs-sorted-product division order flips more of them
    // (observed 12 of 1484; cora saw 9 of 99597); ~1% margin, ARCS only
    for ((wt, refEdges, refMatches, ulpTol) <- Seq(
        (WeightType.JS, 791L, 45L, 0L),
        (WeightType.ECBS, 817L, 43L, 0L),
        (WeightType.ChiSquare, 1012L, 57L, 0L),
        (WeightType.ARCS, 1484L, 102L, 15L))) {
      val w = graft.util.Snapshot(
        MetaBlocking.weightedPairs(pairs, profStats, cb.numberOfBlocks, wt))
      val sw = Some(graft.util.Snapshot(
        MetaBlocking.selfWeights(profStats, cb.numberOfBlocks, wt)))
      val kept = graft.util.Snapshot(MetaBlocking.wnp(
        w, ThresholdType.AVG, ComparisonType.OR, wt, selfW = sw))
      val n = kept.count()
      assert(math.abs(n - refEdges) <= ulpTol, s"WNP $wt edges $n vs $refEdges")
      val m = kept.join(gtc, Seq("p1", "p2"), "left_semi").count()
      assert(math.abs(m - refMatches) <= ulpTol, s"WNP $wt matches $m vs $refMatches")
    }
  }

  test("restaurant dirty pipeline: WNP/WEP parity incl. the self-edge quirk") {
    val dir = "/root/reference/python/datasets/dirty/restaurant"
    assume(new java.io.File(s"$dir/restaurant.csv").canRead, "reference datasets not present")
    import org.apache.spark.sql.functions.{col, lpad}
    // zero-pad ids so string-ordered dense ids match the reference's
    // numeric file-order ids (see the cora test)
    val raw = spark.read.option("header", "true").csv(s"$dir/restaurant.csv")
      .withColumn("id", lpad(col("id"), 4, "0"))
    val profiles = Wrappers.fromDataFrame(raw, realIdField = "id").persist()
    val attrs = Wrappers.toLongLayout(profiles)
    val cb = Pipeline.cleanBlocks(Blocking.tokenKeys(attrs), clean = false,
      smoothFactor = 1.025, filterFactor = 0.8)
    assert(cb.stats0.count() == 1150L)
    assert(cb.stats1.count() == 1104L)
    assert(cb.stats2.count() == 1096L)

    val gt = Wrappers.loadGroundTruthCsv(spark, s"$dir/restaurant_groundtruth.csv")
      .select(lpad(col("id1"), 4, "0").as("id1"), lpad(col("id2"), 4, "0").as("id2"))
    val prof = profiles.select("original_id", "profile_id")
    val gtc = Evaluation.convertGroundTruth(gt, prof, prof).persist()
    assert(gtc.count() == 112L)

    val pairs = graft.util.Snapshot(cb.pairs())
    val profStats = graft.util.Snapshot(cb.profileStats)
    // dirty ER: every threshold pass counts the profile itself as a
    // neighbor (the reference's first_step=True quirk)
    for ((wt, ct, refEdges, refMatches) <- Seq(
        (WeightType.CBS, ComparisonType.OR, 553L, 112L),
        (WeightType.CBS, ComparisonType.AND, 424L, 112L),
        (WeightType.JS, ComparisonType.OR, 566L, 112L),
        (WeightType.JS, ComparisonType.AND, 323L, 109L),
        (WeightType.ECBS, ComparisonType.OR, 520L, 112L),
        (WeightType.ECBS, ComparisonType.AND, 388L, 110L),
        (WeightType.ChiSquare, ComparisonType.OR, 583L, 112L))) {
      val w = graft.util.Snapshot(
        MetaBlocking.weightedPairs(pairs, profStats, cb.numberOfBlocks, wt))
      val sw = Some(graft.util.Snapshot(
        MetaBlocking.selfWeights(profStats, cb.numberOfBlocks, wt)))
      val kept = graft.util.Snapshot(
        MetaBlocking.wnp(w, ThresholdType.AVG, ct, wt, selfW = sw))
      val n = kept.count()
      assert(n == refEdges, s"WNP $wt $ct edges $n vs $refEdges")
      val m = kept.join(gtc, Seq("p1", "p2"), "left_semi").count()
      assert(m == refMatches, s"WNP $wt $ct matches $m vs $refMatches")
    }

    val wCbs = graft.util.Snapshot(
      MetaBlocking.weightedPairs(pairs, profStats, cb.numberOfBlocks, WeightType.CBS))
    val swCbs = Some(graft.util.Snapshot(
      MetaBlocking.selfWeights(profStats, cb.numberOfBlocks, WeightType.CBS)))
    val wep = graft.util.Snapshot(MetaBlocking.wep(wCbs, selfW = swCbs))
    assert(wep.count() == 527L)
    assert(wep.join(gtc, Seq("p1", "p2"), "left_semi").count() == 112L)
  }

  test("10K synthetic dirty-JSON pipeline: loader + WNP/WEP parity") {
    // Locks the DIRTY JSON loader path (census/restaurant cover dirty
    // CSV; DblpAcm/abtBuy cover clean-clean JSON — this was the one
    // loader x pipeline combination without a reference-count lock).
    // Expected values from executing the reference implementation
    // (python/sparker JSONWrapper.load_profiles + load_groundtruth on
    // 10Kprofiles.json / 10KIdDuplicates.json, pyspark local[16]) with
    // the Dirty-datasets.ipynb parameters: token blocking, purging
    // 1.025, filtering 0.8, AVG thresholds:
    //   profiles 10000, gt 8705; blocks 11088 / 11034 / 11033
    //   candidates 170634 / 8504
    //   WNP CBS OR 10545/7590, AND 10122/7262; WEP CBS 10561/7621
    val dir = "/root/reference/python/datasets/dirty/synthetic"
    assume(new java.io.File(s"$dir/10Kprofiles.json").canRead, "reference datasets not present")
    val profiles = Wrappers.loadProfilesJson(spark, s"$dir/10Kprofiles.json",
      realIdField = "realProfileID").persist()
    assert(profiles.count() == 10000L)
    val attrs = Wrappers.toLongLayout(profiles)
    val cb = Pipeline.cleanBlocks(Blocking.tokenKeys(attrs), clean = false,
      smoothFactor = 1.025, filterFactor = 0.8)
    assert(cb.stats0.count() == 11088L)
    assert(cb.stats1.count() == 11034L)
    assert(cb.stats2.count() == 11033L)

    val gt = Wrappers.loadGroundTruthJson(spark, s"$dir/10KIdDuplicates.json",
      firstAttr = "d1Id", secondAttr = "d2Id")
    val prof = profiles.select("original_id", "profile_id")
    val gtc = Evaluation.convertGroundTruth(gt, prof, prof).persist()
    assert(gtc.count() == 8705L)

    val pairs = graft.util.Snapshot(cb.pairs())
    assert(pairs.count() == 170634L)
    assert(pairs.join(gtc, Seq("p1", "p2"), "left_semi").count() == 8504L)

    val profStats = graft.util.Snapshot(cb.profileStats)
    val w = graft.util.Snapshot(
      MetaBlocking.weightedPairs(pairs, profStats, cb.numberOfBlocks, WeightType.CBS))
    val sw = Some(graft.util.Snapshot(
      MetaBlocking.selfWeights(profStats, cb.numberOfBlocks, WeightType.CBS)))
    for ((ct, refEdges, refMatches) <- Seq(
        (ComparisonType.OR, 10545L, 7590L),
        (ComparisonType.AND, 10122L, 7262L))) {
      val kept = graft.util.Snapshot(
        MetaBlocking.wnp(w, ThresholdType.AVG, ct, WeightType.CBS, selfW = sw))
      val n = kept.count()
      assert(n == refEdges, s"WNP CBS $ct edges $n vs $refEdges")
      val m = kept.join(gtc, Seq("p1", "p2"), "left_semi").count()
      assert(m == refMatches, s"WNP CBS $ct matches $m vs $refMatches")
    }
    val wep = graft.util.Snapshot(MetaBlocking.wep(w, selfW = sw))
    assert(wep.count() == 10561L)
    assert(wep.join(gtc, Seq("p1", "p2"), "left_semi").count() == 7621L)
  }

  test("abtBuy clean-clean pipeline: WNP parity across all weight schemes") {
    val dir = "/root/reference/python/datasets/clean/abtBuy"
    assume(new java.io.File(s"$dir/dataset1.json").canRead, "reference datasets not present")
    // Expected values from executing the reference implementation
    // (python/sparker, pyspark local[8]) with the Clean-Clean notebook
    // parameters: purging smooth=1.025, filtering r=0.8, AVG thresholds.
    val p1 = Wrappers.loadProfilesJson(spark, s"$dir/dataset1.json",
      realIdField = "realProfileID", sourceId = 0).persist()
    val n1 = p1.count()
    assert(n1 == 1076L)
    val p2 = Wrappers.loadProfilesJson(spark, s"$dir/dataset2.json",
      startIdFrom = n1, realIdField = "realProfileID", sourceId = 1).persist()
    assert(p2.count() == 1076L)
    val attrs = Wrappers.toLongLayout(p1.unionByName(p2))
    val cb = Pipeline.cleanBlocks(Blocking.tokenKeys(attrs), clean = true,
      smoothFactor = 1.025, filterFactor = 0.8)
    assert(cb.stats0.count() == 2132L)
    assert(cb.stats1.count() == 2119L)
    assert(cb.stats2.count() == 2107L)

    val gt = Wrappers.loadGroundTruthJson(spark, s"$dir/groundtruth.json")
    val gtc = Evaluation.convertGroundTruth(gt,
      p1.select("original_id", "profile_id"),
      p2.select("original_id", "profile_id")).persist()
    assert(gtc.count() == 1076L)

    val pairs = graft.util.Snapshot(cb.pairs())
    val profStats = graft.util.Snapshot(cb.profileStats)
    // clean ER: no self edges (cross-source neighbors exclude self).
    // ARCS carries the ulp margin documented in the cora test (the
    // reference divides sequentially in set order, we divide once by a
    // sorted product); all other schemes are exact.
    for ((wt, ct, refEdges, refMatches, tol) <- Seq(
        (WeightType.CBS, ComparisonType.OR, 28826L, 1043L, 0L),
        (WeightType.CBS, ComparisonType.AND, 26462L, 1036L, 0L),
        (WeightType.JS, ComparisonType.OR, 40093L, 1056L, 0L),
        (WeightType.JS, ComparisonType.AND, 26274L, 1047L, 0L),
        (WeightType.ECBS, ComparisonType.OR, 32108L, 1054L, 0L),
        (WeightType.ECBS, ComparisonType.AND, 26565L, 1046L, 0L),
        (WeightType.ARCS, ComparisonType.OR, 39580L, 1039L, 60L),
        (WeightType.ARCS, ComparisonType.AND, 3423L, 71L, 60L),
        (WeightType.ChiSquare, ComparisonType.OR, 33762L, 1058L, 0L))) {
      val w = graft.util.Snapshot(
        MetaBlocking.weightedPairs(pairs, profStats, cb.numberOfBlocks, wt))
      val kept = graft.util.Snapshot(
        MetaBlocking.wnp(w, ThresholdType.AVG, ct, wt))
      val n = kept.count()
      assert(math.abs(n - refEdges) <= tol, s"WNP $wt $ct edges $n vs $refEdges")
      val m = kept.join(gtc, Seq("p1", "p2"), "left_semi").count()
      assert(math.abs(m - refMatches) <= tol, s"WNP $wt $ct matches $m vs $refMatches")
    }
  }

  test("Amazon-GoogleProducts CSV clean-clean: WNP parity across weight schemes") {
    val dir = "/root/reference/python/datasets/clean/Amazon-GoogleProducts"
    assume(new java.io.File(s"$dir/Amazon.csv").canRead, "reference datasets not present")
    // The one bundled CLEAN-CLEAN dataset shipped as CSV — exercises the
    // CSV loader end-to-end (quoted multi-comma fields, empty cells)
    // where cora/restaurant cover the dirty CSV path. Expected values
    // from executing the reference implementation (python/sparker,
    // pyspark local[8]): CSVWrapper.load_profiles on both files, token
    // blocking, purging smooth=1.025, filtering r=0.8, AVG-threshold WNP.
    // ChiSquare's chi2 rule replaces OR/AND (identical results), so one
    // row covers it. ARCS is omitted: its weights depend on the
    // reference's arbitrary id file-order (sequential division order),
    // which string ids ("b000jz4hqo", URLs) give no way to replicate.
    val p1 = Wrappers.loadProfilesCsv(spark, s"$dir/Amazon.csv",
      realIdField = "id", sourceId = 0).persist()
    val n1 = p1.count()
    assert(n1 == 1363L)
    val p2 = Wrappers.loadProfilesCsv(spark, s"$dir/GoogleProducts.csv",
      startIdFrom = n1, realIdField = "id", sourceId = 1).persist()
    assert(p2.count() == 3226L)
    val attrs = Wrappers.toLongLayout(p1.unionByName(p2))
    val cb = Pipeline.cleanBlocks(Blocking.tokenKeys(attrs), clean = true,
      smoothFactor = 1.025, filterFactor = 0.8)
    assert(cb.stats0.count() == 6834L)
    assert(cb.stats1.count() == 6818L)
    assert(cb.stats2.count() == 6806L)

    val gt = Wrappers.loadGroundTruthCsv(spark,
      s"$dir/Amzon_GoogleProducts_perfectMapping.csv",
      id1 = "idAmazon", id2 = "idGoogleBase")
    val gtc = Evaluation.convertGroundTruth(gt,
      p1.select("original_id", "profile_id"),
      p2.select("original_id", "profile_id")).persist()
    assert(gtc.count() == 1300L)

    val pairs = graft.util.Snapshot(cb.pairs())
    assert(pairs.count() == 1391858L)
    assert(pairs.join(gtc, Seq("p1", "p2"), "left_semi").count() == 1298L)

    val profStats = graft.util.Snapshot(cb.profileStats)
    for ((wt, ct, refEdges, refMatches) <- Seq(
        (WeightType.CBS, ComparisonType.OR, 539517L, 1290L),
        (WeightType.CBS, ComparisonType.AND, 403244L, 1271L),
        (WeightType.JS, ComparisonType.OR, 686131L, 1284L),
        (WeightType.JS, ComparisonType.AND, 300547L, 1226L),
        (WeightType.ECBS, ComparisonType.OR, 515731L, 1282L),
        (WeightType.ECBS, ComparisonType.AND, 427571L, 1278L),
        (WeightType.ChiSquare, ComparisonType.OR, 399105L, 1269L))) {
      val w = graft.util.Snapshot(
        MetaBlocking.weightedPairs(pairs, profStats, cb.numberOfBlocks, wt))
      val kept = graft.util.Snapshot(
        MetaBlocking.wnp(w, ThresholdType.AVG, ct, wt))
      val n = kept.count()
      assert(n == refEdges, s"WNP $wt $ct edges $n vs $refEdges")
      val m = kept.join(gtc, Seq("p1", "p2"), "left_semi").count()
      assert(m == refMatches, s"WNP $wt $ct matches $m vs $refMatches")
    }
  }

  test("DblpAcm BLAST end-to-end: LSH clustering -> chi2+entropy WNP parity") {
    val dblpDir = "/root/reference/python/datasets/clean/DblpAcm"
    assume(new java.io.File(s"$dblpDir/dataset1.json").canRead, "reference datasets not present")
    import org.apache.spark.sql.functions._
    // The full BLAST pipeline of python/examples/BLAST.ipynb on a bundled
    // dataset: cluster_similar_attributes(num_hashes=128, threshold=0.5,
    // compute_entropy=True) -> create_blocks_clusters -> purging 1.005 ->
    // filtering 0.8 -> WNP CHI_SQUARE + entropy, AVG/OR, chi2divider 2.0.
    // Expected values from executing the reference implementation itself
    // (python/sparker, pyspark local[8], fixed LSH seed 1234):
    //   clusters {year,year} {authors,authors} {title,title} {venue,venue}
    //   with entropies 3.309290823680249 / 10.717932082433506 /
    //   9.280896484656079 / 3.3225607247542883
    //   blocks 7120 / purged 7010 / after-filtering 6998
    //   candidate pairs 73484, recall 1.0 (matches 2224)
    //   WNP chi2+entropy: edges 6957, matches 2221
    // The LSH hash family differs (deterministic polynomial hashes vs the
    // reference's seeded random affine family), but 128 hashes estimate
    // signature similarity within a few percent, so both sides agree on
    // this schema's alignment — asserted explicitly below before any
    // count that depends on it: THREE real clusters {year} {title}
    // {authors} plus the venues in the DEFAULT cluster. (The notebook's
    // printed output lists four clusters, but the fourth IS the default:
    // instrumenting the reference's own LSH stage shows exactly three
    // band buckets / candidate edges — venue's cross-source token Jaccard
    // is 0.214, which 32 bands of 4 rows collide with probability ~0.065,
    // and neither hash family finds it. Both sides then key venue tokens
    // with the default-cluster id, so the block structure is identical.)
    // Entropies are hash-free exact quantities (token distributions); the
    // cluster MEAN matches because every cluster here has exactly 2
    // attributes — the reference divides by len((key, iterable)) == 2, a
    // fixed 2 regardless of cluster size (attribute_clustering.py:313),
    // we divide by the true size.
    val p1 = Wrappers.loadProfilesJson(spark, s"$dblpDir/dataset1.json",
      realIdField = "realProfileID", sourceId = 0).persist()
    val n1 = p1.count()
    val p2 = Wrappers.loadProfilesJson(spark, s"$dblpDir/dataset2.json",
      startIdFrom = n1, realIdField = "realProfileID", sourceId = 1).persist()
    val attrs = Wrappers.toLongLayout(p1.unionByName(p2))

    // 128 hashes at threshold 0.5: the reference's row count is 4
    // (get_num_rows(0.5, 128)), i.e. 32 bands of 4 rows
    val clusters = graft.util.Snapshot(AttributeClustering.clusterAttributes(
      attrs, k = 128, bands = 32, maxFactor = 1.0, computeEntropy = true))

    // the partition must be exactly the reference's: each attribute
    // paired with its cross-source twin, nothing in the default cluster
    val grouped = clusters.groupBy("cluster_id")
      .agg(sort_array(collect_list("qattr")).as("members"),
        min("entropy").as("ent"), max("is_default").as("dflt"))
      .collect().map(r => (r.getSeq[String](1).toList,
        r.getDouble(2), r.getBoolean(3)))
    assert(grouped.count(!_._3) == 3, s"expected 3 real clusters: ${grouped.toList}")
    // each cluster (incl. the default holding the venues) =
    // {0_<attr>, 1_<attr>} for one base attribute
    val entByAttr = grouped.map { case (m, e, dflt) =>
      val bases = m.map(_.drop(2)).distinct
      assert(m.size == 2 && bases.size == 1, s"cluster mixes attributes: $m")
      assert(dflt == (bases.head == "venue"),
        s"only the venues belong in the default cluster: $m default=$dflt")
      bases.head -> e
    }.toMap
    assert(entByAttr.keySet == Set("authors", "title", "venue", "year"),
      s"unexpected cluster attributes: ${entByAttr.keySet}")
    // entropy parity (hash-free): reference values, fp-order tolerance
    val refEnt = Map("year" -> 3.309290823680249, "authors" -> 10.717932082433506,
      "title" -> 9.280896484656079, "venue" -> 3.3225607247542883)
    refEnt.foreach { case (a, e) =>
      assert(entByAttr.contains(a), s"no cluster for $a: $entByAttr")
      assert(math.abs(entByAttr(a) - e) < 1e-9, s"entropy($a) ${entByAttr(a)} vs $e")
    }

    val keysEnt = graft.util.Snapshot(
      AttributeClustering.clusterKeys(attrs, clusters))
    val cb = Pipeline.cleanBlocks(
      keysEnt.select("profile_id", "source_id", "key"), clean = true,
      smoothFactor = 1.005, filterFactor = 0.8)
    assert(cb.stats0.count() == 7120L)
    assert(cb.stats1.count() == 7010L)
    assert(cb.stats2.count() == 6998L)

    val gt = Wrappers.loadGroundTruthJson(spark, s"$dblpDir/groundtruth.json")
    val gtc = Evaluation.convertGroundTruth(gt,
      p1.select("original_id", "profile_id"),
      p2.select("original_id", "profile_id")).persist()
    assert(gtc.count() == 2224L)

    val blockEnt = keysEnt.select("key", "entropy").distinct()
      .groupBy("key").agg(max(col("entropy")).as("entropy"))
    val pairs = graft.util.Snapshot(cb.pairs(Some(blockEnt)))
    assert(pairs.count() == 73484L)
    assert(pairs.join(gtc, Seq("p1", "p2"), "left_semi").count() == 2224L)

    val profStats = graft.util.Snapshot(cb.profileStats)
    val weighted = graft.util.Snapshot(MetaBlocking.weightedPairs(
      pairs, profStats, cb.numberOfBlocks, WeightType.ChiSquare, useEntropy = true))
    val kept = graft.util.Snapshot(MetaBlocking.wnp(
      weighted, ThresholdType.AVG, ComparisonType.OR, WeightType.ChiSquare,
      chi2divider = 2.0))
    assert(kept.count() == 6957L)
    assert(kept.join(gtc, Seq("p1", "p2"), "left_semi").count() == 2221L)
  }

  test("DblpAcm clean-clean pipeline: exact PC/PQ parity with the reference") {
    val dblpDir = "/root/reference/python/datasets/clean/DblpAcm"
    assume(new java.io.File(s"$dblpDir/dataset1.json").canRead, "reference datasets not present")
    // two sources with contiguous id ranges, like the reference's
    // start_id_from convention (Clean-Clean datasets.ipynb)
    val p1 = Wrappers.loadProfilesJson(spark, s"$dblpDir/dataset1.json",
      realIdField = "realProfileID", sourceId = 0).persist()
    val n1 = p1.count()
    val p2 = Wrappers.loadProfilesJson(spark, s"$dblpDir/dataset2.json",
      startIdFrom = n1, realIdField = "realProfileID", sourceId = 1).persist()
    val attrs = Wrappers.toLongLayout(p1.unionByName(p2))
    val keys = Blocking.tokenKeys(attrs)
    val cb = Pipeline.cleanBlocks(keys, clean = true,
      smoothFactor = 1.025, filterFactor = 0.8)

    assert(cb.stats0.count() == 7004L)
    assert(cb.stats1.count() == 6969L)
    assert(cb.stats2.count() == 6966L)

    val gt = Wrappers.loadGroundTruthJson(spark, s"$dblpDir/groundtruth.json")
    val gtc = Evaluation.convertGroundTruth(gt,
      p1.select("original_id", "profile_id"),
      p2.select("original_id", "profile_id")).persist()
    assert(gtc.count() == 2224L)

    val pairs = graft.util.Snapshot(cb.pairs())
    assert(pairs.count() == 178285L)
    assert(pairs.join(gtc, Seq("p1", "p2"), "left_semi").count() == 2224L) // recall 1.0

    val profStats = graft.util.Snapshot(cb.profileStats)
    val weighted = graft.util.Snapshot(
      MetaBlocking.weightedPairs(pairs, profStats, cb.numberOfBlocks, WeightType.CBS))
    // clean ER has NO self edges: cross-source neighbor resolution
    // excludes the profile itself (pruning_utils.py:29-53)

    val wnpOr = graft.util.Snapshot(MetaBlocking.wnp(
      weighted, ThresholdType.AVG, ComparisonType.OR, WeightType.CBS))
    assert(wnpOr.count() == 34342L)
    assert(wnpOr.join(gtc, Seq("p1", "p2"), "left_semi").count() == 2224L)

    val wnpAnd = graft.util.Snapshot(MetaBlocking.wnp(
      weighted, ThresholdType.AVG, ComparisonType.AND, WeightType.CBS))
    assert(wnpAnd.count() == 31343L)
    assert(wnpAnd.join(gtc, Seq("p1", "p2"), "left_semi").count() == 2223L)

    val wep = graft.util.Snapshot(MetaBlocking.wep(weighted))
    assert(wep.count() == 32676L)
    assert(wep.join(gtc, Seq("p1", "p2"), "left_semi").count() == 2224L)

    // CNP tie choice is arbitrary in the reference (argpartition over
    // set-ordered neighbors — see the cora test); counts agree within the
    // tie margin. Reference: OR 28639/2223, AND 10393/2218.
    def near(x: Long, ref: Long, tolPct: Double = 1.0): Boolean =
      math.abs(x - ref) <= math.max(1, (ref * tolPct / 100).toLong)
    val nProfiles = n1 + p2.count()
    val cnpOr = graft.util.Snapshot(MetaBlocking.cnp(
      weighted, cb.stats2, nProfiles, ComparisonType.OR))
    assert(near(cnpOr.count(), 28639L))
    assert(near(cnpOr.join(gtc, Seq("p1", "p2"), "left_semi").count(), 2223L))
    val cnpAnd = graft.util.Snapshot(MetaBlocking.cnp(
      weighted, cb.stats2, nProfiles, ComparisonType.AND))
    assert(near(cnpAnd.count(), 10393L))
    assert(near(cnpAnd.join(gtc, Seq("p1", "p2"), "left_semi").count(), 2218L))
  }
}
