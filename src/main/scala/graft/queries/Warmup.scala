package graft.queries

import org.apache.spark.sql.SparkSession
import graft.er.WeightType

/**
 * Eagerly builds every cross-query memoized cache (blocking/cleaning
 * spine, pair graph, per-scheme weighted graphs, supervised features,
 * attribute clusters, dedup shingles/simhash) so Bench's per-query times
 * measure the operator itself, not first-touch construction of shared
 * state — r1's numbers misattributed the whole supervised pipeline to
 * whichever query ran first. Bench times this as its own entry.
 */
object Warmup {
  private def step(name: String)(f: => Any): Unit = {
    val t0 = System.nanoTime()
    f
    System.err.println(f"[warmup] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
  }

  def run(s: SparkSession, d: String): Unit = {
    step("cleaned_dirty")(ErQueries.cleaned(s, d, clean = false))
    step("cleaned_clean")(ErQueries.cleaned(s, d, clean = true))
    step("pairs_dirty")(ErQueries.cachedPairs(s, d, clean = false))
    step("pairs_clean")(ErQueries.cachedPairs(s, d, clean = true))
    step("pstats_dirty")(ErQueries.cachedProfileStats(s, d, clean = false))
    step("pstats_clean")(ErQueries.cachedProfileStats(s, d, clean = true))
    step("wide_dirty")(ErQueries.wideWeighted(s, d, clean = false))
    step("wide_clean")(ErQueries.wideWeighted(s, d, clean = true))
    step("self_weights")(ErQueries.selfWeightsCached(s, d, WeightType.CBS))
    step("wnp_cbs")(ErQueries.wnpCbsAvgOrDirty(s, d))
    // building the query populates the 3-source weighted-graph snapshot
    step("wnp_3src")(ErQueries.all("er_wnp_cbs_3src")(s, d))
    step("gt_convert")(ErQueries.gtConverted(s, d))
    step("clusters")(SupQueries.clusters(s, d))
    step("blast_weighted")(SupQueries.blastWeighted(s, d))
    step("features")(SupQueries.features(s, d))
    step("scored")(SupQueries.scored(s, d))
    step("ml_scored")(SupQueries.mlScored(s, d))
    step("train")(TrainQueries.warm(s, d))
  }
}
