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
  def run(s: SparkSession, d: String): Unit = {
    ErQueries.cleaned(s, d, clean = false)
    ErQueries.cleaned(s, d, clean = true)
    ErQueries.cachedPairs(s, d, clean = false)
    ErQueries.cachedPairs(s, d, clean = true)
    ErQueries.cachedProfileStats(s, d, clean = false)
    ErQueries.cachedProfileStats(s, d, clean = true)
    ErQueries.wideWeighted(s, d, clean = false)
    ErQueries.wideWeighted(s, d, clean = true)
    ErQueries.selfWeightsCached(s, d, WeightType.CBS)
    ErQueries.gtConverted(s, d)
    SupQueries.clusters(s, d)
    SupQueries.features(s, d)
    SupQueries.scored(s, d)
    SupQueries.mlScored(s, d)
    TrainQueries.warm(s, d)
  }
}
