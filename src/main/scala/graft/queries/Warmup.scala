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

  /** Run independent cache builds CONCURRENTLY: Spark schedules jobs from
   * many threads at once (FIFO across jobs, tasks interleave), so a wave
   * of independent pipeline builds overlaps its shuffles instead of
   * leaving most of local[32] idle between stages. Steps are grouped into
   * dependency waves; within a wave each step runs on its own thread.
   *
   * Every step is awaited (Future.sequence with a generous finite timeout,
   * so a hung step can't block warmup forever) and per-step failures are
   * logged individually before the first one is rethrown — one failed step
   * no longer obscures its siblings or leaves them running unobserved. */
  private def wave(steps: (String, () => Any)*): Unit = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(steps.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val fs = steps.map { case (name, f) =>
      Future(step(name)(f())).transform(
        identity,
        { e => System.err.println(s"[warmup] step $name FAILED: $e"); e })
    }
    try Await.result(Future.sequence(fs.toList), 30.minutes)
    finally pool.shutdown()
  }

  def run(s: SparkSession, d: String): Unit = {
    // wave 1: the two blocking spines + independent side pipelines
    wave(
      "cleaned_dirty" -> (() => ErQueries.cleaned(s, d, clean = false)),
      "cleaned_clean" -> (() => ErQueries.cleaned(s, d, clean = true)),
      "gt_convert" -> (() => ErQueries.gtConverted(s, d)),
      "clusters" -> (() => SupQueries.clusters(s, d)),
      "train" -> (() => TrainQueries.warm(s, d)))
    // wave 2: pair graphs + per-profile stats (need the spines), BLAST
    // (needs clusters), 3-source (independent spine of its own)
    wave(
      "pairs_dirty" -> (() => ErQueries.cachedPairs(s, d, clean = false)),
      "pairs_clean" -> (() => ErQueries.cachedPairs(s, d, clean = true)),
      "pstats_dirty" -> (() => ErQueries.cachedProfileStats(s, d, clean = false)),
      "pstats_clean" -> (() => ErQueries.cachedProfileStats(s, d, clean = true)),
      "blast_weighted" -> (() => SupQueries.blastWeighted(s, d)),
      "wnp_3src" -> (() => ErQueries.all("er_wnp_cbs_3src")(s, d)),
      "features" -> (() => SupQueries.features(s, d)),
      "features_clean" -> (() => SupQueries.featuresClean(s, d)))
    // wave 3: weighted graphs + supervised scoring
    wave(
      "wide_dirty" -> (() => ErQueries.wideWeighted(s, d, clean = false)),
      "wide_clean" -> (() => ErQueries.wideWeighted(s, d, clean = true)),
      "self_weights" -> (() => ErQueries.selfWeightsCached(s, d, WeightType.CBS)),
      "scored" -> (() => SupQueries.scored(s, d)),
      "ml_scored" -> (() => SupQueries.mlScored(s, d)))
    // wave 4: WNP candidate snapshots (need wide + self) + the shared
    // classifier-positive edge set (needs scored)
    wave(
      "wnp_cbs" -> (() => ErQueries.wnpCbsAvgOrDirty(s, d)),
      "wnp_cbs_clean" -> (() => ErQueries.wnpCbsAvgOrClean(s, d)),
      "directed_cbs_clean" -> (() => ErQueries.directedCbsClean(s, d)),
      "positives" -> (() => SupQueries.positives(s, d)))
  }
}
