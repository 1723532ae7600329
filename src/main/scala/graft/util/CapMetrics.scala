package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Observable drop counts for frequency-capped operators — the engine's
 * "no silent caps" rule made queryable.
 *
 * Several operators bound skew by dropping over-frequent keys before a
 * self-join (winnowPairs' `maxHashFreq`, jaccardPairs' `maxShingleFreq`,
 * the incremental-ER `maxBlockSize`). Each cap changes RECALL, not just
 * cost, so every capped operator routes its pre-filter frame through
 * [[observeDrops]]: a `CollectMetrics` (Dataset.observe) node that counts
 * the rows the cap is about to remove. The node is a pass-through — it
 * never changes rows, schema, or hashes — and the aggregates piggyback on
 * the pass the query already makes over that frame, so the cost is two
 * counters per row, no extra job.
 *
 * Reading the metric:
 *  - batch, same DataFrame instance: run an action that executes the
 *    frame's own plan (`collect()`/`write`), then
 *    `df.queryExecution.observedMetrics(name)` — a Row with
 *    `dropped_rows` and `input_rows`;
 *  - fleet-wide: register a `QueryExecutionListener` (or streaming
 *    `StreamingQueryListener`, which surfaces the same names in progress
 *    events) and log every `observedMetrics` entry — the production
 *    posture, where the cap counts land in the job's metrics system
 *    instead of a log nobody reads.
 *
 * The metric is computed where the cap is APPLIED, before any filter that
 * consumes it, so `dropped_rows > 0` is exactly "this run lost recall to
 * the cap" and the operator's contract stays honest at any scale.
 */
object CapMetrics {

  /** Attach an observed-metrics node named `name` to `df` counting rows
   * matching `dropCond` (as `dropped_rows`) alongside `input_rows`. The
   * caller applies the actual `filter` afterwards — observation and
   * enforcement stay adjacent but separable. */
  def observeDrops(df: DataFrame, name: String, dropCond: Column): DataFrame =
    df.observe(name,
      sum(when(dropCond, 1L).otherwise(0L)).as("dropped_rows"),
      count(lit(1)).as("input_rows"))

  /** Drop every row of `df` whose `keyCol` value occurs more than `maxFreq`
   * times, with the drop count observable under `name` — the shared shape
   * of every frequency cap here (winnowPairs / jaccardPairs /
   * containmentPairs / incremental-ER block caps).
   *
   * Scale shape: the per-key frequency is an AGGREGATION (map-side partials
   * collapse a 10^8-occurrence boilerplate key to one row per input
   * partition), and the enforcement joins back only the HOT keys — by
   * definition at most |rows|/maxFreq of them, in practice a handful — so
   * AQE broadcasts the build side and the occurrence stream itself never
   * shuffles. The alternatives both touch every row with shuffle-width
   * state: `count().over(partitionBy(key))` streams each hot key through
   * ONE window task (no partials, not skew-splittable), and joining the
   * full frequency table back shuffles the whole stream for a value that
   * only matters on the rare hot keys. */
  def dropHotKeys(df: DataFrame, keyCol: String, maxFreq: Long,
                  name: String): DataFrame = {
    val hot = df.groupBy(keyCol).agg(count(lit(1)).as("_f"))
      .filter(col("_f") > maxFreq)
      .select(col(keyCol).as("_hotkey"), lit(1).as("_hot"))
    // null-SAFE equality: groupBy counts the NULL-key group, and <=> lets
    // the join-back actually tag it — a plain = join would leave a hot
    // null-key partition uncounted AND undropped (the one key class the
    // cap silently missed before this)
    observeDrops(df.join(hot, col(keyCol) <=> col("_hotkey"), "left"),
        name, col("_hot").isNotNull)
      .filter(col("_hot").isNull).drop("_hot", "_hotkey")
  }

  /** Observe the quadratic bound of a per-group self-join: given a frame
   * carrying each row's group size in `_csz`, record the largest group's
   * pair volume max(_csz*(_csz-1)/2) as `max_pairs` (+ `input_rows`).
   * Pass-through like [[observeDrops]] — the caller drops `_csz` after.
   * This is the "no silent caps" rule applied to operators whose cost
   * (not recall) is group-quadratic: semDedup's within-cluster join is
   * bounded by the largest k-means cluster, and a degenerate cluster
   * (e.g. all zero vectors landing together) should surface as a metric,
   * not as a mysteriously hung stage at scale. */
  def observeMaxPairs(df: DataFrame, name: String): DataFrame =
    df.observe(name,
      max(col("_csz") * (col("_csz") - lit(1L)) / lit(2L)).cast("long")
        .as("max_pairs"),
      count(lit(1)).as("input_rows"))

  /** The observed drop metrics of the last action on `df`, if the plan
   * carried an [[observeDrops]] node named `name` and an action ran.
   * Plan-local: when the observed frame was materialized by an internal
   * Snapshot (its metrics fired on the snapshot WRITE, not on the returned
   * reader), use a [[Recorder]] instead. */
  def lastDrops(df: DataFrame, name: String): Option[(Long, Long)] =
    df.queryExecution.observedMetrics.get(name)
      .map(r => (r.getAs[Long]("dropped_rows"), r.getAs[Long]("input_rows")))

  /** Session-wide collector of every [[observeDrops]] metric, regardless
   * of which action executed the observed frame (the production wiring:
   * register once, ship the drop counts to the job's metrics system).
   * `QueryExecutionListener` delivery is asynchronous — [[await]] polls. */
  final class Recorder extends org.apache.spark.sql.util.QueryExecutionListener {
    private val m = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
    override def onSuccess(funcName: String,
                           qe: org.apache.spark.sql.execution.QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (n, r) =>
        // field 0 is the headline count (dropped_rows / max_pairs);
        // every CapMetrics node carries input_rows alongside it
        if (r.schema.fieldNames.contains("input_rows"))
          m(n) = (if (r.isNullAt(0)) 0L else r.getLong(0),
            r.getAs[Long]("input_rows"))
      }
    override def onFailure(funcName: String,
                           qe: org.apache.spark.sql.execution.QueryExecution,
                           exception: Exception): Unit = ()
    def get(name: String): Option[(Long, Long)] = m.get(name)
    /** Poll for `name` up to `timeoutMs` (listener bus is async). */
    def await(name: String, timeoutMs: Long = 10000L): Option[(Long, Long)] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (m.get(name).isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      m.get(name)
    }
  }
}
