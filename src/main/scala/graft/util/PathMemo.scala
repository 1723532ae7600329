package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Path-keyed memo for per-dir materialized artifacts: caches the snapshot
 * PATH, never a DataFrame — a DataFrame is bound to the session that
 * planned it, so a second/restarted session in the same JVM reusing the
 * dir would hold a plan over a possibly-stopped session. Builders may
 * call OTHER memos (computeIfAbsent re-entrance only deadlocks on the
 * SAME map, and no builder touches its own). Shared shape of the
 * TrainQueries per-dir artifact memos, lifted to util for the other
 * query families.
 */
final class PathMemo {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, String]
  def apply(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    s.read.parquet(m.computeIfAbsent(key, _ =>
      Snapshot.materialize(build)._1))
}
