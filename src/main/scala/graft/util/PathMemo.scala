package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Path-keyed memo for per-dir materialized artifacts: caches the snapshot
 * PATH, never a DataFrame — a DataFrame is bound to the session that
 * planned it, so a second/restarted session in the same JVM reusing the
 * dir would hold a plan over a possibly-stopped session. Builders may
 * call OTHER memos; a builder must never re-enter its OWN memo on the
 * same key (it would wait on its own incomplete cell). Shared shape of
 * the TrainQueries per-dir artifact memos, lifted to util for the other
 * query families.
 *
 * The map holds per-key completion cells rather than running the build
 * inside computeIfAbsent: the ConcurrentHashMap bin lock is never held
 * across a Spark materialization, so concurrent builds of DISTINCT keys
 * never serialize on a shared hash bin. A failed build removes its cell
 * so a later call can retry.
 */
final class PathMemo {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[String]]
  def apply(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val fresh = new java.util.concurrent.CompletableFuture[String]
    val prior = m.putIfAbsent(key, fresh)
    val cell = if (prior != null) prior else {
      try fresh.complete(Snapshot.materialize(build)._1)
      catch {
        case e: Throwable =>
          m.remove(key, fresh); fresh.completeExceptionally(e); throw e
      }
      fresh
    }
    s.read.parquet(cell.join())
  }
}
