package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-salted inner equi-join — the standard mitigation when one join key
 * dominates (a hot user, a viral document): a plain shuffle join sends
 * every row of the hot key to ONE reducer, so a single task runs as long
 * as the whole stage. Salting splits that key across `salt` reducers:
 *
 *  - every probe-side row picks a deterministic salt in [0, salt) from a
 *    high-cardinality column (its timestamp, its id — anything that
 *    spreads rows of the SAME key);
 *  - the build side replicates each row `salt` times (explode of a
 *    sequence literal — no shuffle, the replication happens map-side);
 *  - the join key becomes (keys..., salt), so the hot key's rows land on
 *    `salt` different reducers, each joining against its own replica.
 *
 * Lossless: a probe row has exactly one salt value and the build side
 * has exactly one replica per salt value, so every original matching
 * pair meets exactly once and no pair is lost — the oracle for any
 * query built on this is the naive join SQL. Cost: |build| * salt extra
 * rows through the exchange, the price of an evenly-loaded stage.
 *
 * AQE's skew-join handling covers the sort-merge case at runtime; this
 * operator is the explicit form for when the planner must be forced
 * (first-stage aggregations feeding the join, bucketed layouts, or
 * stream-static joins where AQE does not apply).
 */
object SaltedJoin {

  /**
   * Inner equi-join of `probe` (large, possibly key-skewed) with `build`
   * (too big to broadcast, small enough to replicate `salt` times) on
   * `keys`. `saltCols` picks the probe columns whose hash spreads the
   * hot key's rows — they must be high-cardinality WITHIN a key (a
   * timestamp, an event id); defaults to all probe columns. Column sets
   * must be disjoint apart from `keys`.
   */
  def equiJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
               salt: Int = 8, saltCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty && salt >= 1)
    val sc = if (saltCols.nonEmpty) saltCols else probe.columns.toSeq
    val p = probe.withColumn("__salt", pmod(hash(sc.map(col): _*), lit(salt)))
    val b = build.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, keys :+ "__salt").drop("__salt")
  }
}
