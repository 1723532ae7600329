package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Binned point-in-interval (range) join.
 *
 * Spark has no native range-join optimization: `points JOIN intervals ON
 * v >= lo AND v < hi` plans as BroadcastNestedLoopJoin (fine for a tiny
 * interval side, O(|P|*|I|) otherwise). This operator rewrites the range
 * predicate into an EQUI-join on a bin id so Catalyst picks a plain
 * shuffle/broadcast hash join and both sides can be arbitrarily large:
 *
 *  - each interval [lo, hi) explodes to the bins it overlaps
 *    (floor(lo/g) .. ceil(hi/g)-1 for bin width g);
 *  - each point maps to exactly ONE bin (floor(v/g));
 *  - equi-join on the bin id, then the exact predicate filters the
 *    boundary bins.
 *
 * No post-join dedup is needed: an interval appears at most once per bin
 * and a point is in one bin, so a (point, interval) pair can meet only
 * once. Cost is O(|P| + |I| * avgWidth/g) shuffled rows — `binWidth`
 * trades interval replication against boundary-filter selectivity; set it
 * near the median interval width.
 *
 * This is the batch analogue of [[graft.streaming.EventStreams.asofJoin]]
 * (the other custom join the reference lacks) and follows the same
 * composition-first posture: existing operators (explode + equi-join),
 * no custom physical plan needed.
 */
object RangeJoin {

  /**
   * Inner-join `points` to every interval of `intervals` whose
   * [lo, hi) range contains the point's `valueCol` (hi exclusive).
   * Column sets of the two inputs must be disjoint. Empty or inverted
   * intervals (hi <= lo) match nothing and are dropped up front.
   */
  def pointInInterval(points: DataFrame, valueCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val g = lit(binWidth.toDouble)
    val binned = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / g).cast("long"),
        (ceil(col(hiCol) / g) - 1).cast("long"))))
    val p = points.withColumn("__bin", floor(col(valueCol) / g).cast("long"))
    p.join(binned, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}
