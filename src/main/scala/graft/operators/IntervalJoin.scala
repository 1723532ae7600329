package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval-overlap equi-join: pairs of intervals (same key) that overlap
 * in time — the symmetric sibling of [[RangeJoin]]'s point-in-interval
 * probe. Spark plans the naive `a.start < b.end AND b.start < a.end`
 * theta join as a nested-loop; the lossless rewrite bins both sides into
 * fixed windows (an interval lands in every bin it touches), hash-joins
 * on (key, bin), dedups the pair, and verifies the exact predicate —
 * each true overlapping pair shares at least the bin containing the
 * later start, and the final filter removes bin-coincidence false
 * positives, so the result equals the theta join at hash-join cost.
 * Bin width trades replication (long intervals × narrow bins) against
 * candidate fan-in (wide bins); size it near the median interval length.
 */
object IntervalJoin {

  /** Half-open [start, end) overlap of `a`-side and `b`-side interval
   * frames on equal `keyCols`. Column prefixes keep the two sides'
   * payloads apart in the output (every non-key column is emitted with
   * its side's prefix). Rows with end <= start (empty intervals) match
   * nothing, as in the theta join. */
  def overlapJoin(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                  startCol: String, endCol: String,
                  binSeconds: Long = 86400L): DataFrame = {
    require(binSeconds > 0)
    val binUs = binSeconds * 1000000L
    def bins(df: DataFrame, prefix: String): DataFrame = {
      val others = df.columns.filterNot(keyCols.contains)
      val renamed = others.foldLeft(df) { (d, c) =>
        d.withColumnRenamed(c, s"$prefix$c")
      }
      renamed
        .filter(col(s"$prefix$endCol") > col(s"$prefix$startCol"))
        .withColumn("_s", unix_micros(col(s"$prefix$startCol")))
        .withColumn("_e", unix_micros(col(s"$prefix$endCol")))
        // integer div, not floor(double/): exact at every bin boundary
        .withColumn("_bin", explode(sequence(
          expr(s"_s div $binUs"), expr(s"(_e - 1) div $binUs"))))
        .drop("_s", "_e")
    }
    val left = bins(a, "a_")
    val right = bins(b, "b_")
    left.join(right, keyCols :+ "_bin")
      .filter(col(s"a_$startCol") < col(s"b_$endCol") &&
        col(s"b_$startCol") < col(s"a_$endCol"))
      .drop("_bin")
      .distinct()
  }
}
