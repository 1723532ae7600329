package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.Attribute

import graft.plans.{AsOfDirection, AsOfJoin, AsOfJoinStrategy}

/**
 * Public API over the custom [[graft.plans.AsOfJoinExec]] operator:
 * `AsOf.join(probe, reference, "user_id", "ts", tieBreak = "event_id")`
 * returns each probe row plus the reference row with the same key and
 * the greatest time at-or-before the probe's (backward as-of, exact
 * matches allowed; no match ⇒ reference columns NULL).
 *
 * Column name collisions between the two sides are the caller's to
 * resolve (alias before joining), same as `Dataset.join` with a column
 * expression.
 *
 * Works without any session configuration: the planner strategy is
 * registered idempotently on first use (and is also injected by
 * `graft.plans.GraftExtensions` for spark.sql.extensions users).
 */
object AsOf {

  private def attr(df: DataFrame, name: String): Attribute =
    df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not in [${df.columns.mkString(", ")}]"))

  def join(probe: DataFrame, reference: DataFrame,
           keyCol: String, timeCol: String,
           tieBreakCol: String): DataFrame =
    joinMulti(probe, reference, Seq(keyCol), timeCol, Seq(keyCol), timeCol, tieBreakCol)

  /** Variant with independently named reference-side columns, so callers
   * can pre-alias the reference and keep the joined output unambiguous. */
  def join(probe: DataFrame, reference: DataFrame,
           keyCol: String, timeCol: String,
           refKeyCol: String, refTimeCol: String,
           tieBreakCol: String): DataFrame =
    joinMulti(probe, reference, Seq(keyCol), timeCol, Seq(refKeyCol), refTimeCol, tieBreakCol)

  /** Composite-key variant (`merge_asof(by = [...])`): key lists match
   * positionally between the two sides.
   *
   * @param direction `"backward"` (default — greatest ref time
   *   at-or-before the probe's), `"forward"` (smallest at-or-after) or
   *   `"nearest"` (smaller absolute gap; equal gaps resolve backward)
   * @param tolerance max allowed |probe time − ref time| in the time
   *   column's units (MICROSECONDS for timestamps); candidates beyond it
   *   emit a null right side. Default: unlimited.
   */
  def joinMulti(probe: DataFrame, reference: DataFrame,
                keyCols: Seq[String], timeCol: String,
                refKeyCols: Seq[String], refTimeCol: String,
                tieBreakCol: String,
                direction: String = "backward",
                tolerance: Long = Long.MaxValue): DataFrame = {
    val spark = probe.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = probe.queryExecution.analyzed
    val rPlan = reference.queryExecution.analyzed
    GraftSqlBridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      leftKeys = keyCols.map(attr(probe, _)),
      rightKeys = refKeyCols.map(attr(reference, _)),
      leftTime = attr(probe, timeCol), rightTime = attr(reference, refTimeCol),
      rightTieBreak = attr(reference, tieBreakCol),
      direction = AsOfDirection.parse(direction),
      toleranceTime = tolerance))
  }
}
