package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/**
 * AS-OF join as a first-class operator: each LEFT (probe) row is joined
 * to the RIGHT (reference) row with the same key and the greatest
 * reference time at-or-before the probe time — `merge_asof(direction =
 * backward, allow_exact_matches = true)`, QuestDB/kdb ASOF JOIN, DuckDB
 * `ASOF LEFT JOIN` (which is also this operator's independent oracle).
 *
 * Spark's built-ins can only express this as union-tag → window → self
 * join ([[graft.streaming.EventStreams.asofJoin]]) or as a range join.
 * This node does it the way a native engine would: both sides hash
 * cluster on the key and sort by (key, time) — exactly the distribution
 * and ordering contracts SortMergeJoin uses, so EnsureRequirements
 * plans the same two exchanges and AQE coalesces them together — then
 * ONE forward-only merge pass per partition emits each probe row with
 * the latest candidate seen. No second join, no doubled row stream
 * through a window, O(1) state (a single buffered reference row) per
 * partition: the shape that survives a 100 TB probe side.
 *
 * Tie rule: the right side additionally sorts by `rightTieBreak`, and
 * among reference rows sharing the winning (key, time) the LAST in that
 * order wins (e.g. tie-break on event_id asc ⇒ the max event_id) —
 * deterministic under any partitioning.
 *
 * Types: keys must be integral (int/long), times timestamp or integral
 * (timestamps are compared by their micros encoding). NULL keys or
 * times never match: a null-keyed probe row emits with a null right
 * side; null reference rows are skipped.
 */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]; injected by
 * [[GraftExtensions]] and (idempotently) by `graft.operators.AsOf`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  private def checkTypes(): Unit = {
    def integral(e: Expression) = e.dataType == LongType || e.dataType == IntegerType
    def timeLike(e: Expression) = integral(e) || e.dataType == TimestampType
    require(integral(leftKey) && integral(rightKey),
      s"asof keys must be int/long, got ${leftKey.dataType}/${rightKey.dataType}")
    require(timeLike(leftTime) && timeLike(rightTime),
      s"asof times must be timestamp/int/long, got ${leftTime.dataType}/${rightTime.dataType}")
  }
  checkTypes()

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  // the same contracts SortMergeJoin declares: hash cluster both sides on
  // the key (EnsureRequirements co-partitions the two exchanges), sort
  // within partitions by (key, time[, tie-break])
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTieBreak, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = Seq(leftKey, leftTime)
    val rKeyExprs = Seq(rightKey, rightTime)
    val outAttrs = output
    // type-aware long readers (int fields must not be read as longs)
    def longGetter(dt: org.apache.spark.sql.types.DataType, i: Int): InternalRow => Long =
      if (dt == IntegerType) r => r.getInt(i).toLong else r => r.getLong(i)
    val lkGet = longGetter(leftKey.dataType, 0)
    val ltGet = longGetter(leftTime.dataType, 1)
    val rkGet = longGetter(rightKey.dataType, 0)
    val rtGet = longGetter(rightTime.dataType, 1)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rProj = UnsafeProjection.create(rKeyExprs, rOut)
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      // single buffered candidate: the latest eligible reference row for
      // the key currently being probed (both iterators ascend (key, time))
      var cand: InternalRow = null
      var candKey = 0L
      // one-row lookahead on the reference side; valid until the next
      // rIter.next() overwrites the shared buffer, which only happens
      // after we either copy it into cand or discard it
      var rHead: InternalRow = null
      var rHeadValid = false
      var rHeadKey = 0L
      var rHeadTime = 0L

      def loadRightHead(): Boolean = {
        while (!rHeadValid && rIter.hasNext) {
          val row = rIter.next()
          val k = rProj(row)
          if (!k.isNullAt(0) && !k.isNullAt(1)) {
            rHead = row; rHeadKey = rkGet(k); rHeadTime = rtGet(k)
            rHeadValid = true
          }
        }
        rHeadValid
      }

      // consume reference rows while they are at-or-before (lk, lt),
      // remembering the last one with the SAME key as the probe
      def advanceTo(lk: Long, lt: Long): Unit = {
        var continue = true
        while (continue && loadRightHead()) {
          if (rHeadKey < lk || (rHeadKey == lk && rHeadTime <= lt)) {
            if (rHeadKey == lk) { cand = rHead.copy(); candKey = rHeadKey }
            rHeadValid = false
          } else continue = false
        }
      }

      lIter.map { lRow =>
        val k = lProj(lRow)
        numOutputRows += 1
        if (k.isNullAt(0) || k.isNullAt(1)) {
          outProj(joined(lRow, nullRight))
        } else {
          val lk = lkGet(k)
          val lt = ltGet(k)
          advanceTo(lk, lt)
          if (cand != null && candKey == lk) {
            numMatched += 1
            outProj(joined(lRow, cand))
          } else outProj(joined(lRow, nullRight))
        }
      }
    }
  }
}
