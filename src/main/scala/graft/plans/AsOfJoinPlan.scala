package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, TimestampType}

/**
 * AS-OF join as a first-class operator: each LEFT (probe) row is joined
 * to the RIGHT (reference) row with the same key(s) and the greatest
 * reference time at-or-before the probe time — `merge_asof(direction =
 * backward, allow_exact_matches = true)`, QuestDB/kdb ASOF JOIN, DuckDB
 * `ASOF LEFT JOIN` (which is also this operator's independent oracle).
 *
 * Spark's built-ins can only express this as union-tag → window → self
 * join ([[graft.streaming.EventStreams.asofJoin]]) or as a range join.
 * This node does it the way a native engine would: both sides hash
 * cluster on the keys and sort by (keys, time) — the same distribution
 * and ordering contracts SortMergeJoin declares, so EnsureRequirements
 * plans the two exchanges and AQE coalesces them together — then ONE
 * forward-only merge pass per partition emits each probe row with the
 * latest candidate seen. No second join, no doubled row stream through
 * a window, O(1) state (a single buffered reference row) per
 * partition: the shape that survives a 100 TB probe side.
 *
 * Tie rule: the right side additionally sorts by `rightTieBreak`, and
 * among reference rows sharing the winning (keys, time) the LAST in
 * that order wins (e.g. tie-break on event_id asc ⇒ the max event_id)
 * — deterministic under any partitioning.
 *
 * Types: key columns must be integral (int/long), times timestamp or
 * integral (timestamps compare by their micros encoding). NULL keys or
 * times never match: a null-keyed probe row emits with a null right
 * side; null reference rows are skipped.
 */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
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
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  private def checkTypes(): Unit = {
    def integral(e: Expression) = e.dataType == LongType || e.dataType == IntegerType
    def timeLike(e: Expression) = integral(e) || e.dataType == TimestampType
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"asof needs matching key lists, got ${leftKeys.size}/${rightKeys.size}")
    require(leftKeys.forall(integral) && rightKeys.forall(integral),
      s"asof keys must be int/long, got ${leftKeys.map(_.dataType)}/${rightKeys.map(_.dataType)}")
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
  // the keys (EnsureRequirements co-partitions the two exchanges), sort
  // within partitions by (keys, time[, tie-break])
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime :+ rightTieBreak).map(SortOrder(_, Ascending)))

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
    val nKeys = leftKeys.size
    // projected layout: [key0..keyN-1, time] on each side
    val lKeyExprs = leftKeys :+ leftTime
    val rKeyExprs = rightKeys :+ rightTime
    val outAttrs = output
    // type-aware long readers (int fields must not be read as longs)
    def getters(exprs: Seq[Expression]): Array[InternalRow => Long] =
      exprs.zipWithIndex.map { case (e, i) =>
        if (e.dataType == IntegerType) (r: InternalRow) => r.getInt(i).toLong
        else (r: InternalRow) => r.getLong(i)
      }.toArray
    val lGet = getters(lKeyExprs)
    val rGet = getters(rKeyExprs)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rProj = UnsafeProjection.create(rKeyExprs, rOut)
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      // single buffered candidate: the latest eligible reference row for
      // the key vector currently being probed (both iterators ascend
      // (keys, time)); candKeys holds the candidate's key vector
      var cand: InternalRow = null
      val candKeys = new Array[Long](nKeys)
      // one-row lookahead on the reference side; valid until the next
      // rIter.next() overwrites the shared buffer, which only happens
      // after we either copy it into cand or discard it
      var rHeadValid = false
      var rHead: InternalRow = null
      val rHeadKeys = new Array[Long](nKeys)
      var rHeadTime = 0L

      def anyNull(k: UnsafeRow, n: Int): Boolean = {
        var i = 0
        while (i <= n) { if (k.isNullAt(i)) return true; i += 1 }
        false
      }

      def loadRightHead(): Boolean = {
        while (!rHeadValid && rIter.hasNext) {
          val row = rIter.next()
          val k = rProj(row)
          if (!anyNull(k, nKeys)) {
            var i = 0
            while (i < nKeys) { rHeadKeys(i) = rGet(i)(k); i += 1 }
            rHeadTime = rGet(nKeys)(k)
            rHead = row
            rHeadValid = true
          }
        }
        rHeadValid
      }

      /** -1/0/1: rHead's key vector vs the probe's, lexicographic. */
      def cmpKeys(lk: Array[Long]): Int = {
        var i = 0
        while (i < nKeys) {
          if (rHeadKeys(i) < lk(i)) return -1
          if (rHeadKeys(i) > lk(i)) return 1
          i += 1
        }
        0
      }

      // consume reference rows while they are at-or-before (lk, lt),
      // remembering the last one with the SAME key vector as the probe
      def advanceTo(lk: Array[Long], lt: Long): Unit = {
        var continue = true
        while (continue && loadRightHead()) {
          val c = cmpKeys(lk)
          if (c < 0 || (c == 0 && rHeadTime <= lt)) {
            if (c == 0) {
              cand = rHead.copy()
              System.arraycopy(rHeadKeys, 0, candKeys, 0, nKeys)
            }
            rHeadValid = false
          } else continue = false
        }
      }

      val lk = new Array[Long](nKeys)
      def candMatches(): Boolean = {
        if (cand == null) return false
        var i = 0
        while (i < nKeys) { if (candKeys(i) != lk(i)) return false; i += 1 }
        true
      }

      lIter.map { lRow =>
        val k = lProj(lRow)
        numOutputRows += 1
        if (anyNull(k, nKeys)) {
          outProj(joined(lRow, nullRight))
        } else {
          var i = 0
          while (i < nKeys) { lk(i) = lGet(i)(k); i += 1 }
          val lt = lGet(nKeys)(k)
          advanceTo(lk, lt)
          if (candMatches()) {
            numMatched += 1
            outProj(joined(lRow, cand))
          } else outProj(joined(lRow, nullRight))
        }
      }
    }
  }
}
