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
 * Directions (`merge_asof(direction = ...)` / DuckDB's four ASOF
 * comparison operators):
 *  - [[AsOfDirection.Backward]] (default): greatest reference time
 *    at-or-before the probe time;
 *  - [[AsOfDirection.Forward]]: smallest reference time at-or-after the
 *    probe time;
 *  - [[AsOfDirection.Nearest]]: whichever of the two candidates has the
 *    smaller absolute gap; equal gaps resolve BACKWARD (an exact-time
 *    match always wins with gap 0).
 * All three are the same single forward-only merge pass: backward keeps
 * the last consumed same-key row, forward peeks the un-consumed head —
 * O(1) state either way.
 *
 * `toleranceTime` (optional, in the time column's units — micros for
 * timestamps): a candidate whose |gap| exceeds it is discarded, the
 * probe row emits with a null right side (`merge_asof(tolerance=...)`).
 *
 * Tie rule: the right side additionally sorts by `rightTieBreak`, and
 * among reference rows sharing the winning (keys, time) BACKWARD takes
 * the LAST in that order (tie-break on event_id asc ⇒ the max
 * event_id), FORWARD the FIRST (the min) — each direction picks the row
 * its merge naturally stops on, deterministic under any partitioning.
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
    rightTieBreak: Expression,
    direction: AsOfDirection = AsOfDirection.Backward,
    toleranceTime: Long = Long.MaxValue) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

sealed trait AsOfDirection
object AsOfDirection {
  case object Backward extends AsOfDirection
  case object Forward extends AsOfDirection
  case object Nearest extends AsOfDirection
  def parse(s: String): AsOfDirection = s.toLowerCase match {
    case "backward" => Backward
    case "forward"  => Forward
    case "nearest"  => Nearest
    case other => throw new IllegalArgumentException(
      s"asof direction must be backward|forward|nearest, got '$other'")
  }
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]; injected by
 * [[GraftExtensions]] and (idempotently) by `graft.operators.AsOf`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb, dir, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r), dir, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    left: SparkPlan, right: SparkPlan,
    direction: AsOfDirection = AsOfDirection.Backward,
    toleranceTime: Long = Long.MaxValue) extends BinaryExecNode {

  private def checkTypes(): Unit = {
    def integral(e: Expression) = e.dataType == LongType || e.dataType == IntegerType
    def timeLike(e: Expression) = integral(e) || e.dataType == TimestampType
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"asof needs matching key lists, got ${leftKeys.size}/${rightKeys.size}")
    require(leftKeys.forall(integral) && rightKeys.forall(integral),
      s"asof keys must be int/long, got ${leftKeys.map(_.dataType)}/${rightKeys.map(_.dataType)}")
    // key types must match EXACTLY, not just both-integral: the required
    // distribution hashes each side on its own expressions, and Murmur3
    // hashes Int 5 and Long 5 differently — mixed widths would cluster
    // equal keys to DIFFERENT partitions and silently never match. Cast
    // to a common type before the join instead.
    leftKeys.zip(rightKeys).zipWithIndex.foreach { case ((l, r), i) =>
      require(l.dataType == r.dataType,
        s"asof key $i type mismatch: ${l.dataType} vs ${r.dataType} — " +
          "hash partitioning would route equal keys to different " +
          "partitions; cast both sides to the same type")
    }
    require(timeLike(leftTime) && timeLike(rightTime),
      s"asof times must be timestamp/int/long, got ${leftTime.dataType}/${rightTime.dataType}")
    // times are compared as widened longs across sides (never hashed), so
    // int vs long is fine — but a TIMESTAMP (micros encoding) against a
    // raw integral is a unit mismatch, not a comparison
    require((leftTime.dataType == TimestampType) == (rightTime.dataType == TimestampType),
      s"asof time type mismatch: ${leftTime.dataType} vs ${rightTime.dataType} — " +
        "timestamp micros cannot be compared against a raw integral time")
    require(toleranceTime >= 0, s"asof tolerance must be >= 0, got $toleranceTime")
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
      // bind against the right side's NULLABLE attributes (mirroring
      // `output`): unmatched probes project an all-null right row, and a
      // non-nullable right input (in-memory Dataset, literals) would
      // otherwise bind null-skipping BoundReferences that read garbage —
      // or NPE — from the null GenericInternalRow
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      val isForward = direction == AsOfDirection.Forward
      val isNearest = direction == AsOfDirection.Nearest
      val tol = toleranceTime

      // single buffered candidate: the latest eligible reference row for
      // the key vector currently being probed (both iterators ascend
      // (keys, time)); candKeys holds the candidate's key vector.
      // Forward direction never buffers — its candidate is the
      // un-consumed right head itself.
      var cand: InternalRow = null
      val candKeys = new Array[Long](nKeys)
      var candTime = 0L
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

      // consume reference rows while they are before (lk, lt) —
      // at-or-before for backward/nearest (exact matches resolve
      // backward), strictly-before for forward so an exact-time row
      // stays at the head as the forward candidate — remembering the
      // last consumed one with the SAME key vector as the probe
      def advanceTo(lk: Array[Long], lt: Long): Unit = {
        var continue = true
        while (continue && loadRightHead()) {
          val c = cmpKeys(lk)
          if (c < 0 || (c == 0 && (if (isForward) rHeadTime < lt else rHeadTime <= lt))) {
            if (c == 0 && !isForward) {
              cand = rHead.copy()
              System.arraycopy(rHeadKeys, 0, candKeys, 0, nKeys)
              candTime = rHeadTime
            }
            rHeadValid = false
          } else continue = false
        }
      }

      /** hi - lo saturated to Long.MaxValue on positive overflow (hi and
       * lo of opposite signs whose true difference exceeds Long range —
       * e.g. a Long.MinValue "missing" sentinel vs a real epoch time). */
      def gapSat(hi: Long, lo: Long): Long = {
        val d = hi - lo
        if (((hi ^ lo) & (hi ^ d)) < 0) Long.MaxValue else d
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
          // Gap arithmetic saturates instead of overflowing: the exec
          // accepts arbitrary int/long time columns, and a
          // Long.MinValue-style "missing" sentinel joined against normal
          // epoch times makes the gap exceed Long range. Plain
          // subtraction would flip the sign and silently choose the
          // wrong side; saturating to Long.MaxValue yields the
          // mathematically correct answer — a > 2^63 spread is farther
          // than any tolerance — without aborting the job. (Gaps are
          // non-negative by the merge invariant, so only positive
          // overflow can occur.)
          // backward candidate: last consumed same-key row within tol
          val backOk = !isForward && candMatches() &&
            gapSat(lt, candTime) <= tol
          // forward candidate: the un-consumed head, same key, within tol
          val fwdOk = (isForward || isNearest) && loadRightHead() &&
            cmpKeys(lk) == 0 && gapSat(rHeadTime, lt) <= tol
          val chosen =
            if (isForward) { if (fwdOk) rHead else null }
            else if (isNearest) {
              if (backOk && (!fwdOk ||
                  gapSat(lt, candTime) <= gapSat(rHeadTime, lt))) cand
              else if (fwdOk) rHead
              else null
            } else { if (backOk) cand else null }
          if (chosen != null) {
            numMatched += 1
            outProj(joined(lRow, chosen))
          } else outProj(joined(lRow, nullRight))
        }
      }
    }
  }
}
