package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/**
 * Optimizer rule: rewrite a point-in-interval theta join into a binned
 * equi-join.
 *
 * Spark plans `points JOIN intervals ON v >= lo AND v < hi` (no equality
 * conjunct between the sides) as BroadcastNestedLoopJoin — O(|P|*|I|)
 * work whenever the interval side is too big to be effectively tiny.
 * This rule is the auto-applied twin of
 * [[graft.operators.RangeJoin.pointInInterval]]: it detects the shape in
 * ANY user query (including plain `spark.sql` text) and rewrites it to
 *
 *  - interval side: keep rows with `hi >= lo`, explode each interval to
 *    the bin ids `floor(lo/g) .. floor(hi/g)` (an inclusive SUPERSET of
 *    the bins the interval truly overlaps — safe for both `<` and `<=`
 *    upper bounds, see below);
 *  - point side: project `floor(v/g)` as the row's single bin id;
 *  - equi-join on the bin id, re-applying the ORIGINAL condition
 *    verbatim so boundary-bin candidates are filtered exactly.
 *
 * Losslessness: the exact predicate is re-checked, a point maps to
 * exactly ONE bin, and an interval emits each bin id at most once
 * (`sequence` has distinct elements), so a qualifying pair meets exactly
 * once and a non-qualifying pair survives never — the rewrite can change
 * only the plan, not the result. Bin-coverage proof is monotonicity:
 * x -> floor(cast_double(x)/g) is non-decreasing, so `lo <= v` implies
 * `floor(lo/g) <= floor(v/g)` and `v < hi` (or `<= hi`) implies
 * `floor(v/g) <= floor(hi/g)`. This holds for every numeric type,
 * including longs beyond 2^53 (cast to double stays monotone even where
 * it loses precision). Degenerate intervals (`hi < lo`) match nothing
 * and are dropped before the explode so an inverted pair can't generate
 * a descending bin sequence.
 *
 * Fires only on: INNER joins whose condition contains a lower and an
 * upper bound on the SAME point-side expression against the other side,
 * with NO cross-side equality conjunct (if one exists Catalyst already
 * hash-joins on it, and the guard doubles as the idempotency check — the
 * rewritten join has a bin equality, so the rule never re-fires inside
 * the fixed-point batch). Deterministic expressions only.
 *
 * Session knobs: `spark.graft.rangeJoin.enabled` (default true) and
 * `spark.graft.rangeJoin.binWidth` (default 64; trade interval
 * replication `avgWidth/g` against per-bin candidate fan-in — set near
 * the median interval width).
 */
case class RangeJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  private val BinCol = "__graft_range_bin"

  private def numeric(e: Expression): Boolean = e.dataType match {
    case _: NumericType => true
    case _ => false
  }

  /** (pointExpr, boundExpr, isLower): a conjunct normalized so the bound
   * sits on `boundSide` and the point expression on the opposite side. */
  private def asBound(c: Expression, pointSide: AttributeSet,
                      boundSide: AttributeSet): Option[(Expression, Expression, Boolean)] = {
    def split(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (a.references.nonEmpty && a.references.subsetOf(pointSide) &&
          b.references.nonEmpty && b.references.subsetOf(boundSide) &&
          a.deterministic && b.deterministic && numeric(a) && numeric(b)) Some((a, b))
      else None
    c match {
      case GreaterThanOrEqual(a, b) => split(a, b).map { case (p, e) => (p, e, true) }
        .orElse(split(b, a).map { case (p, e) => (p, e, false) })
      case GreaterThan(a, b) => split(a, b).map { case (p, e) => (p, e, true) }
        .orElse(split(b, a).map { case (p, e) => (p, e, false) })
      case LessThanOrEqual(a, b) => split(a, b).map { case (p, e) => (p, e, false) }
        .orElse(split(b, a).map { case (p, e) => (p, e, true) })
      case LessThan(a, b) => split(a, b).map { case (p, e) => (p, e, false) }
        .orElse(split(b, a).map { case (p, e) => (p, e, true) })
      case _ => None
    }
  }

  private def crossEquality(c: Expression, l: AttributeSet, r: AttributeSet): Boolean = c match {
    case EqualTo(a, b) => spans(a, b, l, r)
    case EqualNullSafe(a, b) => spans(a, b, l, r)
    case _ => false
  }
  private def spans(a: Expression, b: Expression, l: AttributeSet, r: AttributeSet): Boolean =
    (a.references.subsetOf(l) && a.references.nonEmpty && b.references.subsetOf(r) && b.references.nonEmpty) ||
    (a.references.subsetOf(r) && a.references.nonEmpty && b.references.subsetOf(l) && b.references.nonEmpty)

  private def binOf(e: Expression, g: Double): Expression =
    Floor(new Divide(Cast(e, DoubleType), Literal(g)))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get("spark.graft.rangeJoin.enabled", "true").toBoolean) return plan
    val g = session.conf.get("spark.graft.rangeJoin.binWidth", "64").toDouble
    require(g > 0, s"spark.graft.rangeJoin.binWidth must be positive, got $g")

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !cond.exists(!_.deterministic) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val ls = left.outputSet
        val rs = right.outputSet
        if (conjuncts.exists(crossEquality(_, ls, rs))) j
        else {
          // try (point=left, bounds=right) then the mirror
          rewrite(j, left, right, conjuncts, ls, rs, g, pointIsLeft = true)
            .orElse(rewrite(j, left, right, conjuncts, ls, rs, g, pointIsLeft = false))
            .getOrElse(j)
        }
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
    case other => Seq(other)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      conjuncts: Seq[Expression], ls: AttributeSet, rs: AttributeSet,
                      g: Double, pointIsLeft: Boolean): Option[LogicalPlan] = {
    val (pSide, iSide) = if (pointIsLeft) (ls, rs) else (rs, ls)
    val bounds = conjuncts.flatMap(asBound(_, pSide, iSide))
    val lowers = bounds.filter(_._3)
    val uppers = bounds.filterNot(_._3)
    val pair = (for {
      (pv, lo, _) <- lowers
      (pv2, hi, _) <- uppers
      if pv.semanticEquals(pv2)
    } yield (pv, lo, hi)).headOption
    pair.map { case (pv, lo, hi) =>
      val (pointPlan, intervalPlan) = if (pointIsLeft) (left, right) else (right, left)

      val pBin = Alias(binOf(pv, g), BinCol + "_p")()
      val pointProj = Project(pointPlan.output :+ pBin, pointPlan)

      val kept = Filter(GreaterThanOrEqual(hi, lo), intervalPlan)
      // Sequence is TimeZoneAwareExpression: without an explicit zone the
      // constructed node is unresolved and the optimizer rejects the plan
      val seqExpr = Sequence(binOf(lo, g), binOf(hi, g), None,
        Some(session.sessionState.conf.sessionLocalTimeZone))
      val iBin = AttributeReference(BinCol + "_i", LongType, nullable = false)()
      val gen = Generate(Explode(seqExpr), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(iBin), child = kept)

      val newCond = And(EqualTo(pBin.toAttribute, iBin), j.condition.get)
      val (nl, nr) = if (pointIsLeft) (pointProj, gen) else (gen, pointProj)
      val joined = Join(nl, nr, Inner, Some(newCond), j.hint)
      Project(j.output, joined)
    }
  }
}
