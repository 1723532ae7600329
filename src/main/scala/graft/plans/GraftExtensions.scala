package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{FastRound, JaroWinkler, PolyHash31, TopKLongs, VecDot}

/**
 * Library integration point: `spark.sql.extensions=graft.plans.GraftExtensions`
 * (or `SparkSession.builder.withExtensions(new GraftExtensions)`) gives a
 * plain-SQL user the engine's codegen'd expressions and its range-join
 * optimization without touching the Scala API:
 *
 *  - `graft_poly_hash31(str)` — the rolling polynomial hash every dedup /
 *    fingerprint operator keys on ([[graft.functions.PolyHash31]]);
 *  - `graft_vec_dot(arr, arr)` — primitive-loop float dot product
 *    ([[graft.functions.VecDot]]), the ANN/SemDeDup kernel;
 *  - `graft_fast_round(x, d)` — half-away-from-zero double rounding
 *    ([[graft.functions.FastRound]]; `d` must be a literal, it is baked
 *    into the generated code);
 *  - `graft_topk(x, k)` — mergeable bounded-heap top-k AGGREGATE
 *    ([[graft.functions.TopKLongs]]): O(groups×k) task state, never
 *    sorts the input;
 *  - [[RangeJoinRule]] — point-in-interval theta joins become binned
 *    equi-joins instead of BroadcastNestedLoopJoin;
 *  - [[AsOfJoinStrategy]] — the custom backward as-of join physical
 *    operator (see AsOfJoinPlan.scala).
 *
 * All three functions implement `doGenCode`, so SQL text using them stays
 * inside whole-stage codegen exactly like the DataFrame API path.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String): ExpressionInfo =
    // the 11-arg constructor is the only non-deprecated one carrying usage
    new ExpressionInfo(clazz.getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash31"),
      info(classOf[PolyHash31], "graft_poly_hash31",
        "graft_poly_hash31(str) - rolling (h*31 + codepoint) mod (2^31-1) string hash."),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_poly_hash31 takes exactly 1 argument")
        PolyHash31(children.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot"),
      info(classOf[VecDot], "graft_vec_dot",
        "graft_vec_dot(a, b) - dot product of two array<float> columns."),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_vec_dot takes exactly 2 arguments")
        VecDot(children.head, children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_fast_round"),
      info(classOf[FastRound], "graft_fast_round",
        "graft_fast_round(x, d) - round double x to d digits, half away from zero; d literal."),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_fast_round takes exactly 2 arguments")
        val scale = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_fast_round scale must be an integer literal, got $other")
        }
        FastRound(children.head, scale)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      info(classOf[JaroWinkler], "graft_jaro_winkler",
        "graft_jaro_winkler(a, b) - Jaro-Winkler similarity in [0, 1] (boost above 0.7, prefix cap 4)."),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_jaro_winkler takes exactly 2 arguments")
        JaroWinkler(children.head, children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      info(classOf[TopKLongs], "graft_topk",
        "graft_topk(x, k) - aggregate: the k largest long values of the group, " +
          "sorted descending (bounded mergeable min-heap, no sort of the input; " +
          "k must be a literal)."),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_topk takes exactly 2 arguments")
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk k must be an integer literal, got $other")
        }
        TopKLongs(children.head, k)
      }))

    ext.injectOptimizerRule(RangeJoinRule)
    // the custom as-of join physical operator (see AsOfJoinPlan.scala);
    // graft.operators.AsOf also registers it idempotently on first use
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
