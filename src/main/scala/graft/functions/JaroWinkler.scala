package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/**
 * The textbook Jaro-Winkler string comparator (Winkler 1990) — the ER
 * matcher of record for person/organization names, complementing the
 * normalized-Levenshtein matching stage. Spark has `levenshtein` but no
 * Jaro-Winkler; this is the standard definition, bit-compatible with
 * DuckDB's `jaro_winkler_similarity` (which the oracle uses):
 *
 *  - match window floor(max(|a|,|b|)/2) - 1, clamped at 0;
 *  - transpositions = half the positions where the two matched-char
 *    sequences disagree (matched chars are equal by construction, so
 *    the disagreement count is always even — the halving is exact);
 *  - jaro = (m/|a| + m/|b| + (m-t)/m) / 3; either side empty -> 0.0
 *    (including both empty, matching DuckDB);
 *  - Winkler boost only above jaro 0.7: + min(prefix, 4) * 0.1 * (1-jaro).
 *
 * Comparison is over UTF-16 code units (Java chars); ASCII-safe, which
 * is what ER name fields are. Codegen emits one static call — the whole
 * comparator stays inside whole-stage codegen, no interpretation.
 */
object JaroWinklerImpl {

  private def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val bMatched = new Array[Boolean](lb)
    val aMatched = new Array[Boolean](la)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          bMatched(j) = true; aMatched(i) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    val bSeq = new Array[Char](m)
    var k = 0
    var j = 0
    while (j < lb) {
      if (bMatched(j)) { bSeq(k) = b.charAt(j); k += 1 }
      j += 1
    }
    var mismatch = 0
    k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        if (a.charAt(i) != bSeq(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val t = mismatch / 2
    (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
  }

  /** Static entry the generated code calls. */
  def compute(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j > 0.7) {
      val n = math.min(math.min(a.length, b.length), 4)
      var p = 0
      while (p < n && a.charAt(p) == b.charAt(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }
}

case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs string inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.compute(a.toString, b.toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.compute($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column API: Jaro-Winkler similarity in [0, 1]. */
  def jw(a: Column, b: Column): Column =
    ColumnBridge.toColumn(JaroWinkler(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))
}
