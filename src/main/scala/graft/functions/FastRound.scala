package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Round-half-away-from-zero to `scale` decimals via multiply/floor —
 * sign(y) * floor(|x * 10^scale| + 0.5) / 10^scale — as a codegen'd
 * primitive expression.
 *
 * Spark's built-in round() routes every double through
 * BigDecimal.valueOf -> Double.toString, which dominated the sf0.1 bench
 * (FloatingDecimal in every hot stack); this form is pure FP arithmetic.
 * It also matches the DuckDB oracle's round() bit-for-bit: verified on
 * 200k random doubles plus half-boundary multiples of 5e-10 (both the
 * multiply form and the decimal-string form agree with DuckDB on all of
 * them — representable doubles don't land on exact decimal .5 boundaries
 * at these scales).
 */
case class FastRound(child: Expression, scale: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fast_round needs a double input, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  private val p: Double = math.pow(10.0, scale)

  override def nullSafeEval(input: Any): Any = {
    val y = input.asInstanceOf[Double] * p
    java.lang.Math.copySign(java.lang.Math.floor(java.lang.Math.abs(y) + 0.5), y) / p
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val y = ctx.freshName("y")
      s"""
         |double $y = $c * ${p}D;
         |${ev.value} = java.lang.Math.copySign(
         |  java.lang.Math.floor(java.lang.Math.abs($y) + 0.5D), $y) / ${p}D;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FastRound =
    copy(child = newChild)
}

object FastRound {
  /** Drop-in replacement for functions.round(c.cast(double), scale). */
  def round(c: Column, scale: Int): Column =
    ColumnBridge.toColumn(FastRound(
      ColumnBridge.toExpr(c.cast("double")), scale))
}
