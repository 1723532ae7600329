package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Codegen'd sequential dot product of two numeric arrays
 * (float or double elements), accumulating in strict index order in
 * doubles — bit-identical to the SQL oracle's list_reduce fold and to
 * `aggregate(zip_with(...))`, but compiled to a primitive loop inside
 * whole-stage codegen instead of Catalyst's interpreted
 * higher-order-function path (HOFs are CodegenFallback: per-row
 * interpretation made the sf0.1 cosine queries ~50x slower than this).
 *
 * Null if either side is null; iterates min(len(a), len(b)) elements;
 * null elements contribute 0.0 (matches zip_with + cast semantics on
 * non-null data).
 */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs array<float>/array<double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = math.min(arrA.numElements(), arrB.numElements())
    val fA = elemIsFloat(left)
    val fB = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (fA) arrA.getFloat(i).toDouble else arrA.getDouble(i)
      val y = if (fB) arrB.getFloat(i).toDouble else arrB.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getB = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getA($i)) * ((double) $b.$getB($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column API: dot(a, b) in strict element order, doubles. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.toColumn(VecDot(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))
}
