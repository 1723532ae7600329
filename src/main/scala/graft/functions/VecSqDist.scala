package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Codegen'd squared L2 distance of two numeric arrays: the strict
 * index-order fold of (a[i]-b[i])*(a[i]-b[i]) in doubles — bit-identical
 * to `VecDot(zip_with(a, b, _-_), same)` (the shape [[graft.similarity
 * .KMeans.sqDist]] originally composed) and to the oracle's list_reduce,
 * but one primitive loop inside whole-stage codegen instead of routing
 * the element-wise difference through Catalyst's interpreted zip_with
 * (HOFs are CodegenFallback — the same 50x cliff [[VecDot]] exists to
 * avoid, paid once per (vector, centroid) pair in every k-means assign).
 *
 * Null if either side is null; iterates min(len(a), len(b)) elements.
 */
case class VecSqDist(left: Expression, right: Expression)
  extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sqdist needs array<float>/array<double> inputs, got " +
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
      val d = x - y
      acc += d * d
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
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ((double) $a.$getA($i)) - ((double) $b.$getB($i));
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSqDist =
    copy(left = newLeft, right = newRight)
}

object VecSqDist {
  /** Column API: squared L2 distance in strict element order, doubles. */
  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.toColumn(VecSqDist(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))
}
