package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/**
 * Codegen'd rolling polynomial string hash:
 * fold h = (h * 31 + codepoint) % (2^31 - 1) over the characters, 0 for
 * empty/null-ish input — bit-identical to the interpreted
 * transform/sequence/ascii/aggregate fold it replaces (Dedup.strHash) and
 * to the DuckDB oracle's list_reduce, but a primitive loop inside
 * whole-stage codegen (the HOF form is CodegenFallback and dominated the
 * sf0.1 dedup/minhash bench).
 *
 * Characters are UTF-16 units, equal to code points on the BMP; equal to
 * ascii(substr(s, i, 1)) for the ASCII data this engine hashes (the
 * fixture corpus is ASCII; divergence on astral-plane input is accepted
 * and documented).
 */
case class PolyHash31(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"poly_hash31 needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PolyHash31.hash(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash31.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash31 =
    copy(child = newChild)
}

object PolyHash31 {
  val Mod = 2147483647L

  /** The shared fold; called from both interpreted eval and generated code. */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      acc = (acc * 31 + s.charAt(i)) % Mod
      i += 1
    }
    acc
  }

  def apply(c: Column): Column = ColumnBridge.toColumn(PolyHash31(ColumnBridge.toExpr(c)))
}
