package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/**
 * Codegen'd ROLLING window hash: the 64-bit digests of every sliding
 * `L`-char window of a string, in position order — one O(n) pass instead
 * of the O(n·L) `transform(sequence(...), i -> xxhash64(substr(s, i+1, L)))`
 * explode (which also runs interpreted: higher-order functions are
 * CodegenFallback), and no window substring is ever allocated.
 *
 * The digest is a polynomial hash over UTF-16 units in the ring mod 2^64
 * (natural Long wraparound; base [[WindowHashes64.Base]], odd, so
 * multiplication is a bijection): h_i = Σ c_{i+j}·B^(L−1−j). The roll is
 * h_{i+1} = (h_i − c_i·B^(L−1))·B + c_{i+L} — exact ring arithmetic, so
 * the rolled value is bit-identical to the direct fold at every position.
 * Equal windows therefore always collide (no false negatives ever); a
 * 64-bit digest is NOT equality, so every consumer (ExactSubstr, the
 * streaming gate index) verifies digest-matched candidates against the
 * re-sliced true substring — a collision costs a candidate row, never a
 * wrong result, exactly as with the xxhash64 form this replaces.
 *
 * Strings shorter than L produce an empty array; null propagates.
 */
case class WindowHashes64(child: Expression, windowLen: Int)
    extends UnaryExpression {

  require(windowLen >= 1, s"window_hashes64: window length $windowLen < 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"window_hashes64 needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WindowHashes64.hashes(input.asInstanceOf[UTF8String], windowLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WindowHashes64.hashes($c, $windowLen)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes64 =
    copy(child = newChild)
}

object WindowHashes64 {
  /** Odd base: multiplication by it is a bijection mod 2^64, so no window
   * length loses entropy to even-factor collapse. */
  val Base = 1000003L

  /** The shared kernel; called from interpreted eval and generated code.
   * One O(n) pass, primitive long array out (no boxing, no strings).
   *
   * Positions/lengths are CODE POINTS, not UTF-16 units: every consumer
   * indexes back into the document with Spark `substr`/`length` (and the
   * DuckDB oracle with `substr`/`length`), all of which count code
   * points. Hashing UTF-16 units would misalign every position after the
   * first supplementary-plane char (emoji), silently missing true
   * duplicates and cutting spans at wrong offsets. Surrogate-free
   * strings (the overwhelming common case) take a charAt fast path whose
   * output is bit-identical to the code-point walk, since a BMP code
   * point IS its UTF-16 unit. */
  def hashes(s: UTF8String, l: Int): ArrayData = {
    val str = s.toString
    val nu = str.length // UTF-16 units
    val n = str.codePointCount(0, nu) // code points — Spark length() semantics
    if (n < l) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](n - l + 1)
    // B^(L-1) mod 2^64 for the roll-out term
    var top = 1L
    var k = 1
    while (k < l) { top *= Base; k += 1 }
    var h = 0L
    var i = 0
    if (n == nu) {
      // no surrogate pairs: UTF-16 units are code points
      while (i < l) { h = h * Base + str.charAt(i); i += 1 }
      out(0) = h
      while (i < n) {
        h = (h - str.charAt(i - l) * top) * Base + str.charAt(i)
        out(i - l + 1) = h
        i += 1
      }
    } else {
      val cps = new Array[Int](n)
      var ci = 0
      var ui = 0
      while (ui < nu) {
        val cp = str.codePointAt(ui)
        cps(ci) = cp
        ci += 1
        ui += Character.charCount(cp)
      }
      while (i < l) { h = h * Base + cps(i); i += 1 }
      out(0) = h
      while (i < n) {
        h = (h - cps(i - l) * top) * Base + cps(i)
        out(i - l + 1) = h
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(c: Column, windowLen: Int): Column =
    ColumnBridge.toColumn(WindowHashes64(ColumnBridge.toExpr(c), windowLen))
}
