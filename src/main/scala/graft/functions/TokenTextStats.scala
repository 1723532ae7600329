package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/**
 * Fused single-pass token statistics — the codegen'd replacement for the
 * higher-order-function stack in [[graft.text.TextAnalysis]] (Catalyst's
 * ArrayFilter/ArrayTransform/ArrayAggregate are CodegenFallback: each row
 * walked an interpreted expression tree per token, several times over,
 * keeping the whole text-analysis projection out of whole-stage codegen).
 *
 * Returns array<long> of length 4 + #markerLists:
 *
 *   [0] non-whitespace CODEPOINTS of the raw text
 *       == sum over tokens of length(token)  (meanTokenLen numerator)
 *   [1] maximal non-whitespace runs of the raw text
 *       == size(filter(split(text, "\\s+"), len > 0))  (token count)
 *   [2] tokens of lower(text) that are in `stopwords`
 *   [3] sum over maximal [a-z] runs of lower(text) of ceil(len / 4)
 *       (the BPE-estimate alpha-piece count)
 *   [4+i] tokens of lower(text) that are in markerLists(i)
 *
 * Whitespace is Java-regex `\s` = { space, \t, \n, \x0B, \f, \r } — all
 * ASCII, so the scan is byte-level over the UTF8 encoding: multi-byte
 * codepoints can never split a token, and codepoints are counted by
 * skipping UTF-8 continuation bytes (0b10xxxxxx), exactly matching
 * `length()` = UTF8String.numChars on every input including astral-plane
 * text. Lowercasing is UTF8String.toLowerCase — the same implementation
 * the `lower()` function uses, so token membership is bit-identical to
 * the HOF form. Equality with the HOF stack is property-tested in
 * TrainSpec over unicode-rich generated strings.
 */
case class TokenTextStats(child: Expression, stopwords: Seq[String],
                          markerLists: Seq[Seq[String]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_text_stats needs a string input, got ${child.dataType.catalogString}")

  /** Marker/stopword byte images, built once per expression instance (all
   * lists are ASCII; non-ASCII members would simply never match a token
   * byte-for-byte, same as string equality). */
  @transient private lazy val wordSets: Array[java.util.HashSet[UTF8String]] = {
    (stopwords +: markerLists).map { ws =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray
  }

  def compute(s: UTF8String): GenericArrayData = {
    val nSets = wordSets.length
    val raw = s.getBytes
    var nonspace = 0L
    var runs = 0L
    var inRun = false
    var i = 0
    while (i < raw.length) {
      val b = raw(i)
      if (TokenTextStats.isWs(b)) inRun = false
      else {
        if (!inRun) { runs += 1; inRun = true }
        if ((b & 0xC0) != 0x80) nonspace += 1
        ()
      }
      i += 1
    }
    val lower = s.toLowerCase.getBytes
    val hits = new Array[Long](nSets)
    var bpe = 0L
    var tokStart = -1
    var alphaStart = -1
    def closeAlpha(end: Int): Unit =
      if (alphaStart >= 0) { bpe += (end - alphaStart + 3) / 4; alphaStart = -1 }
    def closeTok(end: Int): Unit = {
      if (tokStart >= 0) {
        val tok = UTF8String.fromBytes(lower, tokStart, end - tokStart)
        var k = 0
        while (k < nSets) {
          if (wordSets(k).contains(tok)) hits(k) += 1
          k += 1
        }
        tokStart = -1
      }
    }
    i = 0
    while (i < lower.length) {
      val b = lower(i)
      if (TokenTextStats.isWs(b)) closeTok(i)
      else if (tokStart < 0) tokStart = i
      if (b >= 'a' && b <= 'z') { if (alphaStart < 0) alphaStart = i }
      else closeAlpha(i)
      i += 1
    }
    closeTok(lower.length)
    closeAlpha(lower.length)
    val res = new Array[Long](4 + nSets - 1)
    res(0) = nonspace
    res(1) = runs
    res(2) = hits(0) // stopwords
    res(3) = bpe
    var k = 1
    while (k < nSets) { res(3 + k) = hits(k); k += 1 }
    new GenericArrayData(res)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenTextStats", this,
      classOf[TokenTextStats].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenTextStats =
    copy(child = newChild)
}

object TokenTextStats {
  private[functions] def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def apply(c: Column, stopwords: Seq[String], markerLists: Seq[Seq[String]]): Column =
    ColumnBridge.toColumn(TokenTextStats(ColumnBridge.toExpr(c), stopwords, markerLists))
}
