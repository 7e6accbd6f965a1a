package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd leading-common-character count of two strings —
  * the per-cell primitive of the block-encoding cost models
  * (findCommonPrefixInFlatKey's character fold).
  *
  * Semantics: the number of leading CODE POINTS the two strings share
  * — exactly the
  * `transform(sequence(1, greatest(len(a), len(b))), i ->
  *   IF(substring(a, i, 1) = substring(b, i, 1), 1, 0))` /
  * first-zero-position fold both encoding operators used to inline
  * (equal strings → full length; a strict prefix → the shorter
  * length; substring past either end yields '' ≠ any char). UTF-8 is
  * canonical per code point, so per-character byte-slice equality IS
  * code-point equality — no decoding needed.
  *
  * TOTAL on null input: a null operand yields 0, not null — the fold
  * this replaces returned 0 on a ONE-SIDED null (substring(NULL, i,
  * 1) fails the IF, flag 0 at position 1), the retained DuckDB
  * oracle form still does, and a null-propagating version would
  * silently drop such cells from region byte sums while the oracle
  * counts them. (Both-null is out of contract: the fold propagates
  * NULL there, this stays 0 — no operator compares two nullable
  * keys.)
  *
  * Exists because the composable form materializes a flags ARRAY of
  * greatest(len) ints per row (twice per cell comparison: row key and
  * qualifier) and walks it with array_position — allocation plus two
  * passes where one fused byte loop suffices. At scan volume (every
  * cell of a 100 TB store prices its predecessor) the allocation is
  * the cost. Both evaluation paths call the SAME [[commonChars]]
  * loop, so interpreted/codegen parity holds by construction. */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "common_prefix_len"
  override def nullable: Boolean = false

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"common_prefix_len needs (string, string), got " +
          s"${left.dataType}, ${right.dataType}")

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) 0L
    else CommonPrefixLen.commonChars(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = left.genCode(ctx)
    val b = right.genCode(ctx)
    ev.copy(code = code"""
      ${a.code}
      ${b.code}
      long ${ev.value} = (${a.isNull} || ${b.isNull}) ? 0L :
        graft.core.CommonPrefixLen.commonChars(${a.value}, ${b.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLen =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLen {
  /** The Column form — the ONE place the graftbridge wrapping lives
    * (the encoding operators and specs all build the expression
    * through here; hand-built copies would drift if the bridging ever
    * gains casts or registration). */
  def commonPrefixLen(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CommonPrefixLen(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** One shared loop for both evaluation paths (also callable from
    * generated Java — keep it a plain static-shaped method). */
  def commonChars(a: UTF8String, b: UTF8String): Long = {
    val na = a.numBytes(); val nb = b.numBytes()
    var i = 0
    var count = 0L
    while (i < na && i < nb) {
      val w = UTF8String.numBytesForFirstByte(a.getByte(i))
      if (i + w > na || i + w > nb) return count
      var j = 0
      while (j < w) {
        if (a.getByte(i + j) != b.getByte(i + j)) return count
        j += 1
      }
      count += 1
      i += w
    }
    count
  }
}
