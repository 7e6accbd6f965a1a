package graft.filters

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst re-expression of HBase's FuzzyRowFilter
  * (hbase-client/.../filter/FuzzyRowFilter.java:58): fixed-position
  * wildcard match over the rowkey, where '?' matches any single
  * character and every other position must match exactly.
  *
  * Implemented with `doGenCode` so it participates in whole-stage
  * codegen (no UDF boundary in the scan's hot path).
  */
case class FuzzyMatch(child: Expression, pattern: String)
    extends UnaryExpression with Predicate {

  // analysis-time type check (the VecDot discipline): without it a
  // numeric rowkey passed analysis and died per-row — ClassCastException
  // interpreted, a janino compile error in codegen
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fuzzy_match needs a string rowkey, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "fuzzy_match"

  override def nullSafeEval(input: Any): Any =
    FuzzyMatch.matches(input.asInstanceOf[UTF8String], pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pat = ctx.addReferenceObj("fuzzyPattern", pattern, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.filters.FuzzyMatch.matches($c, $pat);")
  }

  override protected def withNewChildInternal(newChild: Expression): FuzzyMatch =
    copy(child = newChild)
}

object FuzzyMatch {
  /** '?' = any char; otherwise exact. Like the reference's
    * FuzzyRowFilter.satisfiesNoUnsafe (loops over
    * min(fuzzyKeyMeta.length, rowLength)), only the overlapping prefix
    * is compared — a row longer than the pattern matches if its first
    * pattern.length chars satisfy the mask; a shorter row matches if
    * every char it does have satisfies it. */
  def matches(s: String, pattern: String): Boolean = {
    val n = math.min(s.length, pattern.length)
    var i = 0
    while (i < n) {
      val p = pattern.charAt(i)
      if (p != '?' && p != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** UTF8String form — what both evaluation paths call: a pure-ASCII
    * input (byte count == char count, the rowkey norm) compares by
    * byte position with NO per-row String materialization — the
    * allocation the `$c.toString()` codegen used to pay per scanned
    * row, undercutting this expression's whole reason to exist.
    * Multi-byte input falls back to the decoded-chars form, so the
    * two paths are semantically one function. */
  def matches(s: UTF8String, pattern: String): Boolean = {
    val nb = s.numBytes()
    if (nb == s.numChars()) {
      val n = math.min(nb, pattern.length)
      var i = 0
      while (i < n) {
        val p = pattern.charAt(i)
        if (p != '?' && p.toInt != (s.getByte(i) & 0xff)) return false
        i += 1
      }
      true
    } else matches(s.toString, pattern)
  }
}
