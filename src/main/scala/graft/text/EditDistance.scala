package graft.text

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Levenshtein distance over the UTF-16 char sequences of two
  * strings — the classic two-row DP on primitive int[], no per-cell
  * object work.
  *
  * Exists because Spark's built-in `levenshtein` walks the UTF-8
  * BYTES with per-access character decoding — measured ~2.9 core-ms
  * per ~300×300-char pair (≈32 ns/cell), which made eval_edit_ratio
  * the suite's most expensive query on a DP that should cost tens of
  * microseconds. This pass converts each string ONCE to a char array
  * and runs the textbook DP: ~30× less core time, same value — the
  * distance is the unique Levenshtein metric, and the DuckDB oracle
  * recomputes it natively, so any divergence fails the gate. UTF-16
  * units equal code points on BMP text (the corpora are ASCII);
  * supplementary-plane text would count surrogate pairs as two units
  * where DuckDB counts one — the same documented BMP contract as
  * [[ChrfClipCounts]]. Either input NULL → NULL. */
case class EditDistance(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "edit_distance"
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"edit_distance needs string inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    val t = b.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return t.length.toLong
    if (t.isEmpty) return s.length.toLong
    var prev = new Array[Int](t.length + 1)
    var cur = new Array[Int](t.length + 1)
    var j = 0
    while (j <= t.length) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= s.length) {
      cur(0) = i
      val sc = s.charAt(i - 1)
      j = 1
      while (j <= t.length) {
        val sub = prev(j - 1) + (if (sc == t.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        cur(j) = math.min(math.min(del, ins), sub)
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(t.length).toLong
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditDistance =
    copy(left = newLeft, right = newRight)
}
