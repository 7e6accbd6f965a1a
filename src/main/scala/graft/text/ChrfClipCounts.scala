package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native clipped CHARACTER n-gram match counts for chrF (Popović
  * 2015): given candidate and reference strings, returns
  * `array<struct<m: bigint, t: bigint, tr: bigint>>` of length `maxN`
  * over the whitespace-stripped (' ' only, mirroring the oracle's
  * `[^ ]` extraction) character sequences — `m` the multiset-clipped
  * match count, `t`/`tr` the candidate/reference totals
  * max(len − n + 1, 0).
  *
  * The word-gram sibling [[BleuClipCounts]] builds one string + one
  * hash-map entry per gram, which is fine at word volume but at CHAR
  * volume (6 orders × every character position × both sides) made
  * eval_chrf the most expensive query in the suite (8.6 s at sf0.1).
  * This pass allocates NOTHING per gram: layer-n gram keys come from
  * the layer-(n−1) keys by one rolling multiply-xor per position
  * (FNV-64 style), and the clipped count is a two-pointer merge over
  * two sorted primitive long[] — O(maxN · L log L) per pair, all
  * primitive. Measured 8.6 → well under 1 s at sf0.1.
  *
  * Gram identity is the 64-bit rolling hash, NOT the substring: two
  * different grams of one pair colliding would miscount by one — odds
  * ~L²/2⁶⁵ per pair — and the DuckDB oracle re-derives every count
  * from the raw characters, so a collision on a verified corpus FAILS
  * the gate loudly rather than passing silently (the eval_distinct_n
  * xxhash64 posture). Characters are UTF-16 units (identical to the
  * oracle's code-point characters on BMP text; the corpora are
  * ASCII). Either input NULL → NULL (BinaryExpression contract).
  */
case class ChrfClipCounts(left: Expression, right: Expression, maxN: Int = 6)
    extends BinaryExpression with CodegenFallback {

  require(maxN >= 1 && maxN <= 16, s"maxN ($maxN) out of the sane 1..16 range")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("m", LongType, nullable = false),
      StructField("t", LongType, nullable = false),
      StructField("tr", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "chrf_clip_counts"
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"chrf_clip_counts needs string inputs, got ${left.dataType}, ${right.dataType}")
  }

  private final val Offset = 0xcbf29ce484222325L
  private final val Prime = 0x100000001b3L

  private def stripped(s: Any): Array[Char] = {
    val str = s.asInstanceOf[UTF8String].toString
    val out = new Array[Char](str.length)
    var i = 0; var k = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c != ' ') { out(k) = c; k += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, k)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val cc = stripped(a)
    val rc = stripped(b)
    val cn = cc.length
    val rn = rc.length
    // layer-n rolling keys, updated in place from layer n-1; scratch
    // buffers hold the sorted copy so the layers stay intact
    val ch = new Array[Long](cn)
    val rh = new Array[Long](rn)
    val cs = new Array[Long](cn)
    val rs = new Array[Long](rn)
    var i = 0
    while (i < cn) { ch(i) = (Offset * Prime) ^ cc(i).toLong; i += 1 }
    i = 0
    while (i < rn) { rh(i) = (Offset * Prime) ^ rc(i).toLong; i += 1 }
    val rows = new Array[Any](maxN)
    var n = 1
    while (n <= maxN) {
      if (n > 1) {
        var j = 0
        while (j + n <= cn) { ch(j) = ch(j) * Prime ^ cc(j + n - 1).toLong; j += 1 }
        j = 0
        while (j + n <= rn) { rh(j) = rh(j) * Prime ^ rc(j + n - 1).toLong; j += 1 }
      }
      val lc = math.max(cn - n + 1, 0)
      val lr = math.max(rn - n + 1, 0)
      var m = 0L
      if (lc > 0 && lr > 0) {
        System.arraycopy(ch, 0, cs, 0, lc)
        System.arraycopy(rh, 0, rs, 0, lr)
        java.util.Arrays.sort(cs, 0, lc)
        java.util.Arrays.sort(rs, 0, lr)
        var x = 0; var y = 0
        while (x < lc && y < lr) {
          if (cs(x) < rs(y)) x += 1
          else if (cs(x) > rs(y)) y += 1
          else {
            val v = cs(x); var ca = 0; var cb = 0
            while (x < lc && cs(x) == v) { ca += 1; x += 1 }
            while (y < lr && rs(y) == v) { cb += 1; y += 1 }
            m += math.min(ca, cb).toLong
          }
        }
      }
      rows(n - 1) = InternalRow(m, lc.toLong, lr.toLong)
      n += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChrfClipCounts =
    copy(left = newLeft, right = newRight)
}
