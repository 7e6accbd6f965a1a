package graft.text

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Levenshtein distance over the UTF-16 char sequences of two
  * strings — Myers' bit-parallel algorithm (Myers 1999, "A fast
  * bit-vector algorithm for approximate string matching based on
  * dynamic programming", JACM 46(3); blocked form per Hyyrö 2003) over
  * primitive longs, with common prefix/suffix trimming.
  *
  * History: Spark's built-in `levenshtein` walks UTF-8 BYTES with
  * per-access decoding (~32 ns/cell — the suite's most expensive
  * query); r6 replaced it with a two-row int[] DP (~1 ns/cell); this
  * round replaces the DP with Myers' bit-vector form, which processes
  * 64 DP cells per word-op — O(⌈m/64⌉·n) instead of O(m·n), measured
  * ~8× less core time on the ~300×300-char eval pairs. The value is
  * the unique Levenshtein metric, bit-identical to the DP it replaces
  * (property-spec'd against the reference DP over random strings,
  * and the DuckDB oracle recomputes it natively, so any divergence
  * fails the gate). UTF-16 units equal code points on BMP text (the
  * corpora are ASCII); supplementary-plane text counts surrogate
  * pairs as two units where DuckDB counts one — the same documented
  * BMP contract as [[ChrfClipCounts]]. Either input NULL → NULL.
  *
  * Codegen: a static call into [[EditDistance.compute]] — unlike the
  * former CodegenFallback this keeps the surrounding projection inside
  * whole-stage codegen (no InterpretedUnsafeProjection row-boxing on
  * the eval_* stage).
  */
case class EditDistance(left: Expression, right: Expression)
    extends BinaryExpression {

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

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistance.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.text.EditDistance.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditDistance =
    copy(left = newLeft, right = newRight)
}

object EditDistance {

  /** Exact Levenshtein distance between the UTF-16 sequences of `a`
    * and `b`. Called from both the interpreted eval and the generated
    * code, so the two paths cannot drift. */
  def compute(a: UTF8String, b: UTF8String): Long = {
    val s0 = a.toString
    val t0 = b.toString
    // trim common prefix and suffix — exact for Levenshtein (matched
    // ends cost 0 and no cheaper alignment crosses them); on
    // near-identical eval pairs this removes most of the band
    val ls = s0.length; val lt = t0.length
    val minL = math.min(ls, lt)
    var pre = 0
    while (pre < minL && s0.charAt(pre) == t0.charAt(pre)) pre += 1
    var endS = ls; var endT = lt
    while (endS > pre && endT > pre && s0.charAt(endS - 1) == t0.charAt(endT - 1)) {
      endS -= 1; endT -= 1
    }
    val sLen = endS - pre
    val tLen = endT - pre
    if (sLen == 0) return tLen.toLong
    if (tLen == 0) return sLen.toLong
    // pattern = the SHORTER remainder (distance is symmetric): fewer
    // 64-cell words per text char
    if (sLen <= tLen) myers(s0, pre, sLen, t0, pre, tLen)
    else myers(t0, pre, tLen, s0, pre, sLen)
  }

  /** Blocked Myers bit-vector DP: pattern p[pOff, pOff+m), text
    * t[tOff, tOff+n), m ≤ n. Each of the ⌈m/64⌉ blocks holds 64 DP
    * column cells as +1/−1 deltas (Pv/Mv); one text char costs ~17
    * word-ops per block. Single-block inputs (m ≤ 64) take the
    * carry-free fast path. */
  private def myers(p: CharSequence, pOff: Int, m: Int,
                    t: CharSequence, tOff: Int, n: Int): Long = {
    val words = (m + 63) >>> 6
    // Peq[c]: bitmask per block of pattern positions holding char c.
    // ASCII direct-indexed (the corpora), non-ASCII via a small open
    // hash keyed by char (linear probe; capacity ≥ 2m so load < 0.5).
    val asciiPeq = new Array[Long](128 * words)
    var nonAsciiKeys: Array[Char] = null
    var nonAsciiVals: Array[Long] = null
    var hashMask = 0
    var i = 0
    var hasNonAscii = false
    while (i < m) { if (p.charAt(pOff + i) >= 128) hasNonAscii = true; i += 1 }
    if (hasNonAscii) {
      var cap = 4
      while (cap < 2 * m) cap <<= 1
      nonAsciiKeys = new Array[Char](cap)     // 0 = empty slot (char 0 is ASCII)
      nonAsciiVals = new Array[Long](cap * words)
      hashMask = cap - 1
    }
    i = 0
    while (i < m) {
      val c = p.charAt(pOff + i)
      val bit = 1L << (i & 63)
      val w = i >>> 6
      if (c < 128) asciiPeq(c * words + w) |= bit
      else {
        var slot = (c * 0x9E3779B1) >>> 16 & hashMask
        while (nonAsciiKeys(slot) != 0 && nonAsciiKeys(slot) != c)
          slot = (slot + 1) & hashMask
        nonAsciiKeys(slot) = c
        nonAsciiVals(slot * words + w) |= bit
      }
      i += 1
    }
    @inline def peqAt(c: Char, w: Int): Long =
      if (c < 128) asciiPeq(c * words + w)
      else if (nonAsciiKeys == null) 0L
      else {
        var slot = (c * 0x9E3779B1) >>> 16 & hashMask
        while (nonAsciiKeys(slot) != 0 && nonAsciiKeys(slot) != c)
          slot = (slot + 1) & hashMask
        if (nonAsciiKeys(slot) == c) nonAsciiVals(slot * words + w) else 0L
      }

    var score = m.toLong
    if (words == 1) {
      // single-block fast path (m ≤ 64): the textbook Myers loop
      val highBit = 1L << (m - 1)
      var pv = -1L
      var mv = 0L
      var j = 0
      while (j < n) {
        val eq = peqAt(t.charAt(tOff + j), 0)
        val xv = eq | mv
        val xh = (((eq & pv) + pv) ^ pv) | eq
        var ph = mv | ~(xh | pv)
        var mh = pv & xh
        if ((ph & highBit) != 0) score += 1
        if ((mh & highBit) != 0) score -= 1
        ph = (ph << 1) | 1L
        mh = mh << 1
        pv = mh | ~(xv | ph)
        mv = ph & xv
        j += 1
      }
      score
    } else {
      // blocked form (Hyyrö 2003): horizontal +1/−1 carries chain
      // through the blocks low → high; the score tracks the top cell
      // of the last (possibly partial) block
      val pvs = new Array[Long](words)
      val mvs = new Array[Long](words)
      var w = 0
      while (w < words) { pvs(w) = -1L; w += 1 }
      val lastHigh = 1L << ((m - 1) & 63)
      var j = 0
      while (j < n) {
        val c = t.charAt(tOff + j)
        var hin = 1 // DP row 0 is 0,1,2,... — entering carry is +1
        w = 0
        while (w < words) {
          var eq = peqAt(c, w)
          val pv = pvs(w)
          val mv = mvs(w)
          val xv = eq | mv
          if (hin < 0) eq |= 1L
          val xh = (((eq & pv) + pv) ^ pv) | eq
          var ph = mv | ~(xh | pv)
          var mh = pv & xh
          val hiP = ph < 0   // bit 63: horizontal carry out of the block
          val hiM = mh < 0
          if (w == words - 1) {
            // the score moves with the horizontal delta at DP row m-1,
            // i.e. bit (m-1) & 63 of the UNSHIFTED ph/mh of this block
            if ((ph & lastHigh) != 0) score += 1
            if ((mh & lastHigh) != 0) score -= 1
          }
          ph = ph << 1
          mh = mh << 1
          if (hin < 0) mh |= 1L
          else if (hin > 0) ph |= 1L
          pvs(w) = mh | ~(xv | ph)
          mvs(w) = ph & xv
          hin = if (hiP) 1 else if (hiM) -1 else 0
          w += 1
        }
        j += 1
      }
      score
    }
  }
}
