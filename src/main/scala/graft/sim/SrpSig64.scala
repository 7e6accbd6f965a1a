package graft.sim

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** 64-bit sign-random-projection (SRP / random-hyperplane LSH,
  * Charikar 2002) signature over an array<float|double> embedding:
  * bit b = sign(Σ_j ±v[j]), with the ±1 Rademacher hyperplane entries
  * taken from the bits of a murmur-finalized hash of the DIMENSION
  * index — one hash per dimension supplies all 64 hyperplanes'
  * components (the same bits-of-one-hash trick [[graft.dedup.SimHash64]]
  * uses for token hashes), so the loop is one n×64 pass in whole-stage
  * codegen with no hyperplane table to broadcast. P[bit differs] =
  * angle/π, so hamming distance estimates the angle between vectors.
  * Bits assemble MSB-first for bit 0, matching SimHash64.
  */
case class SrpSig64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "srp_sig64"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_sig64 needs array<float|double>, got $t")
    }

  /** murmur3 fmix64 — deterministic, engine-free integer mix. */
  private def fmix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val sums = new Array[Double](64)
    val fl = isFloat
    var j = 0
    while (j < n) {
      // null element contributes 0 — matches what the codegen path
      // reads from an UnsafeArrayData null slot, so interpreted and
      // codegen evaluation agree instead of NPE-ing on the generic
      // fallback (corpus embeddings never carry null elements)
      val x =
        if (v.isNullAt(j)) 0.0
        else if (fl) v.getFloat(j).toDouble else v.getDouble(j)
      // j + 1, never j: fmix64(0) == 0, which would give dimension 0
      // an ALL-ZERO hyperplane row — every one of the 64 sums sharing
      // a perfectly correlated -v[0] component instead of independent
      // Rademacher signs, breaking the P[bit differs] = θ/π contract
      val h = fmix64(j.toLong + 1L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += x else sums(b) -= x
        b += 1
      }
      j += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) { acc = (acc << 1) | (if (sums(b) >= 0) 1L else 0L); b += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val sums = ctx.freshName("sums")
      val j = ctx.freshName("j"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val x = ctx.freshName("x")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $v.numElements();
         |double[] $sums = new double[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  double $x = $v.isNullAt($j) ? 0.0 : (double)$v.$get($j);
         |  long $h = (long)$j + 1L; // fmix64(0) == 0 — see nullSafeEval

         |  $h ^= $h >>> 33; $h *= 0xff51afd7ed558ccdL;
         |  $h ^= $h >>> 33; $h *= 0xc4ceb9fe1a85ec53L;
         |  $h ^= $h >>> 33;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $sums[$b] += $x; else $sums[$b] -= $x;
         |  }
         |}
         |long $acc = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  $acc = ($acc << 1) | ($sums[$b] >= 0 ? 1L : 0L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpSig64 =
    copy(child = newChild)
}
