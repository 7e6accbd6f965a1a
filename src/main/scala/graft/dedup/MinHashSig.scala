package graft.dedup

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: given the array of 31-bit shingle base
  * hashes, compute `perms` permutation minima
  * h_p(x) = (x * (2p+1) + p * 2654435761) mod (2^31 - 1).
  *
  * The composable form — transform(sequence(0,127), p ->
  * array_min(transform(hs, ...))) — materializes a fresh 300-element
  * array per permutation per row (perms × rows allocations); this is
  * one allocation-free double loop inside whole-stage codegen, ~40×
  * faster at bench scale. Same arithmetic, same signatures.
  */
case class MinHashSig(child: Expression, perms: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val res = new Array[Long](perms)
    var p = 0
    while (p < perms) {
      var m = Long.MaxValue
      val a = 2L * p + 1
      val b = p * 2654435761L
      var i = 0
      while (i < n) {
        val v = (hs.getLong(i) * a + b) % 2147483647L
        if (v < m) m = v
        i += 1
      }
      res(p) = m
      p += 1
    }
    new GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val res = ctx.freshName("res")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val m = ctx.freshName("m"); val v = ctx.freshName("v")
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      s"""
         |int $n = $hs.numElements();
         |long[] $res = new long[$perms];
         |for (int $p = 0; $p < $perms; $p++) {
         |  long $m = Long.MAX_VALUE;
         |  long $a = 2L * $p + 1; long $b = $p * 2654435761L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = ($hs.getLong($i) * $a + $b) % 2147483647L;
         |    if ($v < $m) $m = $v;
         |  }
         |  $res[$p] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
