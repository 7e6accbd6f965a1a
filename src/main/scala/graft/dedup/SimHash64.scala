package graft.dedup

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 64-bit SimHash over an array<struct<h: bigint, cnt: bigint>>
  * of (token hash, frequency): per bit, sign of Σ cnt·(±1 by bit of h);
  * bits assembled MSB-first for bit 0 (same order as the composable
  * aggregate(sequence(0,63), ...) form it replaces — that form walks
  * the token array 64 times through HOF machinery; this is one n×64
  * tight loop in whole-stage codegen).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val tf = input.asInstanceOf[ArrayData]
    val n = tf.numElements()
    val counts = new Array[Long](64)
    var i = 0
    while (i < n) {
      val row = tf.getStruct(i, 2)
      val h = row.getLong(0); val cnt = row.getLong(1)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += cnt else counts(b) -= cnt
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) { acc = (acc << 1) | (if (counts(b) >= 0) 1L else 0L); b += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tf => {
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val row = ctx.freshName("row"); val h = ctx.freshName("h")
      val cnt = ctx.freshName("cnt"); val acc = ctx.freshName("acc")
      s"""
         |int $n = $tf.numElements();
         |long[] $counts = new long[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  InternalRow $row = $tf.getStruct($i, 2);
         |  long $h = $row.getLong(0); long $cnt = $row.getLong(1);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $counts[$b] += $cnt; else $counts[$b] -= $cnt;
         |  }
         |}
         |long $acc = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  $acc = ($acc << 1) | ($counts[$b] >= 0 ? 1L : 0L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
