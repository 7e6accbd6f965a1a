package graft.sim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native argmax/top-n-over-codebook: for one embedding row, the `n`
  * best centroids of a broadcast codebook by cosine, returned as
  * `array<struct<s: double, cell: int>>` sorted (s desc, cell asc).
  *
  * This is the IVF/IMI cell-scoring hot loop — corpus × nCells × d
  * multiply-adds per assignment pass — which previously ran through a
  * higher-order `transform(cents, c -> struct(vec_dot(...) / ..., ...))`
  * projection. HOF lambdas evaluate INTERPRETED (no whole-stage
  * codegen inside the lambda body; each element pays expression-tree
  * walking plus a struct allocation, then array_max/array_sort walks
  * the nCells-struct array again). The r14 IMI audit measured the flat
  * arm's 2e7×4096-cell assignment DNF'ing on exactly this
  * (audits/imi_audit_r14.json frontier_note). Here the whole scan is
  * one tight fused loop and only the ≤ n result structs allocate.
  *
  * Semantics are BIT-IDENTICAL to the HOF form it replaces (the
  * full-oracle Lloyd replay depends on assignments not moving):
  *  - score s = vec_dot(emb, c_emb) / (embNorm * c_norm), where
  *    embNorm = max(sqrt(vec_dot(emb, emb)), 1e-12) — the same
  *    sequential double folds as [[VecDot]]/[[VectorOps.norm]], same
  *    operation order (norm·c_norm multiplied first, one division).
  *  - ordering: highest s first; s-ties break toward the SMALLEST
  *    cell (the struct(s, -cell) lexicographic-max convention of the
  *    former array_max/array_sort forms). Doubles compare like
  *    Spark's SQLOrderingUtil (`==` first so -0.0 ties 0.0, then
  *    java.lang.Double.compare).
  *  - fewer than n centroids → all of them (slice semantics).
  *  - malformed codebook (NULL entry, or a centroid whose length
  *    differs from the embedding's) → NULL result, conspicuously,
  *    mirroring [[VecDot]]'s length-mismatch contract. NULL elements
  *    inside either array contribute 0 like VecDot.
  *
  * doGenCode keeps the expression INSIDE whole-stage codegen
  * (null-safe child handling fuses with the surrounding projection)
  * and dispatches the scan to [[topCells]] — compiled JVM code, one
  * call per ROW. Unlike [[VecDot]] the loop body is not inlined as
  * generated Java: the bounded top-n insertion plus array-of-struct
  * result assembly is control flow the JIT compiles identically
  * either way, and the per-row call is noise against the nCells·d
  * fold it wraps (VecDot's scalar loop inlines because it IS the
  * whole body).
  *
  * Reference anchor: the cell-routing role of the store/bloom index
  * selection in hbase-server scan setup (which stores a read touches);
  * here, which IVF cell a vector/query routes to.
  */
case class CodebookTopK(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n >= 1, s"codebook_topk: n must be >= 1, got $n")

  override def prettyName: String = "codebook_topk"
  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", DoubleType, nullable = false),
      StructField("cell", IntegerType, nullable = false))),
    containsNull = false)

  private lazy val embIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val embOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    // the codebook is positional: (cell int, c_emb array<double>,
    // c_norm double) — the centroidArray struct shape. The middle
    // field matches on the PATTERN (r15 review): the former
    // asInstanceOf[ArrayType] comparison threw an opaque CCE during
    // analysis on a non-array field instead of this failure message.
    val cbOk = right.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 3 =>
        fs(0).dataType == IntegerType &&
          (fs(1).dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          }) &&
          fs(2).dataType == DoubleType
      case _ => false
    }
    if (embOk && cbOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "codebook_topk needs (array<float|double>, " +
          "array<struct<cell:int, c_emb:array<double>, c_norm:double>>), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  // (s == s2) before Double.compare: Spark's double ordering treats
  // -0.0 and 0.0 as equal (SQLOrderingUtil), so an s-tie across the
  // zero signs must fall through to the cell tiebreak, not to the
  // IEEE bit order
  @inline private def better(s: Double, cell: Int, s2: Double, c2: Int): Boolean =
    if (s == s2) cell < c2
    else java.lang.Double.compare(s, s2) > 0

  /** The per-row scan: codegen calls this directly (one virtual call
    * per row around the nCells·d fold). Returns null on a malformed
    * codebook. */
  def topCells(embRaw: ArrayData, cents: ArrayData): ArrayData = {
    val d = embRaw.numElements()
    @inline def embAt(j: Int): Double =
      if (embRaw.isNullAt(j)) 0.0
      else if (embIsFloat) embRaw.getFloat(j).toDouble else embRaw.getDouble(j)
    var nn = 0.0
    var i = 0
    while (i < d) { val v = embAt(i); nn += v * v; i += 1 }
    val en = math.max(math.sqrt(nn), 1e-12)
    val nc = cents.numElements()
    val sTop = new Array[Double](n)
    val cTop = new Array[Int](n)
    var m = 0
    var c = 0
    while (c < nc) {
      if (cents.isNullAt(c)) return null
      val row = cents.getStruct(c, 3)
      val ce = row.getArray(1)
      // a NULL c_emb FIELD inside a non-null entry is the third
      // malformation shape (r15 review) — same conspicuous-NULL
      // contract as a NULL entry, not an executor NPE
      if (ce == null || ce.numElements() != d) return null
      var dotv = 0.0
      var j = 0
      while (j < d) {
        dotv += embAt(j) * (if (ce.isNullAt(j)) 0.0 else ce.getDouble(j))
        j += 1
      }
      val s = dotv / (en * row.getDouble(2))
      val cell = row.getInt(0)
      if (m < n || better(s, cell, sTop(m - 1), cTop(m - 1))) {
        var pos = if (m < n) m else n - 1
        while (pos > 0 && better(s, cell, sTop(pos - 1), cTop(pos - 1))) {
          sTop(pos) = sTop(pos - 1); cTop(pos) = cTop(pos - 1); pos -= 1
        }
        sTop(pos) = s; cTop(pos) = cell
        if (m < n) m += 1
      }
      c += 1
    }
    val out = new Array[AnyRef](m)
    i = 0
    while (i < m) {
      out(i) = new GenericInternalRow(Array[Any](sTop(i), cTop(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    topCells(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("codebookTopK", this, classOf[CodebookTopK].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = $self.topCells($a, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodebookTopK =
    copy(left = newLeft, right = newRight)
}
