package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Zero-cost optimizer barrier: evaluates to exactly its child (same
  * value, same nullability, the child's generated code verbatim) but
  * reports `deterministic = false`, so Catalyst may not substitute it
  * into downstream expressions — CollapseProject keeps the alias in
  * its own projection, the V1 scan strategy's unconditional
  * project-collapse leaves it alone, and no filter on it is pushed
  * below the projection that computes it.
  *
  * Why an Expression and not a value-level trick (r17): the previous
  * barrier, `when(rand() >= 0, c)`, is SIMPLIFIED AWAY by the Spark
  * 4.1 optimizer (it knows rand's [0, 1) range and folds the
  * always-true comparison) — every mm payload silently un-pinned, and
  * the mm_audio_info plan carried 12 inlined copies of the payload
  * CASE (~1 s of per-materialization optimizer walking, measured).
  * The surviving value-level form, element_at(array(c), 1 + 0·rand),
  * COPIES the child per wrap — for KB binary payloads through a dozen
  * pinned stages that is real per-row work. This node costs nothing
  * at runtime: `doGenCode` returns the child's ExprCode unchanged.
  *
  * Deliberately NOT the stateful `Nondeterministic` trait — there is
  * no state to initialize; `deterministic = false` alone is what the
  * optimizer consults.
  */
case class Pin(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def foldable: Boolean = false
  override def prettyName: String = "pin"
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Pin =
    copy(child = newChild)
}

object Pin {
  /** Column-level wrap: `Pin.col(c)` is `c` behind the barrier. */
  def col(c: Column): Column = ColumnBridge.column(Pin(ColumnBridge.expression(c)))
}
