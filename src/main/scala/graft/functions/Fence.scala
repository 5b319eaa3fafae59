package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Optimizer fence: a semantically-transparent identity wrapper that
  * hides its child from expression-rewrite rules.
  *
  * Staging an expensive derived value as a column only helps if the
  * optimizer does not inline it back into every consumer:
  * `SimplifyExtractValueOps` re-expands `GetStructField(
  * CreateNamedStruct(...))` into the per-field expressions and
  * `CollapseProject` then duplicates them into each consumer, turning
  * a compute-once staged struct into N per-row re-evaluations (the
  * round-6 default_network profile showed the cisco header regexes
  * 9× in the optimized plan). Wrapping the staged value in `fence`
  * makes the extraction opaque, so the projection computes the child
  * once per row and every consumer reads the result.
  *
  * Codegen delegates to the child — the fence itself costs nothing at
  * execution time. Use ONLY on deliberately-staged columns: it also
  * blocks legitimate simplifications (constant folding, pruning of
  * unused struct fields) through itself.
  */
case class Fence(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Fence =
    copy(child = newChild)
}

object Fence {
  def apply(c: Column): Column = ColumnBridge.column(Fence(ColumnBridge.expression(c)))
}
