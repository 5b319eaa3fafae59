package graft.functions

import graft.patterndb.Radix
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `radix_match(message)` — db-parser classification (`/root/reference/
  * modules/dbparser/patterndb.c:676-730`).
  *
  * The compiled radix tree ships to executors inside the expression (it
  * is the broadcast "automaton" of SURVEY §4); codegen references it via
  * `addReferenceObj`, so matching stays inside whole-stage codegen — one
  * virtual call per row, no regex battery.
  *
  * Returns `(rule_id, rule_class, captures)`; no match yields the
  * reference's default classification (`class = "unknown"`, null id).
  */
case class RadixMatch(child: Expression, rules: Seq[(String, String, String)])
    extends UnaryExpression {

  @transient private lazy val tree: Radix.Tree = Radix.build(rules)

  override def dataType: DataType = RadixMatch.schema
  override def prettyName: String = "radix_match"

  override protected def nullSafeEval(v: Any): Any =
    RadixMatch.matchRow(tree, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val treeRef = ctx.addReferenceObj("radixTree", tree, classOf[Radix.Tree].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.RadixMatch.matchRow($treeRef, $v);")
  }

  override protected def withNewChildInternal(c: Expression): RadixMatch =
    copy(child = c)
}

object RadixMatch {
  val schema: StructType = StructType(Seq(
    StructField("rule_id", StringType),
    StructField("rule_class", StringType, nullable = false),
    StructField("captures", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))

  def matchRow(tree: Radix.Tree, msg: UTF8String): InternalRow = {
    val r = new GenericInternalRow(3)
    tree.find(msg.toString) match {
      case null =>
        r.setNullAt(0)
        r.update(1, UTF8String.fromString("unknown"))
        r.update(2, ArrayBasedMapData(Array.empty[Any], Array.empty[Any]))
      case (rule, caps) =>
        r.update(0, UTF8String.fromString(rule.ruleId))
        r.update(1, UTF8String.fromString(rule.ruleClass))
        r.update(2, ArrayBasedMapData(
          caps.map(c => UTF8String.fromString(c._1)).toArray[Any],
          caps.map(c => UTF8String.fromString(c._2)).toArray[Any]))
    }
    r
  }

  /** Column builder. */
  def apply(message: Column, rules: Seq[(String, String, String)]): Column =
    ColumnBridge.column(new RadixMatch(ColumnBridge.expression(message), rules))
}
