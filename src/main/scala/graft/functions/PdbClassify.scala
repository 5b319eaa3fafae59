package graft.functions

import graft.patterndb.{PdbMatcher, PdbRuleset}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `pdb_classify(program, message)` — the PROGRAM-SCOPED db-parser
  * classification (`/root/reference/modules/dbparser/pdb-ruleset.c:
  * 85-134` `pdb_ruleset_lookup`): the program string selects rulesets
  * through their own radix of `<pattern>` program patterns, then the
  * message is matched against that ruleset's rules — the reference's
  * two-level lookup. A message whose PROGRAM matches no ruleset
  * pattern classifies `unknown` even if some rule pattern would match
  * its text (the flat single-tree [[RadixMatch]] got exactly this
  * wrong in the compiled-config path — found by the ported
  * test_db_parser e2e, r12). Program-pattern parser captures merge in
  * ahead of message captures (pdb-ruleset.c:97-104), and literal rule
  * `<value>`s ride along like rendered templates would.
  *
  * The rulesets ship as data; the two-level radix builds lazily per
  * executor (same pattern as [[RadixMatch]]), and codegen references
  * the matcher via `addReferenceObj` so classification stays inside
  * whole-stage codegen. Callers coalesce null inputs to "" (an unset
  * PROGRAM reads as the empty string in the reference).
  *
  * Returns `(rule_id, rule_class, captures)`; no match yields the
  * reference's default (`class = "unknown"`, null id,
  * pdb-ruleset.c:160). */
case class PdbClassify(left: Expression, right: Expression,
    rulesets: Seq[PdbRuleset]) extends BinaryExpression {

  @transient private lazy val matcher = new PdbMatcher(rulesets)

  override def dataType: DataType = RadixMatch.schema
  override def prettyName: String = "pdb_classify"

  override protected def nullSafeEval(p: Any, m: Any): Any =
    PdbClassify.classifyRow(matcher, p.asInstanceOf[UTF8String],
      m.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pdbMatcher", matcher,
      classOf[PdbMatcher].getName)
    nullSafeCodeGen(ctx, ev, (p, m) =>
      s"${ev.value} = graft.functions.PdbClassify.classifyRow($mRef, $p, $m);")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): PdbClassify = copy(left = l, right = r)
}

object PdbClassify {
  def classifyRow(matcher: PdbMatcher, program: UTF8String,
      message: UTF8String): InternalRow = {
    val r = new GenericInternalRow(3)
    matcher.classify(program.toString, message.toString) match {
      case None =>
        r.setNullAt(0)
        r.update(1, UTF8String.fromString("unknown"))
        r.update(2, ArrayBasedMapData(Array.empty[Any], Array.empty[Any]))
      case Some((id, cls, caps)) =>
        r.update(0, UTF8String.fromString(id))
        r.update(1, UTF8String.fromString(cls))
        val ks = caps.keys.toArray
        r.update(2, ArrayBasedMapData(
          ks.map(k => UTF8String.fromString(k)).toArray[Any],
          ks.map(k => UTF8String.fromString(caps(k))).toArray[Any]))
    }
    r
  }

  def apply(program: Column, message: Column,
      rulesets: Seq[PdbRuleset]): Column =
    ColumnBridge.column(new PdbClassify(
      ColumnBridge.expression(program), ColumnBridge.expression(message),
      rulesets))
}
