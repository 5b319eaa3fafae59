package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Single-scan compilation for DISJOINT branch unions (r15 VERDICT item 3).
  *
  * A junction compiles as K filtered-and-transformed views of one input,
  * unioned back. Catalyst pushes each branch's deliver predicate below
  * any shared exchange, so the K-branch union re-reads the source K
  * times (app_parser / route_junction / config_pipeline_v3: 3 events
  * scans each, ReusedExchange = 0 in the r15 plan audit). When
  *
  *  1. the branches are provably DISJOINT (every row delivers to at most
  *     one branch — the final/fallback flag structure guarantees it), and
  *  2. every branch body is ROW-LOCAL (its analyzed plan is nothing but
  *     Project/Filter nodes over the shared input),
  *
  * the union is semantically a single projection: each output column
  * becomes `CASE WHEN deliver_1 THEN e_1 ... WHEN deliver_k THEN e_k END`
  * and the row-keep predicate is `deliver_1 OR ... OR deliver_k`. One
  * scan, one codegen stage, no union — the same compilation
  * default_network's fused when-chain already uses, generalized to
  * arbitrary row-local `DataFrame => DataFrame` bodies by reading the
  * composed expressions off the analyzed branch plans.
  *
  * Anything non-row-local (joins, aggregates, nested unions that did not
  * themselves fuse) or type-divergent falls back to the union compile —
  * the fusion NEVER changes results, only the plan: the caller asserts
  * the fused schema equals the union schema and keeps the union
  * otherwise.
  */
object FusedBranches {

  /** Try to fuse `parts` (the per-branch OUTPUT frames, in union order)
    * into one projection over `base`. The caller must guarantee
    * disjointness; this function verifies row-locality and schema
    * equality with `fallback` (the unionByName compile of the same
    * parts) and returns `fallback` when fusion is not applicable. */
  def fuseOrUnion(base: DataFrame, parts: Seq[DataFrame],
      fallback: => DataFrame): DataFrame = {
    val union = fallback
    try fuse(base, parts, union).getOrElse(union)
    catch { case scala.util.control.NonFatal(_) => union }
  }

  private def fuse(base: DataFrame, parts: Seq[DataFrame],
      union: DataFrame): Option[DataFrame] = {
    val basePlan = base.queryExecution.analyzed
    val flat = parts.map(p => flatten(p.queryExecution.analyzed, basePlan))
    if (flat.exists(_.isEmpty)) return None
    val branches = flat.map(_.get)
    // union-by-name column order: first branch's columns, then each later
    // branch's new columns in order of appearance
    val names = branches.foldLeft(Vector.empty[String]) { (acc, b) =>
      acc ++ b._1.map(_._1.name).filterNot(acc.contains)
    }
    val keep = ColumnBridge.column(
      branches.map(_._2).reduceLeft[Expression](Or(_, _)))
    val cols = names.map { n =>
      val cases = branches.flatMap { case (out, cond) =>
        out.find(_._1.name == n).map { case (_, e) => (cond, e) }
      }
      // a branch without the column contributes NULL (union's null-fill):
      // CaseWhen with no otherwise yields exactly that
      ColumnBridge.column(CaseWhen(cases.toSeq, None)).as(n)
    }
    val fused = base.filter(keep).select(cols: _*)
    // the only acceptable fusion is an invisible one: same names, same
    // types, same order as the union compile (CaseWhen and Union share
    // the wider-common-type coercion family, but assert rather than
    // assume; nullability may legitimately differ)
    val same = fused.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      union.schema.fields.map(f => (f.name, f.dataType)).toSeq
    if (same) Some(fused) else None
  }

  /** Flatten a branch-output plan into (output attr -> expression over
    * `basePlan`'s attributes, row condition over the same) — or None if
    * the plan is not a pure Project/Filter chain over `basePlan`. */
  private def flatten(plan: LogicalPlan, basePlan: LogicalPlan)
      : Option[(Seq[(Attribute, Expression)], Expression)] = plan match {
    case p if p.fastEquals(basePlan) =>
      Some((basePlan.output.map(a => (a: Attribute, a: Expression)),
        Literal.TrueLiteral))
    case Project(list, child) =>
      flatten(child, basePlan).map { case (childOut, cond) =>
        val m = childOut.map { case (a, e) => a.exprId -> e }.toMap
        (list.map(ne => (ne.toAttribute, subst(compute(ne), m))), cond)
      }
    case Filter(c, child) =>
      flatten(child, basePlan).map { case (childOut, cond) =>
        val m = childOut.map { case (a, e) => a.exprId -> e }.toMap
        (childOut, if (cond == Literal.TrueLiteral) subst(c, m)
        else And(cond, subst(c, m)))
      }
    case SubqueryAlias(_, child) => flatten(child, basePlan)
    case _ => None
  }

  /** The expression computing a projection item (strip one Alias). */
  private def compute(ne: NamedExpression): Expression = ne match {
    case Alias(child, _) => child
    case e => e
  }

  private def subst(e: Expression, m: Map[ExprId, Expression]): Expression =
    e.transformUp {
      case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
    }
}
