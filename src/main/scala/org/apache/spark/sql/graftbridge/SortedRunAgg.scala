package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, NamedExpression, SortOrder}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.planning.PhysicalAggregation
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.aggregate.SortAggregateExec

/** Complete-mode sorted-run aggregation for session queries
  * (`graft.operators.Sessions.groupingBy`/`suppress`).
  *
  * Why: every session aggregate groups on (key, session ordinal), and
  * the ordinal exists only AFTER the key exchange — so the planner's
  * unconditional partial+final split combines nothing (~one group per
  * 1.7 input rows) and pays pure overhead. For list aggregates
  * (collect_list behind $(context-values), `groupingby.c:327`) it is
  * catastrophic: ObjectHashAggregate's 128-key in-memory map overflows
  * immediately and BOTH halves sort-fall-back, re-sorting 100M
  * already-sorted rows twice and serialize-merging every partial list
  * buffer (99.6 s at sf100p, best of five declarative routes — r14 A/B
  * in SURVEY; this route: 24.7 s). For fixed-width aggregates the
  * partial codegen HashAggregate map fills at ~60M groups and spills:
  * 14.4 → 10.9 s (grouping_by_having), 23.9 → 15.1 s (suppress).
  *
  * The input is ALREADY clustered by the key exchange and sorted
  * (key, ts) in-partition, and the session ordinal is nondecreasing in
  * ts within a key — so (key, ordinal) groups are consecutive and the
  * whole aggregation is one streaming fold over the sorted run. Catalyst
  * cannot know that (the ordinal is computed by a stateful expression),
  * so [[ClaimOrdered]] asserts it: a pass-through logical node whose
  * physical form claims `outputOrdering = (key asc, ordinal asc)` —
  * literally true under the SessionOrdinal contract (the ordinal never
  * resets within a partition, so the pair is lexicographically
  * nondecreasing). [[SortedRunAggStrategy]] then plans the aggregate as
  * ONE Complete-mode SortAggregateExec: EnsureRequirements sees the
  * claimed ordering + the existing hashpartitioning and inserts
  * nothing — no partial aggregate, no fallback sorts, no buffer merges;
  * per-group state is one group's aggregation buffer at a time.
  */
object SortedRunAgg {

  /** Logical pass-through claiming `order` holds on `child`'s output.
    * The claim is the caller's responsibility — Sessions.groupingBy
    * only asserts (key, session_ordinal) over its own exchange+sort. */
  case class ClaimOrdered(order: Seq[SortOrder], child: LogicalPlan)
      extends UnaryNode {
    // QueryPlan.expressions auto-collects the `order` field, so column
    // pruning through this node retains the claimed attributes
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(c: LogicalPlan) =
      copy(child = c)
  }

  case class ClaimOrderedExec(order: Seq[SortOrder], child: SparkPlan)
      extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning = child.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = order
    override protected def doExecute(): RDD[InternalRow] = child.execute()
    override protected def withNewChildInternal(c: SparkPlan) =
      copy(child = c)
  }

  /** Matches Aggregate → (Project?) → ClaimOrdered and plans one
    * Complete SortAggregateExec riding the claimed order. Bails (Nil →
    * builtin strategies) on distinct aggregates or non-AggregateExpression
    * entries. */
  object SortedRunAggStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case PhysicalAggregation(groupings, aggs, results, child)
          if claimed(child) && aggs.nonEmpty && aggs.forall(!_.isDistinct) =>
        val aggExprs = aggs.map(_.copy(mode = Complete))
        // distribution/ordering requirements are checked against the
        // CHILD's output, so strip grouping aliases down to the
        // child-side expressions
        val childSide = groupings.map {
          case a: Alias => a.child
          case e => e
        }
        SortAggregateExec(
          requiredChildDistributionExpressions = Some(childSide),
          isStreaming = false,
          numShufflePartitions = None,
          groupingExpressions = groupings,
          aggregateExpressions = aggExprs,
          aggregateAttributes = aggExprs.map(_.resultAttribute),
          initialInputBufferOffset = 0,
          resultExpressions = results,
          child = planLater(child)) :: Nil
      case ClaimOrdered(order, child) =>
        ClaimOrderedExec(order, planLater(child)) :: Nil
      case _ => Nil
    }

    // Project and Filter both preserve their child's row order and
    // partitioning, and the optimizer routinely lands them between the
    // Aggregate and ClaimOrdered: column pruning inserts Projects, and
    // PushPredicateThroughNonJoin pushes a having/where predicate that
    // references only grouping keys below the Aggregate (ADVICE r14 —
    // without the Filter case such a query silently fell back to the
    // partial+final ObjectHashAggregate route, ~4x on list queries).
    // Nondeterministic predicates are not pushed through Aggregate by
    // the optimizer, but guard anyway: claiming order through one would
    // claim an order the caller never asserted.
    private def claimed(p: LogicalPlan): Boolean = p match {
      case _: ClaimOrdered => true
      case pr: Project => claimed(pr.child)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.deterministic && claimed(f.child)
      case _ => false
    }
  }

  /** Reroute `df` (whose analyzed root must be an Aggregate over a plan
    * sorted in-partition so that ascending `orderCols` — typically
    * (key, ordinal), or (key, split, ordinal) on the skew-split route —
    * is its real row order) onto the Complete sorted-run aggregate. */
  def reroute(df: DataFrame, orderCols: String*): DataFrame = {
    require(orderCols.nonEmpty, "reroute: need at least one order column")
    val spark = df.sparkSession
    registerOnce(spark)
    df.queryExecution.analyzed match {
      case agg @ Aggregate(_, _, child, _) =>
        def attr(n: String): Attribute = child.output
          .find(_.name == n)
          .getOrElse(throw new IllegalArgumentException(
            s"reroute: no column $n in ${child.output.map(_.name)}"))
        val order = orderCols.map(c => SortOrder(attr(c), Ascending))
        ColumnBridge.ofRows(spark,
          agg.withNewChildren(Seq(ClaimOrdered(order, child))))
      case other =>
        throw new IllegalArgumentException(
          s"reroute: expected Aggregate root, got ${other.nodeName}")
    }
  }

  private def registerOnce(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(SortedRunAggStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ SortedRunAggStrategy
    }
}
