package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionColumnNode, ExpressionUtils}

/** Bridge into Spark's `private[sql]` Column <-> Expression conversions.
  *
  * Spark 4.x routes `Column` through `ColumnNode`; wrapping a custom Catalyst
  * `Expression` as a user-facing `Column` (and back) needs these two calls,
  * which are `private[sql]`. This object lives in the `org.apache.spark.sql`
  * namespace solely to access them; everything else in graft uses the public
  * API.
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over a raw logical plan (Dataset.ofRows is
    * `private[sql]` in the classic package). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Number of cached-plan entries pinned in the session's CacheManager.
    * Test hook for cache hygiene: `Dataset.persist` entries pin the
    * CacheManager until an explicit unpersist (LRU frees blocks, not
    * entries), so operators that persist intermediates must not GROW
    * this across their lifetime (r15 ADVICE / VERDICT item 4). The
    * backing seq is `private` (not `private[sql]`), hence the one
    * reflective read; `isEmpty` alone cannot express "no growth" in a
    * shared test session. */
  def cachedPlanCount(spark: org.apache.spark.sql.SparkSession): Int = {
    val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager
    val m = cm.getClass.getDeclaredMethod("cachedData")
    m.setAccessible(true)
    m.invoke(cm).asInstanceOf[scala.collection.immutable.IndexedSeq[_]].size
  }

  /** If `c` is a `map(lit(k1), v1, lit(k2), v2, ...)` construction with
    * ALL-literal string keys, return the (key, value column) pairs —
    * lets formatters precompute per-key verdicts at plan-build time
    * instead of per row. Spark 4 Columns are ColumnNode trees (the
    * function is still unresolved at this point), so the inspection
    * happens at the node level. */
  def literalKeyedMap(c: Column): Option[Seq[(String, Column)]] = c.node match {
    case f: org.apache.spark.sql.internal.UnresolvedFunction
        if f.functionName == "map" && f.arguments.nonEmpty &&
          f.arguments.length % 2 == 0 =>
      val pairs = f.arguments.grouped(2).toSeq
      val keys = pairs.map(_.head).map {
        case l: org.apache.spark.sql.internal.Literal => l.value match {
          case s: String => Some(s)
          case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
          case _ => None
        }
        case _ => None
      }
      if (keys.forall(_.isDefined))
        Some(keys.map(_.get).zip(pairs.map(p => Column(p(1)))))
      else None
    case _ => None
  }
}
