package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The declared query inventory: one entry per implemented operator
  * (SURVEY.md §2), each with a DuckDB-runnable oracle where the semantics
  * are SQL-expressible.
  *
  * Conventions for oracle parity (driver hashes values after sorting
  * columns by name):
  *  - double aggregations go through DECIMAL(18,2) so Spark and DuckDB sums
  *    are exact and identical, then cast back to DOUBLE;
  *  - timestamps are never returned raw (ns vs us width): they egress as
  *    epoch seconds (BIGINT) or formatted strings;
  *  - every query ends in a deterministic total ORDER BY.
  */
object Queries {
  case class Q(name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      bench: Boolean = false)

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---------------------------------------------------------------------
  // Aggregation core (grouping-by analog on batch: SURVEY §2.4 grouping-by,
  // §2.8 numeric context functions sum/min/max/average)
  // ---------------------------------------------------------------------
  private val aggStats = Q("agg_stats",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      COUNT(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  // ---------------------------------------------------------------------
  // Filters (SURVEY §2.3): severity/facility class predicates
  // ---------------------------------------------------------------------
  private val filterSeverity = Q("filter_severity",
    (s, d) => {
      val ev = Tables.events(s, d)
      // events have no syslog pri; derive one deterministically, then apply
      // the reference's severity(<=err) + facility(in set) bitmask semantics
      ev.withColumn("severity", (col("event_id") % 8).cast("int"))
        .withColumn("facility", (col("user_id") % 24).cast("int"))
        .filter(col("severity") <= 3 && col("facility").isin(0, 1, 4, 10))
        .select(col("event_id"), col("facility"), col("severity"), col("event_type"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, CAST(user_id % 24 AS INT) AS facility,
      CAST(event_id % 8 AS INT) AS severity, event_type
      FROM events
      WHERE event_id % 8 <= 3 AND user_id % 24 IN (0, 1, 4, 10)
      ORDER BY event_id"""))

  // ---------------------------------------------------------------------
  // Enrichment lookup join (SURVEY §2.4 add-contextual-data): broadcast
  // hash join against a small dimension
  // ---------------------------------------------------------------------
  private val enrichLookup = Q("enrich_lookup",
    (s, d) => {
      val ev = Tables.events(s, d)
      val nation = Tables.nation(s, d)
      ev.withColumn("nkey", (col("user_id") % 25).cast("int"))
        .join(broadcast(nation), col("nkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name, COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events JOIN nation ON CAST(user_id % 25 AS INT) = n_nationkey
      GROUP BY n_name ORDER BY n_name"""),
    bench = true)

  // ---------------------------------------------------------------------
  // All queries
  // ---------------------------------------------------------------------
  val all: Seq[Q] = Seq(aggStats, filterSeverity, enrichLookup)

  val registry: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
  val benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}
