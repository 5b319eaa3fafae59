package graft

import org.apache.spark.sql.functions._

/** Physical-plan quality gates: the properties that make these plans
  * survive a 100 TB scale-up must be visible in `explain`, not assumed.
  */
class PlanSpec extends GraftSuite {

  private def plan(name: String): String =
    Queries.registry(name)(spark, sf).queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan") {
    val p = Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal"), p)
  }

  test("column pruning: projections reach ReadSchema") {
    // text_stats touches only doc_id + text; lang/source/n_chars-from-disk
    // must not be read
    val p = plan("text_stats")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text"), read)
    assert(!read.contains("lang") && !read.contains("source"), read)
  }

  test("in-list semi-join broadcasts the key side") {
    val p = plan("filter_in_list")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("enrichment lookup joins broadcast the dimension side") {
    val p = plan("enrich_lookup")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("hot paths stay inside whole-stage codegen") {
    // custom expressions (ParseSyslog here) must not force interpreted
    // fallback: the generated whole-stage code contains the static call
    // (AQE hides WholeStageCodegen spans in the pre-execution plan, so
    // inspect the codegen explain output instead)
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Queries.registry("parse_syslog_rfc3164")(spark, sf)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(s.contains("WholeStageCodegen"), s.take(2000))
      assert(s.contains("SyslogLineParser.parseRow"), s.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
