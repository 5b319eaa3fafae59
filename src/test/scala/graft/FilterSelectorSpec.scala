package graft

import graft.config.{ConfigCompiler, ConfigParser}
import org.apache.spark.sql.functions._

/** add-contextual-data selector batteries, ported from
  * `/root/reference/modules/add-contextual-data/tests/
  * test_filter_selector.c` (named-filter selection in db order) and
  * `test_glob_selector.c` (first-matching glob in declaration order —
  * already the enrich_glob oracle; the db-order case here). */
class FilterSelectorSpec extends GraftSuite {
  import spark.implicits._

  private def write(content: String, suffix: String): String = {
    val p = java.nio.file.Files.createTempFile("graft-sel", suffix)
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("filters() selector resolves to the first matching named filter (test_filter_selector.c:89-161)") {
    val filterConf = write(
      """filter f_localhost { host("localhost"); };
        |filter f_errors { message("error" type(string) flags(substring)); };
        |""".stripMargin, ".conf")
    val dbCsv = write(
      """f_localhost,origin,local
        |f_errors,kind,problem
        |""".stripMargin, ".csv")
    val logs = Seq(
      ("localhost", "all fine"),
      ("remote", "an error happened"),
      ("remote", "quiet")).toDF("host", "message")
    val cfg = ConfigParser.parse(s"""
      source s { file("/x"); };
      parser p { add-contextual-data(selector(filters("$filterConf"))
        database("$dbCsv")); };
      destination d { file("/out"); };
      log { source(s); parser(p); destination(d); };
    """)
    val out = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
    val rows = out.select(col("host"), col("message"),
        element_at(col("values"), "origin").as("origin"),
        element_at(col("values"), "kind").as("kind"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      ("localhost", "all fine", "local", null),
      ("remote", "an error happened", null, "problem"),
      ("remote", "quiet", null, null)))
  }

  test("filter order follows the database, first match wins") {
    val filterConf = write(
      """filter f_all { message("" type(string) flags(substring)); };
        |filter f_specific { host("h1"); };
        |""".stripMargin, ".conf")
    // f_specific listed FIRST in the db: an h1 message selects it even
    // though f_all also matches
    val dbCsv = write(
      """f_specific,which,specific
        |f_all,which,all
        |""".stripMargin, ".csv")
    val logs = Seq(("h1", "x"), ("h2", "x")).toDF("host", "message")
    val cfg = ConfigParser.parse(s"""
      source s { file("/x"); };
      parser p { add-contextual-data(selector(filters("$filterConf"))
        database("$dbCsv")); };
      destination d { file("/out"); };
      log { source(s); parser(p); destination(d); };
    """)
    val out = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
    val rows = out.select(col("host"),
        element_at(col("values"), "which").as("which"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("h1", "specific"), ("h2", "all")))
  }

  test("unknown filter name in the database fails loudly") {
    val filterConf = write("""filter f_a { host("x"); };""", ".conf")
    val dbCsv = write("f_missing,k,v\n", ".csv")
    val logs = Seq(("h", "m")).toDF("host", "message")
    val cfg = ConfigParser.parse(s"""
      source s { file("/x"); };
      parser p { add-contextual-data(selector(filters("$filterConf"))
        database("$dbCsv")); };
      destination d { file("/out"); };
      log { source(s); parser(p); destination(d); };
    """)
    intercept[Exception] {
      ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df.collect()
    }
  }
}
