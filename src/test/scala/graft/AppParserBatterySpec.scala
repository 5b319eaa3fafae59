package graft

import graft.config.{ConfigCompiler, ConfigParser}
import org.apache.spark.sql.functions._

/** app-parser generation battery, ported from
  * `/root/reference/modules/appmodel/tests/test_app_parser_generator.c`
  * + `test_appmodel.c`: user-registered `application name[topic]`
  * blocks, base-topic (`*`) filter/parser inheritance, base-topic-only
  * apps skipped, auto-parse(no), and the strstr include/exclude
  * quirks. The reference asserts generated config TEXT; here the same
  * semantics are asserted on the compiled pipeline's behavior. */
class AppParserBatterySpec extends GraftSuite {
  import spark.implicits._

  private lazy val logs = Seq(
    ("h1", "foo", "k=1, j=2", 3, 6),
    ("h1", "bar", "k=3", 3, 6),
    ("h1", "baz", "k=4", 3, 6),
    ("h1", "other", "hello", 3, 6))
    .toDF("host", "program", "message", "facility", "severity")
    .withColumn("tags", array().cast("array<string>"))

  private def sampleApp(name: String, topic: String): String =
    s"""application $name[$topic] {
          filter { program('$name'); };
          parser { kv-parser(prefix('$name.')); };
        };"""

  private def run(apps: String, parserArgs: String = "") = {
    val cfg = ConfigParser.parse(s"""
      @version: 3.33
      $apps
      parser p_app { app-parser(topic(port514) $parserArgs); };
      destination d { file("/out/x.log"); };
      log { source(s); parser(p_app); destination(d); };
    """)
    ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
      .collect()
      .map(r => r.getAs[String]("program") -> (
        Option(r.getAs[Map[String, String]]("values")).getOrElse(Map.empty),
        r.getAs[collection.Seq[String]]("tags")))
      .toMap
  }

  test("registered apps route, parse and tag (app_parser_generates_references_to_apps)") {
    val out = run(sampleApp("foo", "port514") + sampleApp("bar", "port514"))
    val (fooVals, fooTags) = out("foo")
    assert(fooVals(".app.name") == "foo" && fooVals("foo.k") == "1" &&
      fooVals("foo.j") == "2" && fooTags.contains(".app.foo"))
    val (barVals, barTags) = out("bar")
    assert(barVals(".app.name") == "bar" && barVals("bar.k") == "3" &&
      barTags.contains(".app.bar"))
    // unregistered program: untouched, no .app.name
    assert(!out("other")._1.contains(".app.name"))
  }

  test("filter/parser inherit from the base topic (app_parser_uses_filter_or_parser_from_base_topics)") {
    val out = run(
      "application foo[port514] {\n};" + sampleApp("foo", "*"))
    val (vals, tags) = out("foo")
    assert(vals(".app.name") == "foo" && vals("foo.k") == "1" &&
      tags.contains(".app.foo"))
  }

  test("base-topic-only apps are skipped (app_parser_base_topics_are_skipped)") {
    val out = run(sampleApp("foo", "*") + sampleApp("bar", "*"))
    assert(out.values.forall { case (vals, _) => !vals.contains(".app.name") })
  }

  test("auto-parse(no) disables every branch (app_parser_is_disabled_if_auto_parse_is_set_to_no)") {
    val off = run(sampleApp("foo", "port514") + sampleApp("bar", "port514"),
      "auto-parse(no)")
    assert(off.values.forall { case (vals, _) => !vals.contains(".app.name") })
    val on = run(sampleApp("foo", "port514") + sampleApp("bar", "port514"),
      "auto-parse(yes)")
    assert(on("foo")._1(".app.name") == "foo" &&
      on("bar")._1(".app.name") == "bar")
  }

  test("auto-parse-exclude removes apps (app_parser_excludes_apps)") {
    val out = run(sampleApp("foo", "port514") + sampleApp("bar", "port514"),
      "auto-parse-exclude(foo)")
    assert(!out("foo")._1.contains(".app.name"))
    assert(out("bar")._1(".app.name") == "bar")
  }

  test("auto-parse-include keeps only listed apps (app_parser_includes_apps)") {
    val out = run(sampleApp("foo", "port514") + sampleApp("bar", "port514") +
      sampleApp("baz", "port514"), "auto-parse-include(foo)")
    assert(out("foo")._1(".app.name") == "foo")
    assert(!out("bar")._1.contains(".app.name"))
    assert(!out("baz")._1.contains(".app.name"))
  }

  test("include then exclude compose (app_parser_includes_and_excludes_apps)") {
    val out = run(sampleApp("foo", "port514") + sampleApp("bar", "port514") +
      sampleApp("baz", "port514"),
      "auto-parse-include(foo,bar) auto-parse-exclude(bar)")
    assert(out("foo")._1(".app.name") == "foo")
    assert(!out("bar")._1.contains(".app.name"))
    assert(!out("baz")._1.contains(".app.name"))
  }

  test("include/exclude are strstr substring probes (app-parser-generator.c:86-100)") {
    // "foo" IS included by include("foobar") — the reference's strstr
    // quirk, ported verbatim
    val out = run(sampleApp("foo", "port514"), "auto-parse-include(foobar)")
    assert(out("foo")._1(".app.name") == "foo")
  }

  test("built-in registry still routes first on its topics") {
    val src = Seq(("h1", "sudo", "ok: cmd", 3, 6))
      .toDF("host", "program", "message", "facility", "severity")
      .withColumn("tags", array().cast("array<string>"))
      .withColumn("values", map().cast("map<string,string>"))
    val cfg = ConfigParser.parse("""
      @version: 3.33
      application mysudo[syslog] {
          filter { program('sudo'); };
          parser { kv-parser(prefix('my.')); };
      };
      parser p_app { app-parser(topic(syslog)); };
      destination d { file("/out/x.log"); };
      log { source(s); parser(p_app); destination(d); };
    """)
    val row = ConfigCompiler.compile(cfg, Map("s" -> src)).head.df.head
    // the scl (built-in) sudo application registered first, so it wins
    val vals = row.getAs[Map[String, String]]("values")
    assert(vals(".app.name") == "sudo", vals)
  }
}
