package graft

import graft.config.{ConfigCompiler, ConfigParser}
import graft.template.Template
import org.apache.spark.sql.functions._

/** Verbatim port of the reference's db-parser python-functional e2e
  * (`/root/reference/tests/python_functional/functional_tests/parsers/
  * db_parser/test_db_parser.py`) plus the surrounding db-parser config
  * surface (drop-unmatched routing, ruleset program scoping,
  * program-template() override — dbparser.c:225-232,
  * pdb-ruleset.c:68-134), driven end-to-end through ConfigParser →
  * ConfigCompiler → row sets. The python harness asserts the file
  * destination's formatted line; the file sink here writes structured
  * rows, so the destination's template() render is applied explicitly
  * through the same Template.column the formatted destinations use. */
class DbParserBatterySpec extends GraftSuite {
  import spark.implicits._

  /** The DBParserConfig XML shape the python harness generates
    * (db_parser.py write_to): patterndb v5, one ruleset with the
    * program pattern, rules with class + message pattern. */
  private def pdbXml(rulesetPattern: String,
      rules: Seq[(String, String)]): String = {
    val ruleXml = rules.zipWithIndex.map { case ((cls, pat), i) =>
      s"""<rule id="$i" class="$cls"><patterns><pattern>$pat</pattern></patterns></rule>"""
    }.mkString
    s"""<patterndb version="5"><ruleset name="some_name" id="1234">""" +
      s"""<pattern>$rulesetPattern</pattern><rules>$ruleXml</rules>""" +
      "</ruleset></patterndb>"
  }

  private def writePdb(xml: String): String = {
    val p = java.nio.file.Files.createTempFile("graft-dbparser", ".xml")
    java.nio.file.Files.write(p, xml.getBytes("UTF-8"))
    p.toString
  }

  test("test_db_parser.py verbatim: generator source -> db-parser(file) " +
      "-> 'foo=5 class=patterndb'") {
    val pdbPath = writePdb(pdbXml("program_name",
      Seq("patterndb" -> "some number: @NUMBER:foo@")))
    val cfg = ConfigParser.parse(s"""
      source s_gen { example-msg-generator(num(1) freq(0.01)
        template("some number: 5") values("PROGRAM" => "program_name")); };
      parser p_db { db-parser(file("$pdbPath")); };
      destination d_file { file("/out/output.log"); };
      log { source(s_gen); parser(p_db); destination(d_file); };
    """)
    val (routes, _) = ConfigCompiler.compileStreamingPipeline(cfg, spark,
      java.nio.file.Files.createTempDirectory("graft-dbp-sp").toString)
    val cp = java.nio.file.Files.createTempDirectory("graft-dbp-cp").toString
    val q = routes.head.df.writeStream.format("memory")
      .queryName("dbp_out").option("checkpointLocation", cp).start()
    try {
      val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
      while (spark.table("dbp_out").count() < 1 &&
          System.nanoTime < deadline) Thread.sleep(200)
    } finally q.stop()
    val out = spark.table("dbp_out")
    // the python test's file template: 'foo=$foo class=${.classifier.class}'
    val line = out.select(Template.column(
        "foo=$foo class=${.classifier.class}", out.columns.toSeq).as("l"))
      .head.getString(0)
    assert(line == "foo=5 class=patterndb", line)
  }

  private def classified(cfgText: String, rows: Seq[(String, String)])
      : org.apache.spark.sql.DataFrame = {
    val src = rows.toDF("program", "message")
      .withColumn("host", lit("h"))
      .withColumn("tags", array().cast("array<string>"))
    ConfigCompiler.compile(ConfigParser.parse(cfgText), Map("s" -> src))
      .head.df
  }

  test("ruleset program scoping: a message whose PROGRAM matches no " +
      "ruleset pattern classifies unknown (pdb_ruleset_lookup)") {
    val pdbPath = writePdb(pdbXml("program_name",
      Seq("patterndb" -> "some number: @NUMBER:foo@")))
    val out = classified(s"""
      source s { file("/x"); };
      parser p { db-parser(file("$pdbPath")); };
      destination d { file("/out"); };
      log { source(s); parser(p); destination(d); };
    """, Seq(
      ("program_name", "some number: 5"),
      ("other_program", "some number: 5"))) // same TEXT, wrong program
      .select(col("program"),
        element_at(col("values"), ".classifier.class").as("cls"),
        element_at(col("values"), "foo").as("foo"))
      .orderBy("program").collect()
    assert(out(0).getString(1) == "unknown" && out(0).getString(2) == null,
      out.mkString(";")) // other_program: rule text alone must NOT match
    assert(out(1).getString(1) == "patterndb" && out(1).getString(2) == "5",
      out.mkString(";"))
  }

  test("drop-unmatched(yes) drops program-scope misses too " +
      "(dbparser.c:225)") {
    val pdbPath = writePdb(pdbXml("program_name",
      Seq("patterndb" -> "some number: @NUMBER:foo@")))
    val out = classified(s"""
      source s { file("/x"); };
      parser p { db-parser(file("$pdbPath") drop-unmatched(yes)); };
      destination d { file("/out"); };
      log { source(s); parser(p); destination(d); };
    """, Seq(
      ("program_name", "some number: 5"),
      ("other_program", "some number: 5"),
      ("program_name", "no match here")))
      .select("program", "message").collect()
    assert(out.length == 1, out.mkString(";"))
    assert(out.head.getString(0) == "program_name" &&
      out.head.getString(1) == "some number: 5")
  }

  test("program-template() overrides the program used for ruleset " +
      "selection (_calculate_program, pdb-ruleset.c:68-78)") {
    val pdbPath = writePdb(pdbXml("program_name",
      Seq("patterndb" -> "some number: @NUMBER:foo@")))
    val out = classified(s"""
      source s { file("/x"); };
      parser p { db-parser(file("$pdbPath")
        program-template("program_name")); };
      destination d { file("/out"); };
      log { source(s); parser(p); destination(d); };
    """, Seq(("whatever", "some number: 7")))
      .select(element_at(col("values"), ".classifier.class").as("cls"),
        element_at(col("values"), "foo").as("foo"))
      .collect()
    assert(out.head.getString(0) == "patterndb" &&
      out.head.getString(1) == "7", out.mkString(";"))
  }

  // ---- pdb-load merge semantics (pdb-load.c:425-487) -----------------------

  private def matcherFor(xml: String) =
    new graft.patterndb.PdbMatcher(graft.patterndb.PdbLoader.loadString(xml))

  test("rulesets sharing a program pattern merge into ONE rule radix: " +
      "preference is radix specificity, not file order (pdb-load.c:460)") {
    val m = matcherFor(
      """<patterndb version="5">
        |<ruleset name="a" id="1"><pattern>prog</pattern><rules>
        |  <rule id="parser-rule" class="a"><patterns>
        |    <pattern>some number: @NUMBER:foo@</pattern></patterns></rule>
        |</rules></ruleset>
        |<ruleset name="b" id="2"><pattern>prog</pattern><rules>
        |  <rule id="literal-rule" class="b"><patterns>
        |    <pattern>some number: 5</pattern></patterns></rule>
        |</rules></ruleset>
        |</patterndb>""".stripMargin)
    // the literal pattern from the LATER ruleset wins inside the merged
    // radix (a per-ruleset sequential scan would return parser-rule)
    assert(m.classify("prog", "some number: 5").map(_._1)
      .contains("literal-rule"))
    // the parser pattern still catches everything else
    assert(m.classify("prog", "some number: 7").map(_._1)
      .contains("parser-rule"))
  }

  test("a ruleset with NO program patterns lands on the root program, " +
      "matched only by the EMPTY program string (radix.c complete-key " +
      "consumption at the valued root node)") {
    val m = matcherFor(
      """<patterndb version="5">
        |<ruleset name="unscoped" id="1"><rules>
        |  <rule id="r1" class="c"><patterns>
        |    <pattern>hello</pattern></patterns></rule>
        |</rules></ruleset>
        |</patterndb>""".stripMargin)
    assert(m.classify("", "hello").map(_._1).contains("r1"))
    assert(m.classify(null, "hello").map(_._1).contains("r1"))
    assert(m.classify("anyprog", "hello").isEmpty)
  }

  test("joining rulesets with mismatching program-pattern sets is a " +
      "load error (pdb-load.c:481)") {
    val ex = intercept[IllegalArgumentException](matcherFor(
      """<patterndb version="5">
        |<ruleset name="a" id="1"><patterns>
        |  <pattern>p1</pattern><pattern>p2</pattern></patterns>
        |  <rules><rule id="r1" class="c"><patterns>
        |    <pattern>x</pattern></patterns></rule></rules></ruleset>
        |<ruleset name="b" id="2"><patterns>
        |  <pattern>p3</pattern><pattern>p2</pattern></patterns>
        |  <rules><rule id="r2" class="c"><patterns>
        |    <pattern>y</pattern></patterns></rule></rules></ruleset>
        |</patterndb>""".stripMargin).classify("p1", "x"))
    assert(ex.getMessage.contains("mismatching program name sets"))
  }

  test("no cross-program fall-through: a message failing its program's " +
      "rules classifies unknown even if another program's rule text " +
      "would match (pdb_ruleset_lookup returns ONE node)") {
    val m = matcherFor(
      """<patterndb version="5">
        |<ruleset name="a" id="1"><pattern>prog</pattern><rules>
        |  <rule id="r1" class="a"><patterns>
        |    <pattern>alpha</pattern></patterns></rule>
        |</rules></ruleset>
        |<ruleset name="b" id="2"><pattern>@ESTRING:p:@</pattern><rules>
        |  <rule id="r2" class="b"><patterns>
        |    <pattern>beta</pattern></patterns></rule>
        |</rules></ruleset>
        |</patterndb>""".stripMargin)
    // "prog" selects the literal program node (literal preferred over
    // the parser pattern); its rules do not contain "beta"
    assert(m.classify("prog", "beta").isEmpty)
    assert(m.classify("prog", "alpha").map(_._1).contains("r1"))
  }
}
