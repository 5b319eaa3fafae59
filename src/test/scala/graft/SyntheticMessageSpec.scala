package graft

import graft.patterndb.{PdbLoader, Synthetic}
import org.apache.spark.sql.functions._

/** Synthetic-message inheritance battery, ported from
  * `/root/reference/modules/dbparser/tests/test_patterndb.c`
  * (pdbtest_patterndb_message_property_inheritance_* and
  * test_patterndb_context_length over the test_patterndb.h skeletons).
  */
class SyntheticMessageSpec extends GraftSuite {
  import spark.implicits._

  private val InheritanceEnabledPdb = """<patterndb version='4' pub_date='2010-02-22'>
    <ruleset name='testset' id='1'>
      <patterns><pattern>prog2</pattern></patterns>
      <rules>
        <rule provider='test' id='11' class='system'>
          <patterns><pattern>pattern-with-inheritance-enabled</pattern></patterns>
          <tags><tag>basetag1</tag><tag>basetag2</tag></tags>
          <actions>
            <action trigger='match'>
              <message inherit-properties='TRUE'>
                <values><value name='actionkey'>actionvalue</value></values>
                <tags><tag>actiontag</tag></tags>
              </message>
            </action>
          </actions>
        </rule>
      </rules>
    </ruleset>
  </patterndb>"""

  private def classified(pdbXml: String, messages: Seq[(String, String, Long)]) = {
    val path = java.nio.file.Files.createTempFile("graft-pdb", ".xml")
    java.nio.file.Files.write(path, pdbXml.getBytes("UTF-8"))
    val loaded = PdbLoader.loadString(pdbXml)
    val df = messages.toDF("program", "message", "sec")
      .withColumn("host", lit("host"))
      .withColumn("pid", lit("999"))
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("tags", array().cast("array<string>"))
      .withColumn("__r", graft.functions.RadixMatch(col("message"),
        PdbLoader.radixRules(loaded)))
      .withColumn("values", col("__r.captures"))
    val rule = loaded.head.rules.head
    val tagged = df.withColumn("tags",
      when(col("__r.rule_id") === rule.id,
        array(rule.tags.map(lit(_)): _*)).otherwise(col("tags")))
    (tagged.drop("__r", "sec"), rule)
  }

  test("inherit-properties TRUE copies the triggering message (test_patterndb.c:539-553)") {
    val (df, rule) = classified(InheritanceEnabledPdb,
      Seq(("prog2", "pattern-with-inheritance-enabled", 100L)))
    val out = Synthetic.messages(df, col("host"), rule.actions.head,
      scope = None).head
    assert(out.getAs[String]("message") == "pattern-with-inheritance-enabled")
    val tags = out.getAs[Seq[String]]("tags").toSet
    assert(tags.contains("basetag1"))
    assert(tags.contains("basetag2"))
    assert(tags.contains("actiontag"))
    assert(out.getAs[Map[String, String]]("values").get("actionkey")
      .contains("actionvalue"))
  }

  test("inherit-properties FALSE starts from an empty message (test_patterndb.c:555-569)") {
    val pdb = InheritanceEnabledPdb
      .replace("inherit-properties='TRUE'", "inherit-properties='FALSE'")
      .replace("pattern-with-inheritance-enabled", "pattern-with-inheritance-disabled")
    val (df, rule) = classified(pdb,
      Seq(("prog2", "pattern-with-inheritance-disabled", 100L)))
    val out = Synthetic.messages(df, col("host"), rule.actions.head,
      scope = None).head
    assert(out.getAs[String]("message") == null)
    val tags = out.getAs[Seq[String]]("tags").toSet
    assert(!tags.contains("basetag1"))
    assert(!tags.contains("basetag2"))
    assert(tags.contains("actiontag"))
    assert(out.getAs[Map[String, String]]("values").get("actionkey")
      .contains("actionvalue"))
  }

  test("inherit-properties context merges every member's values (test_patterndb.c:571-588)") {
    val pdb = """<patterndb version='4' pub_date='2010-02-22'>
      <ruleset name='testset' id='1'>
        <patterns><pattern>prog2</pattern></patterns>
        <rules>
          <rule provider='test' id='11' class='system' context-scope='program'
               context-id='$PID' context-timeout='60'>
            <patterns><pattern>pattern-with-inheritance-context@ANYSTRING:p@</pattern></patterns>
            <tags><tag>basetag1</tag><tag>basetag2</tag></tags>
            <actions>
              <action trigger='timeout'>
                <message inherit-properties='context'>
                  <values><value name='MESSAGE'>action message</value></values>
                  <tags><tag>actiontag</tag></tags>
                </message>
              </action>
            </actions>
          </rule>
        </rules>
      </ruleset>
    </patterndb>"""
    // two context members, each contributing its own capture under a
    // distinct name (the reference feeds "merged1"/"merged2" values)
    val loaded = PdbLoader.loadString(pdb)
    val rule = loaded.head.rules.head
    val df = Seq(
      ("prog2", "pattern-with-inheritance-context merged", 100L, "merged1", "merged1"),
      ("prog2", "pattern-with-inheritance-context merged", 101L, "merged2", "merged2"))
      .toDF("program", "message", "sec", "k", "v")
      .withColumn("host", lit("host"))
      .withColumn("pid", lit("999"))
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("tags", array(lit("basetag1"), lit("basetag2")))
      .withColumn("values", map(col("k"), col("v")))
      .drop("k", "v", "sec")
    val out = Synthetic.messages(df,
      graft.streaming.Correlate.contextKey(rule.contextScope, rule.contextId,
        df.columns.toSeq),
      rule.actions.head, scope = rule.contextScope).head
    assert(out.getAs[String]("message") == "action message")
    val values = out.getAs[Map[String, String]]("values")
    assert(values.get("merged1").contains("merged1"))
    assert(values.get("merged2").contains("merged2"))
    assert(out.getSeq[String](out.fieldIndex("tags")).contains("actiontag"))
  }

  test("$(context-length) renders n+1 in values, n in conditions (test_patterndb.c:589-606)") {
    // pattern13: 1 message fed; the generated message virtually joins
    // the context, so CONTEXT_LENGTH renders "2"
    val pdb13 = """<patterndb version='4' pub_date='2010-02-22'>
      <ruleset name='testset' id='1'>
        <patterns><pattern>prog1</pattern></patterns>
        <rules>
          <rule provider='test' id='13' class='system' context-scope='program'
                context-id='$PID' context-timeout='60'>
            <patterns><pattern>pattern13</pattern></patterns>
            <values><value name='n13-1'>v13-1</value></values>
            <actions>
              <action condition='"${n13-1}" eq "v13-1"' trigger='match'>
                <message inherit-properties='TRUE'>
                  <values><value name='CONTEXT_LENGTH'>$(context-length)</value></values>
                </message>
              </action>
            </actions>
          </rule>
        </rules>
      </ruleset>
    </patterndb>"""
    val loaded = PdbLoader.loadString(pdb13)
    val rule = loaded.head.rules.head
    val df = Seq(("prog1", "pattern13", 100L)).toDF("program", "message", "sec")
      .withColumn("host", lit("host"))
      .withColumn("pid", lit("999"))
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("tags", array().cast("array<string>"))
      .withColumn("values", map(lit("n13-1"), lit("v13-1")))
      .drop("sec")
    val out = Synthetic.messages(df,
      graft.streaming.Correlate.contextKey(rule.contextScope, rule.contextId,
        df.columns.toSeq),
      rule.actions.head, scope = rule.contextScope)
    assert(out.count() == 1)
    assert(out.head.getAs[Map[String, String]]("values")("CONTEXT_LENGTH") == "2")

    // pattern15 shape: condition on context length 2 — FALSE inherit,
    // only the action value survives
    val action15 = rule.actions.head.copy(
      condition = Some("\"$(context-length)\" eq \"2\""),
      messageValues = Seq("fired" -> "true"),
      inheritProperties = "none")
    val twoCtx = df.union(df.withColumn("ts", timestamp_seconds(lit(101L))))
    val out15 = Synthetic.messages(twoCtx,
      graft.streaming.Correlate.contextKey(rule.contextScope, rule.contextId,
        df.columns.toSeq),
      action15, scope = rule.contextScope)
    assert(out15.head.getAs[Map[String, String]]("values")("fired") == "true")
    assert(out15.head.getAs[String]("message") == null)
    // a 1-message context fails the length-2 condition
    val outShort = Synthetic.messages(df,
      graft.streaming.Correlate.contextKey(rule.contextScope, rule.contextId,
        df.columns.toSeq),
      action15, scope = rule.contextScope)
    assert(outShort.count() == 0)
  }

  // ---- $(func)@N msg refs + grep/context-lookup join encoding ------------
  // (test_basicfuncs.c:163-165; cond-funcs.c:133 vs context-funcs.c:78)

  private def ctxRender(template: String): String = {
    // a 2-member context with distinct PIDs: member 1 (older, pid=111),
    // member 2 (newer = trigger, pid=222, a comma-carrying value)
    val ctx = Seq(
      ("h", "prog", "111", "older", 100L, Map("cv" -> "a,b c")),
      ("h", "prog", "222", "newer", 200L, Map("cv" -> "d,e f")))
      .toDF("host", "program", "pid", "message", "sec", "values")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("tags", array().cast("array<string>"))
      .drop("sec")
    Synthetic.applyValues(ctx, col("host"),
      Seq("out" -> template), Seq.empty)
      .select("values").head.getAs[Map[String, String]]("values")("out")
  }

  test("$(grep)@N evaluates over a single-member context (test_basicfuncs.c:163-165)") {
    assert(ctxRender("$(grep ('$PID' ne '') $PID)") == "111,222")
    assert(ctxRender("$(grep ('$PID' ne '') $PID)@0") == "222")
    assert(ctxRender("$(grep ('$PID' ne '') $PID)@1") == "111")
    assert(ctxRender("$(grep ('$PID' ne '') $PID)@2") == "")
  }

  test("$(grep) joins raw values with ',' while $(context-lookup) str-repr quotes (cond-funcs.c:133, context-funcs.c:78)") {
    assert(ctxRender("$(grep ('$PID' ne '') ${cv})") == "a,b c,d,e f")
    assert(ctxRender("$(context-lookup ('$PID' ne '') ${cv})") ==
      "\"a,b c\",\"d,e f\"")
  }

  test("$(grep) keeps unset-value positions — empty render, delimiter preserved (cond-funcs.c:133, ADVICE r11)") {
    assert(ctxRender("$(grep ('$PID' ne '') $PID ${no_such})") ==
      "111,,222,")
    assert(ctxRender("$(grep ('$PID' ne '') ${no_such} $PID)") ==
      ",111,,222")
  }

  test("$(func args)@N binds the function's refs to that context member (compiler.c:62, eval.c:97-103)") {
    assert(ctxRender("$(echo $PID)@0") == "222")
    assert(ctxRender("$(echo $PID)@1") == "111")
    assert(ctxRender("$(echo $PID)@2") == "")
    assert(ctxRender("$(context-length)@0") == "1")
    assert(ctxRender("$(context-length)") == "2")
  }

  test("db-parser() applies rule-level tags at classification") {
    val pdbPath = java.nio.file.Files.createTempFile("graft-tags", ".xml")
    java.nio.file.Files.write(pdbPath, InheritanceEnabledPdb.getBytes("UTF-8"))
    val logs = Seq(
      ("prog2", "pattern-with-inheritance-enabled"),
      ("prog2", "nomatch")).toDF("program", "message")
      .withColumn("host", lit("h"))
      .withColumn("tags", array().cast("array<string>"))
    val cfg = graft.config.ConfigParser.parse(s"""
      source s { file("/x"); };
      parser p { db-parser(file("${pdbPath}")); };
      destination d { file("/out"); };
      log { source(s); parser(p); destination(d); };
    """)
    val out = graft.config.ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
      .orderBy("message")
    val rows = out.select("message", "tags").collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toSet))
    assert(rows(1)._2 == Set("basetag1", "basetag2"))
    assert(rows(0)._2 == Set.empty)
  }
}
