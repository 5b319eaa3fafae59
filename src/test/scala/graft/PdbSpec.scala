package graft

import graft.patterndb.{PdbLoader, PdbMatcher}
import org.apache.spark.sql.functions._

/** pdbtool-test-style golden harness (`pdbtool/pdbtool.c:676-792`): load
  * pattern XML, run every embedded `<example>` through the classifier,
  * assert rule_id and the expected name/value captures. */
class PdbSpec extends GraftSuite {
  import spark.implicits._

  test("windowseventlog.xml: real reference ruleset, all examples pass") {
    val rulesets = PdbLoader.loadFile(
      "/root/reference/scl/windowseventlog/windowseventlog.xml")
    assert(rulesets.nonEmpty)
    val m = new PdbMatcher(rulesets)
    val examples = for (rs <- rulesets; r <- rs.rules; ex <- r.examples)
      yield (r, ex)
    assert(examples.nonEmpty, "ruleset carries embedded golden examples")
    examples.foreach { case (r, ex) =>
      val res = m.classify(ex.program, ex.message)
      assert(res.isDefined, s"rule ${r.id}: example did not classify")
      val (ruleId, _, nvs) = res.get
      assert(ruleId == r.id, s"expected rule ${r.id}, classified as $ruleId")
      ex.expectedValues.foreach { case (k, v) =>
        assert(nvs.get(k).contains(v),
          s"rule ${r.id}: capture $k expected '$v', got '${nvs.get(k)}'")
      }
    }
  }

  test("windows-eventlog-parser(): db-parser composite with drop-unmatched") {
    // scl/windowseventlog/plugin.conf: db-parser(file("windowseventlog
    // .xml") drop-unmatched(yes)) — a matching eventlog line
    // classifies with captures, a non-matching line is DROPPED
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cfg = graft.config.ConfigParser.parse("""
      source s { file("/x"); };
      destination d { file("/out"); };
      parser p_win { windows-eventlog-parser(
        file("/root/reference/scl/windowseventlog/windowseventlog.xml")); };
      log { source(s); parser(p_win); destination(d); };
    """)
    val rulesets = PdbLoader.loadFile(
      "/root/reference/scl/windowseventlog/windowseventlog.xml")
    val ex = (for (rs <- rulesets; r <- rs.rules; e <- r.examples)
      yield e).head
    val df = Seq(
      (ex.program, ex.message),
      ("randomapp", "nothing eventlog about this")).toDF("program", "message")
    val out = graft.config.ConfigCompiler.compile(cfg, Map("s" -> df)).head.df
    val rows = out.select(col("program"),
      element_at(col("values"), ".classifier.class")).collect()
    assert(rows.length == 1, s"unmatched row must drop, got ${rows.length}")
    assert(rows.head.getString(0) == ex.program)
    assert(rows.head.getString(1) != null)
  }

  test("pdb v5 loader: correlation attributes and action blocks") {
    // shape from modules/dbparser/tests/test_patterndb.h (ruletest skeleton)
    val xml = """<patterndb version='5' pub_date='2010-02-22'>
      <ruleset name='testset' id='1'>
        <patterns><pattern>prog1</pattern></patterns>
        <rules>
          <rule provider='test' id='10e' class='violation'
                context-scope='program' context-id='$PID' context-timeout='60'>
            <patterns><pattern>correlated-message-with-rate-limited-action</pattern></patterns>
            <actions>
              <action trigger='match' rate='1/60' condition='"${PID}" eq "999"'>
                <message>
                  <values><value name='MESSAGE'>generated-message-rate-limit</value></values>
                  <tags><tag>correlated-msg-tag</tag></tags>
                </message>
              </action>
              <action trigger='timeout'>
                <message>
                  <values><value name='MESSAGE'>generated-on-timeout</value></values>
                </message>
              </action>
            </actions>
          </rule>
        </rules>
      </ruleset>
    </patterndb>"""
    val rule = PdbLoader.loadString(xml).head.rules.head
    assert(rule.contextScope.contains("program"))
    assert(rule.contextId.contains("$PID"))
    assert(rule.contextTimeout.contains(60))
    val Seq(onMatch, onTimeout) = rule.actions
    assert(onMatch.trigger == "match" && onMatch.rate.contains((1, 60)))
    assert(onMatch.condition.contains("\"${PID}\" eq \"999\""))
    assert(onMatch.messageValues == Seq("MESSAGE" -> "generated-message-rate-limit"))
    assert(onMatch.messageTags == Seq("correlated-msg-tag"))
    assert(onTimeout.trigger == "timeout" && onTimeout.rate.isEmpty)
  }

  test("pdb v4 loader: rules, tags, values, program scoping") {
    val xml = """<patterndb version='4' pub_date='2010-02-22'>
      <ruleset name='testset' id='1'>
        <patterns><pattern>sshd</pattern></patterns>
        <rules>
          <rule provider='test' id='fail-1' class='violation'>
            <patterns><pattern>Failed password for @ESTRING:user: @from @IPvANY:ip@ port @NUMBER:port@</pattern></patterns>
            <tags><tag>auth</tag></tags>
            <values><value name='policy'>deny</value></values>
            <examples><example>
              <test_message program='sshd'>Failed password for root from 10.0.0.7 port 2222</test_message>
              <test_values>
                <test_value name='user'>root</test_value>
                <test_value name='ip'>10.0.0.7</test_value>
                <test_value name='port'>2222</test_value>
              </test_values>
            </example></examples>
          </rule>
        </rules>
      </ruleset>
    </patterndb>"""
    val rulesets = PdbLoader.loadString(xml)
    assert(rulesets.head.programPatterns == Seq("sshd"))
    val rule = rulesets.head.rules.head
    assert(rule.tags == Seq("auth") && rule.values == Seq("policy" -> "deny"))

    val m = new PdbMatcher(rulesets)
    val Some((id, cls, nvs)) = m.classify("sshd",
      "Failed password for root from 10.0.0.7 port 2222")
    assert(id == "fail-1" && cls == "violation")
    assert(nvs("user") == "root" && nvs("ip") == "10.0.0.7" && nvs("port") == "2222")
    assert(nvs("policy") == "deny") // literal rule value merged in
    // wrong program -> ruleset not consulted
    assert(m.classify("cron", "Failed password for root from 10.0.0.7 port 2222").isEmpty)

    // the flattened triples drive the Spark-side RadixMatch expression
    val df = Seq("Failed password for root from 10.0.0.7 port 2222").toDF("message")
      .select(graft.functions.RadixMatch(col("message"),
        PdbLoader.radixRules(rulesets)).as("r"))
    val row = df.head.getStruct(0)
    assert(row.getString(0) == "fail-1")
    assert(row.getMap[String, String](2)("ip") == "10.0.0.7")
  }
}
