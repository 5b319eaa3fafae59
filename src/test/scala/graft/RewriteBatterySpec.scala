package graft

import graft.config.{ConfigCompiler, ConfigParser}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's rewrite battery, ported case-for-case from
  * `/root/reference/lib/rewrite/tests/test_rewrite.c` (config text kept
  * verbatim where our grammar overlaps). Rules compile through the real
  * config front end — `rewrite s_test { ... }; log { rewrite(s_test) }`
  * exactly like `create_rewrite_rule` does.
  */
class RewriteBatterySpec extends GraftSuite {
  import spark.implicits._

  /** create_rewrite_rule + invoke_rewrite_rule: run one rewrite rule
    * from config text over a single-row frame. */
  private def rewrite(rule: String, df: DataFrame): DataFrame = {
    val cfg = ConfigParser.parse(s"""
      source s { file("/x"); };
      destination d { file("/out/x.log"); };
      rewrite s_test { $rule };
      log { source(s); rewrite(s_test); destination(d); };
    """)
    ConfigCompiler.compile(cfg, Map("s" -> df)).head.df
  }

  private def field(df: DataFrame, name: String): String =
    Option(df.select(col(name).cast("string")).head.getString(0)).getOrElse("")

  // create_message_with_fields sets ts = 365 days = 1971-01-01T00:00:00Z
  private def msg(fields: (String, String)*): DataFrame = {
    val base = Seq(1).toDF("one")
      .withColumn("ts", to_timestamp(lit("1971-01-01 00:00:00")))
      .drop("one")
    fields.foldLeft(base) { case (d, (k, v)) => d.withColumn(k, lit(v)) }
  }

  test("condition_success: set applies when program matches (test_rewrite.c:106)") {
    val out = rewrite("""set("00100", value("device_id") condition(program("ARCGIS")));""",
      msg("program" -> "ARCGIS"))
    assert(field(out, "device_id") == "00100")
  }

  test("condition no-match leaves the field untouched") {
    val out = rewrite("""set("00100", value("device_id") condition(program("ARCGIS")));""",
      msg("program" -> "other", "device_id" -> "keep"))
    assert(field(out, "device_id") == "keep")
  }

  test("set_field_exist_and_set_literal_string (test_rewrite.c:125)") {
    val out = rewrite("""set("value" value("field1"));""", msg("field1" -> "oldvalue"))
    assert(field(out, "field1") == "value")
  }

  test("set_field_not_exist_and_set_literal_string (test_rewrite.c:134)") {
    val out = rewrite("""set("value" value("field1"));""", msg())
    assert(field(out, "field1") == "value")
  }

  test("set_field_exist_and_set_template_string (test_rewrite.c:143)") {
    val out = rewrite("""set("$field2" value("field1"));""",
      msg("field1" -> "oldvalue", "field2" -> "newvalue"))
    assert(field(out, "field1") == "newvalue")
  }

  test("subst_field_exist_and_substring_substituted (test_rewrite.c:152)") {
    val out = rewrite("""subst("substring" "substitute" value("field1"));""",
      msg("field1" -> "asubstringb"))
    assert(field(out, "field1") == "asubstituteb")
  }

  test("subst_pcre_unused_subpattern stores $0..$3, unused group empty (test_rewrite.c:161)") {
    // subst('(a|(z))(bc)', '.', type(pcre) flags('store-matches')) on
    // "abc": field1 -> ".", $0=abc $1=a $2="" (the (z) alternative never
    // participated) $3=bc
    val out = rewrite(
      """subst("(a|(z))(bc)", ".", value("field1") flags(store-matches));""",
      msg("field1" -> "abc"))
    assert(field(out, "field1") == ".")
    val m = out.select("matches").head.getSeq[String](0)
    assert(m == Seq("abc", "a", "", "bc"), m)
    // and the match groups resolve as template $1..$N like NV "1".."3"
    import graft.template.Template
    assert(out.select(Template.column("$0|$1|$2|$3", out.columns).cast("string"))
      .head.getString(0) == "abc|a||bc")
  }

  test("subst_field_exist_and_substring_substituted_with_template (test_rewrite.c:175)") {
    val out = rewrite("""subst("substring" "$field2" value("field1"));""",
      msg("field1" -> "asubstringb", "field2" -> "substitute"))
    assert(field(out, "field1") == "asubstituteb")
  }

  test("subst substitutes only once without global (test_rewrite.c:184)") {
    val out = rewrite("""subst("substring" "substitute" value("field1"));""",
      msg("field1" -> "substring substring"))
    assert(field(out, "field1") == "substitute substring")
  }

  test("subst substitutes every occurrence with flags(global) (test_rewrite.c:193)") {
    val out = rewrite(
      """subst("substring" "substitute" value("field1") flags(global));""",
      msg("field1" -> "substring substring"))
    assert(field(out, "field1") == "substitute substitute")
  }

  test("subst flags(ignore-case, store-matches): one matcher drives both") {
    // a row matching only case-insensitively must BOTH substitute and
    // store its registers (the reference threads one compiled matcher
    // through match + replace, rewrite-subst.c)
    val out = rewrite(
      """subst("FOO([0-9]+)", "x$1", value("field1") flags(ignore-case, store-matches));""",
      msg("field1" -> "afoo42b"))
    assert(field(out, "field1") == "ax42b")
    val m = out.select(col("matches")).head.getSeq[String](0)
    assert(m == Seq("foo42", "42"))
  }

  test("subst ignore-case with a template replacement") {
    val out = rewrite(
      """subst("FOO", "$field2", value("field1") flags(ignore-case, global));""",
      msg("field1" -> "foo FOO Foo", "field2" -> "bar"))
    assert(field(out, "field1") == "bar bar bar")
  }

  test("subst regexp match (test_rewrite.c:202)") {
    val out = rewrite("""subst("[0-9]+" "substitute" value("field1"));""",
      msg("field1" -> "a123b"))
    assert(field(out, "field1") == "asubstituteb")
  }

  test("set_field honors time-zone() (test_rewrite.c:220)") {
    // set('${ISODATE}' value('UTCDATE') time-zone('Asia/Tokyo')) at
    // ts = 1971-01-01T00:00:00Z renders Tokyo wall clock + offset
    val out = rewrite(
      """set("${ISODATE}" value("UTCDATE") time-zone("Asia/Tokyo"));""",
      msg())
    assert(field(out, "UTCDATE") == "1971-01-01T09:00:00+09:00")
  }

  // ---- groupset family: dynamic NVs live in the values map ----------------

  private def msgValues(fields: (String, String)*): DataFrame =
    Seq(1).toDF("one").drop("one")
      .withColumn("program", lit("program"))
      .withColumn("values",
        map(fields.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))

  private def value(df: DataFrame, key: String): String =
    Option(df.select(element_at(col("values"), key)).head.getString(0))
      .getOrElse("")

  test("set-severity: text/numeric/invalid battery (test_set_severity.c)") {
    def run(v: String, from: Int = 5): Int =
      graft.operators.Rewrites.setSeverity(
        msg("x" -> "y").withColumn("severity", lit(from)), lit(v))
        .select("severity").head.getInt(0)
    assert(run("error") == 3 && run("crit") == 2 && run("debug") == 7)
    assert(run("1") == 1)
    // invalid values keep the original severity
    assert(run("") == 5)          // empty template render
    assert(run("8") == 5)         // too large is INVALID, not clamped
    assert(run("-1") == 5)
    assert(run("random-text") == 5)
  }

  test("set-facility: text/numeric/invalid battery (test_set_facility.c)") {
    def run(v: String, from: Int = 3): Int =
      graft.operators.Rewrites.setFacility(
        msg("x" -> "y").withColumn("facility", lit(from)), lit(v))
        .select("facility").head.getInt(0)
    assert(run("mail") == 2 && run("news") == 7 && run("kern") == 0)
    assert(run("1") == 1 && run("2") == 2)
    assert(run("") == 3)
    assert(run("128") == 3) // max facility code is 127
    assert(run("random-text") == 3)
  }

  test("set-pri: numeric incl. strtol whitespace + range (test_set_pri.c)") {
    def run(v: String, fac: Int = 16, sev: Int = 5): (Int, Int) = {
      val out = graft.operators.Rewrites.setPri(
        msg("x" -> "y").withColumn("facility", lit(fac))
          .withColumn("severity", lit(sev)), lit(v))
      val r = out.select("facility", "severity").head
      (r.getInt(0), r.getInt(1))
    }
    assert(run("7") == (0, 7))       // kern.debug
    assert(run("189") == (23, 5))    // local7.notice
    assert(run("137") == (17, 1))
    assert(run("1023") == (127, 7))
    assert(run(" 123") == (15, 3))   // strtol skips leading whitespace
    // invalid: original pri untouched
    assert(run("") == (16, 5))
    assert(run("1024") == (16, 5))
    assert(run("-1") == (16, 5))
    assert(run("random-text") == (16, 5))
    // trailing junk rejected — incl. a trailing newline, which Java's $
    // anchor would accept but strtol's endptr check does not
    assert(run("7\n") == (16, 5))
    assert(run("7 ") == (16, 5))
    assert(run("7x") == (16, 5))
  }

  test("groupset literal string (test_rewrite.c:211)") {
    val out = rewrite("""groupset("value" values("field1"));""",
      msgValues("field1" -> "oldvalue"))
    assert(value(out, "field1") == "value")
  }

  test("groupset glob star pattern (test_rewrite.c:229)") {
    val out = rewrite("""groupset("value" values("field.*"));""",
      msgValues("field.name1" -> "oldvalue", "field.name2" -> "oldvalue"))
    assert(value(out, "field.name1") == "value")
    assert(value(out, "field.name2") == "value")
  }

  test("groupset glob question-mark pattern (test_rewrite.c:239)") {
    val out = rewrite("""groupset("value" values("field?"));""",
      msgValues("field1" -> "oldvalue", "field2" -> "oldvalue", "other" -> "keep"))
    assert(value(out, "field1") == "value")
    assert(value(out, "field2") == "value")
    assert(value(out, "other") == "keep")
  }

  test("groupset multiple patterns (test_rewrite.c:249)") {
    val out = rewrite("""groupset("value" values("field1" "field2"));""",
      msgValues("field1" -> "oldvalue", "field2" -> "oldvalue"))
    assert(value(out, "field1") == "value")
    assert(value(out, "field2") == "value")
  }

  test("groupset template string (test_rewrite.c:259)") {
    val out = rewrite("""groupset("$field2" values("field1"));""",
      msgValues("field1" -> "oldvalue").withColumn("field2", lit("value")))
    assert(value(out, "field1") == "value")
  }

  test("groupset template with $_ old value (test_rewrite.c:268)") {
    val out = rewrite("""groupset("$_ alma" values("field1"));""",
      msgValues("field1" -> "value"))
    assert(value(out, "field1") == "value alma")
  }

  test("groupset condition does not match (test_rewrite.c:277)") {
    val out = rewrite(
      """groupset("value" values("field1") condition(program("program1")));""",
      msgValues("field1" -> "oldvalue"))
    assert(value(out, "field1") == "oldvalue")
  }

  test("groupset condition matches (test_rewrite.c:287)") {
    val out = rewrite(
      """groupset("value" values("field1") condition(program("program")));""",
      msgValues("field1" -> "oldvalue"))
    assert(value(out, "field1") == "value")
  }

  test("set_field_invalid_template fails config compile (test_rewrite.c:307)") {
    intercept[Exception] {
      rewrite("""groupset("${alma" values("field1"));""", msgValues("f" -> "v"))
        .collect()
    }
  }

  test("unset_field_disappears (test_rewrite.c:312)") {
    val out = rewrite("""unset(value("field1"));""",
      msg("field1" -> "oldvalue", "program" -> "foobar"))
    assert(!out.columns.contains("field1"))
    assert(field(out, "program") == "foobar")
  }

  test("groupunset_field_disappears, non-matching keys survive (test_rewrite.c:322)") {
    val out = rewrite("""groupunset(values("field?"));""",
      msgValues("field1" -> "oldvalue", "field2" -> "oldvalue2", "keep" -> "v"))
    // an unset NV reads back as "" (log_msg_unset semantics)
    assert(value(out, "field1") == "")
    assert(value(out, "field2") == "")
    assert(value(out, "keep") == "v")
    assert(field(out, "program") == "program")
  }
}
