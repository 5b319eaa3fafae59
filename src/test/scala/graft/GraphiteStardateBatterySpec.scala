package graft

import graft.config.{ConfigCompiler, ConfigParser}
import graft.template.Template
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batteries for $(stardate) and $(graphite-output), ported from
  * `/root/reference/modules/stardate/tests/test_stardate.c` and
  * `/root/reference/modules/graphite/tests/test_graphite_output.c`,
  * plus the tags-parser add-semantics case from
  * `modules/tagsparser/tests/test_tagsparser.c`. */
class GraphiteStardateBatterySpec extends GraftSuite {
  import spark.implicits._

  // ---- stardate ------------------------------------------------------------

  private def stardate(iso: String, digits: Int): String = {
    val df = Seq(1).toDF("one")
      .withColumn("ts", to_timestamp(lit(iso)))
    val t =
      if (digits == -1) "$(stardate $UNIXTIME)"
      else s"$$(stardate --digits $digits $$UNIXTIME)"
    df.select(Template.column(t, df.columns).cast("string")).head.getString(0)
  }

  test("stardate truncates the year fraction — no rounding up (test_stardate.c:78-89)") {
    assert(stardate("2012-07-15T00:00:00", 1) == "2012.5")
    assert(stardate("2013-07-01T00:00:00", 2) == "2013.49")
    assert(stardate("2014-01-01T00:00:00", 3) == "2014.000")
    assert(stardate("2015-12-31T23:59:59", 3) == "2015.999")
    assert(stardate("2016-12-31T23:59:59", 7) == "2016.9999999")
    assert(stardate("2017-01-01T00:00:00", 0) == "2017")
    assert(stardate("2018-12-01T00:00:00", 0) == "2018")
  }

  test("stardate rejects out-of-range digits (stardate.c:85)") {
    intercept[Exception] { stardate("2012-07-15T00:00:00", 10) }
  }

  // ---- graphite-output -----------------------------------------------------

  private lazy val frame: DataFrame = Seq(1).toDF("one").drop("one")
    .withColumn("host", lit("bzorp"))
    .withColumn("program", lit("syslog-ng"))
    .withColumn("pid", lit("23323"))
    .withColumn("message", lit("árvíztűrőtükörfúrógép"))
    .withColumn("facility", lit(19))
    .withColumn("severity", lit(3))
    .withColumn("ts", to_timestamp(lit("2006-02-11 10:34:56")))
    .withColumn("recvd_ts", timestamp_seconds(lit(1139684315L)))
    .withColumn("tags", array().cast("array<string>"))
    .withColumn("values", map(Seq(
      "APP.VALUE" -> "value", "APP.VALUE2" -> "value", "APP.VALUE3" -> "value",
      "APP.VALUE4" -> "value", "APP.VALUE5" -> "value", "APP.VALUE6" -> "value",
      "APP.VALUE7" -> "value"
    ).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))

  private def render(t: String): String =
    frame.select(Template.column(t, frame.columns).cast("string"))
      .head.getString(0)

  test("graphite plaintext simple pair with $R_UNIXTIME default (test_graphite_output.c:57-60)") {
    assert(render("$(graphite-output local.random.diceroll=4)") ==
      "local.random.diceroll 4 1139684315\n")
  }

  test("graphite --key macro and glob forms (test_graphite_output.c:62-86)") {
    assert(render("$(graphite-output --key MESSAGE)") ==
      "MESSAGE árvíztűrőtükörfúrógép 1139684315\n")
    assert(render("$(graphite-output --key APP.VALUE*)") ==
      "APP.VALUE value 1139684315\n" +
        "APP.VALUE2 value 1139684315\n" +
        "APP.VALUE3 value 1139684315\n" +
        "APP.VALUE4 value 1139684315\n" +
        "APP.VALUE5 value 1139684315\n" +
        "APP.VALUE6 value 1139684315\n" +
        "APP.VALUE7 value 1139684315\n")
    assert(render("$(graphite-output local.value=${APP.VALUE})") ==
      "local.value value 1139684315\n")
  }

  test("graphite --timestamp override (test_graphite_output.c:88-92)") {
    assert(render("$(graphite-output --timestamp 123 x=y)") == "x y 123\n")
  }

  // ---- tags-parser ---------------------------------------------------------

  test("tags-parser ADDS to existing tags (test_tagsparser.c:46-66)") {
    val logs = Seq(("h", "p", "foo,bar,baz")).toDF("host", "program", "message")
      .withColumn("tags", array(lit("tag-already-set")))
    val cfg = ConfigParser.parse("""
      source s { file("/x"); };
      parser p { tags-parser(); };
      destination d { file("/out"); };
      log { source(s); parser(p); destination(d); };
    """)
    val tags = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
      .select("tags").head.getSeq[String](0).toSet
    assert(tags == Set("tag-already-set", "foo", "bar", "baz"))
  }

  test("tags-parser template() reads an alternative field (test_tagsparser.c:68-90)") {
    val logs = Seq(("h", "foo,bar,baz", "msg")).toDF("host", "program", "message")
      .withColumn("tags", array().cast("array<string>"))
    val cfg = ConfigParser.parse("""
      source s { file("/x"); };
      parser p { tags-parser(template("${PROGRAM}")); };
      destination d { file("/out"); };
      log { source(s); parser(p); destination(d); };
    """)
    val tags = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
      .select("tags").head.getSeq[String](0).toSet
    assert(tags == Set("foo", "bar", "baz"))
  }
}
