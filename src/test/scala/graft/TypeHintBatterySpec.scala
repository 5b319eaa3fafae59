package graft

import graft.template.Template
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Type-hint cast battery, ported from
  * `/root/reference/lib/tests/test_type_hints.c` through the
  * format-json surface (the engine's type-hint consumer,
  * `modules/json/format-json.c` tf_json_append_with_type_hint):
  * first-character boolean casts, strtol/strtod full-string parses
  * with verbatim unquoted emission, overflow-vs-underflow asymmetry,
  * and DATETIME rendering as a plain quoted string.
  */
class TypeHintBatterySpec extends GraftSuite {
  import spark.implicits._

  private lazy val frame: DataFrame = Seq(1).toDF("one").drop("one")
    .withColumn("values", map(Seq(
      "tt" -> "totaly true", "ff" -> "fatally false", "boo" -> "booyah",
      "sp" -> " 12345", "plus" -> "+5", "junk" -> "12345a",
      "dnl" -> "7\n", "emp" -> "",
      "uflow" -> "1e-100000000", "oflow" -> "1e1000000",
      "noflow" -> "-1e1000000", "inf" -> "INF", "dbad" -> "2.0bad",
      "dt" -> "12345.54321"
    ).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))

  private def render(template: String): String =
    frame.select(Template.column(template, frame.columns).cast("string"))
      .head.getString(0)

  private def check(template: String, expected: String): Unit =
    assert(render(template) == expected, template)

  test("boolean casts by first character (test_type_hints.c:105-132)") {
    check("$(format-json b=boolean(True))", "{\"b\":true}")
    check("$(format-json b=boolean(true))", "{\"b\":true}")
    check("$(format-json b=boolean(1))", "{\"b\":true}")
    check("$(format-json b=boolean($tt))", "{\"b\":true}") // "totaly true"
    check("$(format-json b=boolean(False))", "{\"b\":false}")
    check("$(format-json b=boolean(false))", "{\"b\":false}")
    check("$(format-json b=boolean(0))", "{\"b\":false}")
    check("$(format-json b=boolean($ff))", "{\"b\":false}") // "fatally false"
    // 'b' is not in [TtFf10] -> cast error -> default drop-message
    check("$(format-json x=y b=boolean($boo))", "")
    // the reference never accepted yes/no/on/off — 'y' errors too
    check("$(format-json x=y b=boolean(yes))", "")
  }

  test("int casts: strtol whitespace/sign, verbatim emission (test_type_hints.c:149-200)") {
    check("$(format-json i=int32(12345))", "{\"i\":12345}")
    check("$(format-json i=int64(12345))", "{\"i\":12345}")
    // leading isspace and an explicit + pass strtol; the ORIGINAL
    // bytes are emitted unquoted (format-json.c append_value !quoted)
    check("$(format-json i=int32($sp))", "{\"i\": 12345}")
    check("$(format-json i=int32($plus))", "{\"i\":+5}")
    // trailing junk / trailing newline / empty: cast errors
    check("$(format-json x=y i=int32($junk))", "")
    check("$(format-json x=y i=int32($dnl))", "")
    check("$(format-json x=y i=int64($junk))", "")
    check("$(format-json x=y i=int32($emp))", "")
  }

  test("double casts: underflow ok, overflow errors, INF literal (test_type_hints.c:202-270)") {
    check("$(format-json d=double(1.0))", "{\"d\":1.0}")
    // strtod underflow -> 0.0, cast SUCCEEDS, original bytes emitted
    check("$(format-json d=double($uflow))", "{\"d\":1e-100000000}")
    // strtod ERANGE overflow -> cast error, both signs
    check("$(format-json x=y d=double($oflow))", "")
    check("$(format-json x=y d=double($noflow))", "")
    // the INF literal is a VALID strtod parse (test INFINITY row)
    check("$(format-json d=double($inf))", "{\"d\":INF}")
    // trailing junk / empty
    check("$(format-json x=y d=double($dbad))", "")
    check("$(format-json x=y d=double($emp))", "")
  }

  test("datetime hint renders as a quoted string in json (format-json.c:214-218)") {
    // no validation, no ms conversion on the JSON path
    check("$(format-json t=datetime($dt))", "{\"t\":\"12345.54321\"}")
    check("$(format-json t=datetime(whatever))", "{\"t\":\"whatever\"}")
  }

  test("log_template_on_error_parse flags (test_template_on_error.c verbatim)") {
    import graft.template.TemplateOnError._
    // test_success: the six accepted modes parse to these exact flags
    assert(parse("drop-message").contains(DropMessage))
    assert(parse("silently-drop-message").contains(DropMessage | Silent))
    assert(parse("drop-property").contains(DropProperty))
    assert(parse("silently-drop-property").contains(DropProperty | Silent))
    assert(parse("fallback-to-string").contains(FallbackToString))
    assert(parse("silently-fallback-to-string")
      .contains(FallbackToString | Silent))
    // test_fail: unknown mode rejected
    assert(parse("do-what-i-mean").isEmpty)
    // templates.c:259-263: a null mode defaults to drop-message
    assert(parse(null).contains(DropMessage))
    // the config surface rejects unknown modes loudly
    intercept[IllegalArgumentException] {
      render("$(format-json --on-error do-what-i-mean x=y)")
    }
  }

  test("on-error behavior at failed casts: drop-property keeps the rest, " +
      "fallback-to-string emits the quoted bytes, silently- variants act " +
      "the same (the silent bit only mutes logging)") {
    // default drop-message: any failed cast kills the whole render
    check("$(format-json x=y b=boolean($boo))", "")
    check("$(format-json --on-error drop-message x=y b=boolean($boo))", "")
    check("$(format-json --on-error silently-drop-message x=y b=boolean($boo))",
      "")
    // drop-property: only the failing pair disappears
    check("$(format-json --on-error drop-property x=y b=boolean($boo))",
      "{\"x\":\"y\"}")
    check("$(format-json --on-error silently-drop-property x=y i=int32($junk))",
      "{\"x\":\"y\"}")
    // fallback-to-string: the raw bytes render as a quoted string
    check("$(format-json --on-error fallback-to-string b=boolean($boo))",
      "{\"b\":\"booyah\"}")
    check("$(format-json --on-error silently-fallback-to-string i=int32($junk))",
      "{\"i\":\"12345a\"}")
    check("$(format-json --on-error fallback-to-string d=double($dbad))",
      "{\"d\":\"2.0bad\"}")
    // a SUCCESSFUL cast is unaffected by the mode
    check("$(format-json --on-error fallback-to-string b=boolean(true))",
      "{\"b\":true}")
  }
}
