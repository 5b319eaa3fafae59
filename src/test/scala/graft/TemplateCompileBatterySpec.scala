package graft

import graft.template.Template
import org.apache.spark.sql.functions._

/** The template COMPILER battery, ported from
  * `/root/reference/lib/template/tests/test_template_compile.c`:
  * element splitting, brace/default forms, literal-dollar escapes,
  * correlation msg-ref syntax, and the failure surface. One documented
  * divergence: a failed compile THROWS here (fail loudly at config
  * time) where the reference falls back to rendering
  * "error in template: <raw>". */
class TemplateCompileBatterySpec extends GraftSuite {
  import spark.implicits._

  private lazy val frame = Seq(1).toDF("one").drop("one")
    .withColumn("message", lit("MSGTEXT"))
    .withColumn("VALUE_NAME", lit("VNV"))

  private def render(t: String): String =
    frame.select(Template.column(t, frame.columns).cast("string"))
      .head.getString(0)

  test("literals, macros, and mixed text") {
    assert(render("plain text") == "plain text")
    assert(render("${MESSAGE}") == "MSGTEXT")
    assert(render("${MESSAGE}test value") == "MSGTEXTtest value")
    assert(render("$MESSAGE") == "MSGTEXT")
    assert(render("$MESSAGE test value") == "MSGTEXT test value")
  }

  test("msg-ref syntax: @digits consumed, @@ is a literal @, @text literal") {
    // ${MESSAGE}@0 / @1: correlation stack index — consumed from output
    assert(render("${MESSAGE}@0") == "MSGTEXT")
    assert(render("${MESSAGE}@1") == "MSGTEXT")
    assert(render("${MESSAGE}@13suffix") == "MSGTEXTsuffix")
    // non-numeric: literal '@'
    assert(render("${MESSAGE}@gmail.com") == "MSGTEXT@gmail.com")
    // double '@' collapses to one
    assert(render("${MESSAGE}@@12") == "MSGTEXT@12")
    // trailing lone '@'
    assert(render("${MESSAGE}@") == "MSGTEXT@")
    // after a bare macro and a template function too
    assert(render("$MESSAGE@0") == "MSGTEXT")
    assert(render("$(echo $MESSAGE)@2") == "MSGTEXT")
    assert(render("$(echo $MESSAGE)@@7") == "MSGTEXT@7")
  }

  test("literal dollars: $$ escape, invalid starts") {
    assert(render("$$VALUE_NAME") == "$VALUE_NAME")
    assert(render("$${VALUE_NAME}") == "${VALUE_NAME}")
    assert(render("$:VALUE_NAME") == "$:VALUE_NAME")
    assert(render("$") == "$")
  }

  test("default values: ${name:-default} incl. empty") {
    assert(render("${NOSUCH:-default value}") == "default value")
    assert(render("${NOSUCH:-}") == "")
    assert(render("${MESSAGE:-default}") == "MSGTEXT")
  }

  test("values: braces, bare, empty name") {
    assert(render("${VALUE_NAME}") == "VNV")
    assert(render("$VALUE_NAME") == "VNV")
    assert(render("${}") == "")
  }

  test("failure surface: unterminated/imbalanced constructs throw") {
    intercept[IllegalArgumentException](render("${MESSAGE"))
    intercept[IllegalArgumentException](
      render("$( hello value(xyz \"value with spaces\""))
    intercept[IllegalArgumentException](render("$(unknown-function-xyz abc)"))
  }
}
