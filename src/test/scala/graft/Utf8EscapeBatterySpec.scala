package graft

import graft.template.Template
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UTF-8 escaping battery, ported from
  * `/root/reference/lib/tests/test_utf8utils.c` through the engine's
  * two consuming surfaces: `$(format-json)` (escaped_TEXT — named
  * control escapes + \u%04x) and `$(format-welf)` (escaped_BINARY —
  * named control escapes + \x%02x, quote escaping only in the quoted
  * branch). The invalid-UTF-8-byte cases (\xad etc.) are NOT
  * representable here: Spark decodes input bytes to UTF-16 at ingest,
  * so a raw invalid byte never reaches the formatter — that row of the
  * reference battery is an ingest-boundary divergence, documented, not
  * silently skipped.
  */
class Utf8EscapeBatterySpec extends GraftSuite {
  import spark.implicits._

  private lazy val frame: DataFrame = Seq(1).toDF("one").drop("one")
    .withColumn("values", map(Seq(
      "nl" -> "\n",
      "ctl" -> "\u0007",
      "all5" -> "\b \f \n \r \t",
      "bs" -> "\\",
      "acc" -> "árvíztűrőtükörfúrógép",
      "accnl" -> "árvíztűrőtükörfúrógép\n",
      "q" -> "\"text\"",
      "sp" -> "a b",
      "spq" -> "a \"b\" c",
      "spbs" -> "a \\ b",
      "spnl" -> "a \nb"
    ).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))

  private def render(template: String): String =
    frame.select(Template.column(template, frame.columns).cast("string"))
      .head.getString(0)

  test("format-json escaped_text rows (test_utf8utils.c:75-95)") {
    assert(render("$(format-json v=$nl)") == "{\"v\":\"\\n\"}")
    // \x07 -> \u0007 in text mode
    assert(render("$(format-json v=$ctl)") == "{\"v\":\"\\u0007\"}")
    // all five named control escapes, incl \b and \f (NOT \u0008/\u000c)
    assert(render("$(format-json v=$all5)") == "{\"v\":\"\\b \\f \\n \\r \\t\"}")
    assert(render("$(format-json v=$bs)") == "{\"v\":\"\\\\\"}")
    // multi-byte UTF-8 reproduced as-is
    assert(render("$(format-json v=$acc)") == "{\"v\":\"árvíztűrőtükörfúrógép\"}")
    assert(render("$(format-json v=$accnl)") == "{\"v\":\"árvíztűrőtükörfúrógép\\n\"}")
    // the JSON quote is the unsafe char
    assert(render("$(format-json v=$q)") == "{\"v\":\"\\\"text\\\"\"}")
  }

  test("format-welf escaped_binary rows (test_utf8utils.c:38-61)") {
    // unquoted branch (no space): controls escape, quote untouched
    assert(render("$(format-welf v=$nl)") == "v=\\n")
    assert(render("$(format-welf v=$ctl)") == "v=\\x07") // \x%02x, not \u
    assert(render("$(format-welf v=$bs)") == "v=\\\\")
    assert(render("$(format-welf v=$q)") == "v=\"text\"")
    assert(render("$(format-welf v=$acc)") == "v=árvíztűrőtükörfúrógép")
    // quoted branch (value contains a space): quote becomes unsafe
    assert(render("$(format-welf v=$sp)") == "v=\"a b\"")
    assert(render("$(format-welf v=$spq)") == "v=\"a \\\"b\\\" c\"")
    assert(render("$(format-welf v=$spbs)") == "v=\"a \\\\ b\"")
    assert(render("$(format-welf v=$spnl)") == "v=\"a \\nb\"")
  }
}
