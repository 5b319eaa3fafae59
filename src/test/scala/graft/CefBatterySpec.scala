package graft

import graft.template.Template
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The format-cef-extension battery, ported from
  * `/root/reference/modules/cef/tests/test-format-cef-extension.c`:
  * --subkeys prefix selection/stripping, strict alphanumeric key
  * validation with on-error drop-message vs drop-property, and the
  * exact value escaping (= \n \r \\ backslashed, NUL as \x00, other
  * control chars as \u%04x). Invalid-UTF-8-byte cases don't map to
  * decoded JVM strings — declared divergence. */
class CefBatterySpec extends GraftSuite {
  import spark.implicits._

  private def frameWith(kv: (String, String)*): DataFrame =
    Seq(1).toDF("one").drop("one")
      .withColumn("host", lit("bzorp"))
      .withColumn("program", lit("syslog-ng"))
      .withColumn("pid", lit("23323"))
      .withColumn("message", lit("m"))
      .withColumn("facility", lit(19))
      .withColumn("severity", lit(3))
      .withColumn("ts", to_timestamp(lit("2006-02-11 10:34:56")))
      .withColumn("tags", array().cast("array<string>"))
      .withColumn("values", map(kv.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))

  private def render(t: String, kv: (String, String)*): String = {
    val df = frameWith(kv: _*)
    df.select(Template.column(t, df.columns).cast("string")).head.getString(0)
  }

  private def cef(kv: (String, String)*): String =
    render("$(format-cef-extension --subkeys .cef.)", kv: _*)

  test("subkeys select the prefix and strip it (test-format-cef-extension.c:150-158)") {
    assert(cef(".cef.k" -> "v") == "k=v")
    assert(render("$(format-cef-extension --subkeys .cef. .cef.k=v)") == "k=v")
    assert(cef(".cef.act" -> "blocked a ping") == "act=blocked a ping")
    assert(render("$(format-cef-extension --subkeys ..)", "..k" -> "v") == "k=v")
    assert(render("$(format-cef-extension --subkeys ,)", ",k" -> "v") == "k=v")
    assert(render("$(format-cef-extension --subkeys .cef.)", "k" -> "v") == "")
    assert(render("$(format-cef-extension --subkeys ' ')", " k" -> "v") == "k=v")
    assert(render("$(format-cef-extension x=y)", "k" -> "v") == "x=y")
    assert(render("$(format-cef-extension)", "k" -> "v") == "")
  }

  test("multiple properties join with spaces, sorted (test-format-cef-extension.c:116-128)") {
    assert(cef(".cef.k" -> "v", ".cef.x" -> "y") == "k=v x=y")
    assert(cef(".cef.k" -> "v v", ".cef.x" -> "y y") == "k=v v x=y y")
  }

  test("value escaping matrix (test-format-cef-extension.c:101-193)") {
    assert(cef(".cef.act" -> "\\") == "act=\\\\")
    assert(cef(".cef.act" -> "\\\\") == "act=\\\\\\\\")
    assert(cef(".cef.act" -> "=") == "act=\\=")
    assert(cef(".cef.act" -> "|") == "act=|")
    assert(cef(".cef.act" -> "\t") == "act=\\u0009")
    assert(cef(".cef.act" -> "\n") == "act=\\n")
    assert(cef(".cef.act" -> "\r") == "act=\\r")
    assert(cef(".cef.act" -> "v\n") == "act=v\\n")
    assert(cef(".cef.act" -> "u\nv") == "act=u\\nv")
    assert(cef(".cef.act" -> "\r\n") == "act=\\r\\n")
    assert(cef(".cef.act" -> "this is a long value = something") ==
      "act=this is a long value \\= something")
    assert(cef(".cef.k" -> "a\u0000b") == "k=a\\x00b")
    assert(cef(".cef.k" -> "árvíztűrőtükörfúrógép") == "k=árvíztűrőtükörfúrógép")
  }

  test("invalid keys drop the message, or the property under drop-property (test-format-cef-extension.c:130-193)") {
    // default on-error drop-message: an invalid key empties the result
    assert(cef(".cef.k=w" -> "v") == "")
    assert(cef(".cef.k|w" -> "v") == "")
    assert(cef(".cef.k\nw" -> "v") == "")
    assert(cef(".cef.k w" -> "v") == "")
    assert(cef(".cef.árvíztűrőtükörfúrógép" -> "v") == "")
    // drop-property keeps the valid pairs
    assert(render(
      "$(format-cef-extension --on-error drop-property --subkeys .cef.)",
      ".cef.k w" -> "v", ".cef.good" -> "v") == "good=v")
  }

  test("--subkeys argument errors carry the reference texts (test-format-cef-extension.c:208-214)") {
    val df = frameWith(".cef.k" -> "v")
    def fails(t: String, msg: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        df.select(Template.column(t, df.columns)).head
      }
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    fails("$(format-cef-extension --subkeys)", "Missing argument for --subkeys")
    fails("$(format-cef-extension --subkeys '')",
      "--subkeys requires a non-empty argument")
  }
}
