package graft

import graft.operators.Enrich
import org.apache.spark.sql.functions._

/** add-contextual-data database battery, ported from
  * `/root/reference/modules/add-contextual-data/tests/
  * test_context_info_db.c`: RFC4180-ish CSV import through the
  * reference's own csv dialect (quote pairs `""`/`''`, double-char
  * escape, strip-whitespace), whole-import failure on any malformed
  * line, verbatim name prefixes, template-valued records evaluated
  * against the message (3.21+ semantics,
  * `contextual-data-record-scanner.c:91-127`), and ignore-case
  * selector merging. */
class ContextInfoDbBatterySpec extends GraftSuite {
  import spark.implicits._

  /** One-message frame mirroring the battery's test message factory
    * (HOST_FROM = "kismacska" comes from libtest's create_sample_message). */
  private def msg(selector: String) =
    Seq((selector, "kismacska")).toDF("sel", "host_from")

  private def enrich(csv: Seq[String], selector: String,
      prefix: String = "", ignoreCase: Boolean = false,
      default: Option[String] = None): Map[String, String] = {
    val recs = Enrich.parseContextDb(csv)
    Enrich.addContextualDataTemplated(msg(selector), recs, col("sel"),
        prefix, default, ignoreCase)
      .select("values").head.getAs[Map[String, String]](0)
  }

  test("valid csv import incl. template value (test_import_with_valid_csv)") {
    val csv = Seq(
      "selector1,name1,value1",
      "selector1,name1.1,value1.1",
      "selector2,name2,value2",
      "selector3,name3,value3",
      "selector3,name3.1,$(echo $HOST_FROM)")
    assert(enrich(csv, "selector1") ==
      Map("name1" -> "value1", "name1.1" -> "value1.1"))
    assert(enrich(csv, "selector2") == Map("name2" -> "value2"))
    // the $(echo $HOST_FROM) value is a TEMPLATE evaluated per message
    assert(enrich(csv, "selector3") ==
      Map("name3" -> "value3", "name3.1" -> "kismacska"))
    assert(enrich(csv, "nonexistent") == Map.empty)
  }

  test("CRLF line endings and blank lines (test_import_from_csv_with_crlf_line_ending)") {
    val csv = Seq("selector1,name1,value1\r", "", "selector1,name1.1,value1.1")
    assert(enrich(csv, "selector1") ==
      Map("name1" -> "value1", "name1.1" -> "value1.1"))
  }

  test("escaped double quote, both quote pairs (test_import_from_csv_with_escaped_double_quote)") {
    assert(enrich(Seq("selector1,name1,\"c\"\"cc\""), "selector1") ==
      Map("name1" -> "c\"cc"))
    assert(enrich(Seq("selector1,name1,'c''cc'"), "selector1") ==
      Map("name1" -> "c'cc"))
  }

  test("invalid csv content fails the whole import (test_import_with_invalid_csv_content)") {
    intercept[IllegalArgumentException] { Enrich.parseContextDb(Seq("xxx")) }
    // one bad line poisons an otherwise-valid file (the db is purged)
    intercept[IllegalArgumentException] {
      Enrich.parseContextDb(Seq("selector1,name1,value1", ",value1.1"))
    }
    // extra trailing data is as fatal as a missing column
    intercept[IllegalArgumentException] {
      Enrich.parseContextDb(Seq("selector1,name1,value1,extra"))
    }
  }

  test("name prefixes are verbatim (test_import_with_prefix)") {
    val csv = Seq("selector1,name1,value1")
    for ((prefix, expected) <- Seq(
        "" -> "name1", "aaa" -> "aaaname1", "aaa." -> "aaa.name1",
        ".aaa." -> ".aaa.name1", "." -> ".name1", "...." -> "....name1"))
      assert(enrich(csv, "selector1", prefix = prefix) ==
        Map(expected -> "value1"), s"prefix '$prefix'")
  }

  test("ignore-case on matches any casing (test_ignore_case_on)") {
    val csv = Seq("LoCaLhOsT,tag1,value1")
    for (s <- Seq("Localhost", "localhost", "localhosT", "LOCALHOST", "LoCaLhOsT"))
      assert(enrich(csv, s, ignoreCase = true) == Map("tag1" -> "value1"), s)
  }

  test("ignore-case off is exact (test_ignore_case_off)") {
    val csv = Seq("LoCaLhOsT,tag1,value1")
    for (s <- Seq("Localhost", "localhost", "localhosT", "LOCALHOST"))
      assert(enrich(csv, s) == Map.empty, s)
    assert(enrich(csv, "LoCaLhOsT") == Map("tag1" -> "value1"))
  }

  test("ignore-case merges case-variant selectors in file order (test_selected_nvpairs_when_ignore_case_on)") {
    val csv = Seq(
      "selector,name1,value1",
      "SeLeCtOr,name2,value2",
      "sElEcToR,name3,value3",
      "another,name4,value4")
    assert(enrich(csv, "SELECTOR", ignoreCase = true) ==
      Map("name1" -> "value1", "name2" -> "value2", "name3" -> "value3"))
    assert(enrich(csv, "another", ignoreCase = true) ==
      Map("name4" -> "value4"))
  }

  test("default-selector applies only when the whole db lacks the selector") {
    val csv = Seq(
      "known,k,v",
      "fallback,f,$(echo $HOST_FROM)")
    assert(enrich(csv, "known", default = Some("fallback")) == Map("k" -> "v"))
    // miss -> the default selector's records, templates included
    assert(enrich(csv, "miss", default = Some("fallback")) ==
      Map("f" -> "kismacska"))
  }

  test("template compile error in a value fails the build") {
    val recs = Enrich.parseContextDb(Seq("s,n,$(no-such-func x)"))
    intercept[Exception] {
      Enrich.addContextualDataTemplated(msg("s"), recs, col("sel"))
        .select("values").head
    }
  }

  test("empty db enriches nothing (test_empty_db)") {
    assert(Enrich.parseContextDb(Seq.empty).isEmpty)
    assert(enrich(Seq.empty, "anything") == Map.empty)
    assert(enrich(Seq.empty, "anything", default = Some("d")) == Map.empty)
  }
}
