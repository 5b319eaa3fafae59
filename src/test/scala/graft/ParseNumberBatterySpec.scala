package graft

import graft.config.{ConfigParser, ParseNumber}
import graft.template.Template
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The parse-number battery, ported from
  * `/root/reference/lib/tests/test_parse_number.c`, plus lexer e2e
  * (suffixed LL_NUMBERs in real config text). */
class ParseNumberBatterySpec extends AnyFunSuite {
  import ParseNumber._

  test("simple numbers parse in every flavor") {
    for (p <- Seq(parseNumber _, parseDecNumber _, parseNumberWithSuffix _)) {
      assert(p("1234") == Some(1234L))
      assert(p("+1234") == Some(1234L))
      assert(p("-1234") == Some(-1234L))
    }
  }

  test("C-like prefixes select base for parse_number") {
    assert(parseNumber("0x20") == Some(32L))
    assert(parseNumber("0xFF") == Some(255L))
    assert(parseNumber("-0x09") == Some(-9L))
    assert(parseNumber("020") == Some(16L))
    assert(parseNumber("-010") == Some(-8L))
    assert(parseNumber("08").isEmpty)
    assert(parseNumber("0A").isEmpty)
    assert(parseNumber("20") == Some(20L))
    assert(parseNumber("FF").isEmpty)
    assert(parseNumber("1FF").isEmpty)
  }

  test("parse_dec_number is strictly base 10") {
    assert(parseDecNumber("1F20").isEmpty)
    assert(parseDecNumber("0x20").isEmpty)
    assert(parseDecNumber("020") == Some(20L))
    assert(parseDecNumber("-010") == Some(-10L))
    assert(parseDecNumber("08") == Some(8L))
    assert(parseDecNumber("0A").isEmpty)
    assert(parseDecNumber("20") == Some(20L))
    assert(parseDecNumber("FF").isEmpty)
  }

  test("exponent suffixes multiply by 1000") {
    assert(parseNumberWithSuffix("1K") == Some(1000L))
    assert(parseNumberWithSuffix("1k") == Some(1000L))
    assert(parseNumberWithSuffix("1m") == Some(1000L * 1000))
    assert(parseNumberWithSuffix("1M") == Some(1000L * 1000))
    assert(parseNumberWithSuffix("1G") == Some(1000L * 1000 * 1000))
    assert(parseNumberWithSuffix("1g") == Some(1000L * 1000 * 1000))
  }

  test("byte units are accepted") {
    assert(parseNumberWithSuffix("1b") == Some(1L))
    assert(parseNumberWithSuffix("1B") == Some(1L))
    assert(parseNumberWithSuffix("1Kb") == Some(1000L))
    assert(parseNumberWithSuffix("1kB") == Some(1000L))
    assert(parseNumberWithSuffix("1mb") == Some(1000L * 1000))
    assert(parseNumberWithSuffix("1MB") == Some(1000L * 1000))
    assert(parseNumberWithSuffix("1Gb") == Some(1000L * 1000 * 1000))
    assert(parseNumberWithSuffix("1gB") == Some(1000L * 1000 * 1000))
  }

  test("the i modifier selects base 2") {
    assert(parseNumberWithSuffix("1Kib") == Some(1024L))
    assert(parseNumberWithSuffix("1kiB") == Some(1024L))
    assert(parseNumberWithSuffix("1Mib") == Some(1024L * 1024))
    assert(parseNumberWithSuffix("1MiB") == Some(1024L * 1024))
    assert(parseNumberWithSuffix("1Gib") == Some(1024L * 1024 * 1024))
    assert(parseNumberWithSuffix("1GiB") == Some(1024L * 1024 * 1024))
    // prefixes still apply under suffixing
    assert(parseNumberWithSuffix("0x20") == Some(32L))
    assert(parseNumberWithSuffix("020") == Some(16L))
    assert(parseNumberWithSuffix("08").isEmpty)
    assert(parseNumberWithSuffix("1ib").isEmpty)
    assert(parseNumberWithSuffix("1z").isEmpty)
  }

  test("config lexer accepts suffixed and based numbers (cfg-lex.l:302-322)") {
    val cfg = ConfigParser.parse("""
      source s { file("/x" log-msg-size(8Kib) pad-size(0x20)); };
      destination d { file("/out"); };
      log { source(s); destination(d); };
    """)
    val f = cfg.sources("s").stmts.head
    val sizes = f.args.collect { case ConfigParser.KV(k, Seq(ConfigParser.Lit(v))) => k -> v }
    assert(sizes.contains("log-msg-size" -> "8192"))
    assert(sizes.contains("pad-size" -> "32"))
  }
}

/** The macro battery, ported from
  * `/root/reference/lib/template/tests/test_macro.c` ($FACILITY by
  * number, the $WEEK Sunday-epoch vs $ISOWEEK ISO-8601 split). */
class MacroBatterySpec extends GraftSuite {
  import spark.implicits._

  private def renderAt(template: String, ts: String, facility: Int = 0): String = {
    val df = Seq(1).toDF("one")
      .withColumn("facility", lit(facility))
      .withColumn("ts", to_timestamp(lit(ts)))
    df.select(Template.column(template, df.columns).cast("string")).head.getString(0)
  }

  test("$FACILITY renders the facility name (test_macro.c:33-49)") {
    assert(renderAt("$FACILITY", "2015-01-01 11:20:50", facility = 6) == "lpr")
  }

  test("$WEEK counts Monday-weeks from Jan 1 (test_macro.c:51-67)") {
    assert(renderAt("$WEEK", "2015-01-01 11:20:50") == "00")
  }

  test("$ISOWEEK follows ISO-8601 (test_macro.c:69-139)") {
    // Thu Jan 1 2015 is in ISO week 01
    assert(renderAt("$ISOWEEK", "2015-01-01 11:20:50") == "01")
    // Thu Dec 31 2015 is still ISO week 53
    assert(renderAt("$ISOWEEK", "2015-12-31 11:20:50") == "53")
    // Fri Jan 1 2016 belongs to the previous year's week 53
    assert(renderAt("$ISOWEEK", "2016-01-01 11:20:50") == "53")
    // Mon Jan 5 2015 starts ISO week 02
    assert(renderAt("$ISOWEEK", "2015-01-05 11:20:50") == "02")
  }
}
