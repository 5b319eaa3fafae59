package graft

import graft.functions.CsvScan
import org.apache.spark.sql.functions._

/** The reference's CSV scanner + parser batteries, ported case-for-case:
  * `lib/scanner/csv-scanner/tests/test_csv_scanner.c` and
  * `modules/csvparser/tests/test_csvparser.c` (the parser battery runs
  * each case over columns C1..Cn with the full option matrix). Expected
  * values follow the C asserts: a scanned column compares by exact
  * string ("" for a null-value hit), a column past the input end is
  * unset (SQL null here), drop-invalid expects the whole row dropped.
  */
class CsvScannerBatterySpec extends GraftSuite {
  import spark.implicits._

  /** One scan on one input; returns (values per column, valid). */
  private def scan(msg: String, cols: Int, delims: String = ",",
      strDelims: Seq[String] = Nil, quotes: String = "\"\"''",
      dialect: String = "double-char", greedy: Boolean = false,
      strip: Boolean = false, nullValue: Option[String] = None)
      : (Seq[Option[String]], Boolean) = {
    val names = (1 to cols).map(i => s"C$i")
    val r = Seq(msg).toDF("s")
      .select(CsvScan(col("s"), names, delims, strDelims, quotes, dialect,
        greedy, strip, nullValue).as("p"))
      .select((names.map(n => col(s"p.$n")) :+ col("p.valid")): _*)
      .head()
    (names.indices.map(i => Option(r.getString(i))), r.getBoolean(cols))
  }

  private def vals(t: (Seq[Option[String]], Boolean)): Seq[String] =
    t._1.flatten

  test("csv-scanner: simple / empty / partial / greedy (test_csv_scanner.c)") {
    // simple_comma_separate_values
    assert(scan("val1,val2,val3", 3, quotes = "\"\"''", strip = true) ==
      (Seq(Some("val1"), Some("val2"), Some("val3")), true))
    // empty_input_with_some_expected_columns: nothing scanned, incomplete
    assert(scan("", 3) == (Seq(None, None, None), false))
    // partial_input: first two columns scanned, baz unset, NOT complete
    assert(scan("val1,val2", 3) == (Seq(Some("val1"), Some("val2"), None), false))
    // greedy_column: bar takes the raw rest
    assert(scan("foo,bar,baz", 2, greedy = true) ==
      (Seq(Some("foo"), Some("bar,baz")), true))
  }

  test("string delimiters split before the char set (test_csvparser.c:63-135)") {
    assert(vals(scan("PTHREAD support :initialized", 3, " ", Seq(" :"))) ==
      Seq("PTHREAD", "support", "initialized"))
    assert(vals(scan("PTHREAD,support :initialized", 3, ",", Seq(" :"))) ==
      Seq("PTHREAD", "support", "initialized"))
    assert(vals(scan("PTHREAD support :initialized", 3, " :", Seq(" :"))) ==
      Seq("PTHREAD", "support", "initialized"))
    assert(vals(scan("PTHREAD,support :initialized", 3, ";,", Seq(" :"))) ==
      Seq("PTHREAD", "support", "initialized"))
    // empty message + drop-invalid -> no values, invalid
    assert(scan("", 3, " ", Seq(" :")) == (Seq(None, None, None), false))
  }

  test("quotes with string delimiters and per-dialect escapes (:150-200)") {
    assert(vals(scan("'PTHREAD' 'support' :'initialized'", 3, " :", Seq(" :"),
      quotes = "''", dialect = "none")) ==
      Seq("PTHREAD", "support", "initialized"))
    // ESCAPE_BACKSLASH: \' inside '...'
    assert(vals(scan("'PTHRE\\'AD' 'support' :'initialized'", 3, " :", Seq(" :"),
      quotes = "''", dialect = "backslash")) ==
      Seq("PTHRE'AD", "support", "initialized"))
    // ESCAPE_DOUBLE_CHAR: '' inside '...'
    assert(vals(scan("'PTHREAD','sup''port' :'initialized'", 3, ";,", Seq(" :"),
      quotes = "''", dialect = "double-char")) ==
      Seq("PTHREAD", "sup'port", "initialized"))
  }

  test("max-columns / greedy / multi-delim / null-value (:200-260)") {
    assert(scan("PTHREAD support initialized", 3, " ", dialect = "none") ==
      (Seq(Some("PTHREAD"), Some("support"), Some("initialized")), true))
    // 2 columns, no greedy, leftover input -> invalid under drop-invalid
    assert(scan("PTHREAD support initialized", 2, " ", dialect = "none")._2 == false)
    // greedy second column takes the rest
    assert(vals(scan("PTHREAD support initialized", 2, " ", greedy = true,
      dialect = "none")) == Seq("PTHREAD", "support initialized"))
    // multi-char delimiter set
    assert(vals(scan("PTHREAD support initialized", 3, " ,;", dialect = "none")) ==
      Seq("PTHREAD", "support", "initialized"))
    // null-value("support") -> empty string, still SET
    assert(scan("PTHREAD support initialized", 3, " ,;", dialect = "none",
      nullValue = Some("support"))._1 ==
      Seq(Some("PTHREAD"), Some(""), Some("initialized")))
  }

  test("quoting: whole-value quotes, embedded delimiter, unterminated (:260-330)") {
    assert(vals(scan("\"PTHREAD\" \"support\" \"initialized\"", 3, " ",
      dialect = "none")) == Seq("PTHREAD", "support", "initialized"))
    // strip-whitespace strips INSIDE the quotes too
    assert(vals(scan("\"  PTHREAD  \" \" support\" \"initialized \"", 3, " ",
      dialect = "none", strip = true)) ==
      Seq("PTHREAD", "support", "initialized"))
    // quoted delimiter does not split
    assert(vals(scan("\"PTHREAD support\" \"initialized\"", 2, " ",
      dialect = "none")) == Seq("PTHREAD support", "initialized"))
    assert(vals(scan("\"PTHREAD support initialized\"", 1, " ",
      dialect = "none")) == Seq("PTHREAD support initialized"))
    // unterminated quote runs to end of input
    assert(vals(scan("\"PTHREAD support initialized", 1, " ",
      dialect = "none")) == Seq("PTHREAD support initialized"))
  }

  test("escape-backslash dialect matrix (:330-410)") {
    assert(vals(scan("PTHREAD support initialized", 3, " ",
      dialect = "backslash")) == Seq("PTHREAD", "support", "initialized"))
    assert(vals(scan("PTHREAD support initialized", 2, " ",
      dialect = "backslash", greedy = true)) ==
      Seq("PTHREAD", "support initialized"))
    assert(vals(scan("PTHREAD support initialized", 3, " ;,",
      dialect = "backslash")) == Seq("PTHREAD", "support", "initialized"))
    assert(vals(scan("\"PTHREAD\" \"support\" \"initialized\"", 3, " ",
      dialect = "backslash")) == Seq("PTHREAD", "support", "initialized"))
    // greedy rest keeps the RAW text including quotes
    assert(vals(scan("\"PTHREAD\" \"support\" \"initialized\"", 2, " ",
      dialect = "backslash", greedy = true)) ==
      Seq("PTHREAD", "\"support\" \"initialized\""))
    assert(vals(scan("\"  PTHREAD \" \"  support\" \"initialized  \"", 3, " ",
      dialect = "backslash", strip = true)) ==
      Seq("PTHREAD", "support", "initialized"))
  }

  test("program-name split: greedy with drop-invalid (:560-600)") {
    assert(vals(scan("postfix/smtpd", 2, "/", dialect = "none",
      greedy = true)) == Seq("postfix", "smtpd"))
    // too few separators: greedy column has no input -> invalid
    val r = scan("postfix", 3, "/", dialect = "none", greedy = true)
    assert(!r._2)
    assert(vals(scan("postfix/smtpd/ququ", 2, "/", dialect = "none",
      greedy = true)) == Seq("postfix", "smtpd/ququ"))
  }

  test("zabbix greedy rest with repeated delimiters (:603-617)") {
    val msg = "ZabbixConnector.log : 19:55:32,782 INFO  [Thread-2834]     " +
      "- [ZabbixEventSyncCommand] Processing   message " +
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
    assert(vals(scan(msg, 2, " ", dialect = "none", greedy = true)) ==
      Seq("ZabbixConnector.log",
        ": 19:55:32,782 INFO  [Thread-2834]     - [ZabbixEventSyncCommand] " +
        "Processing   message <?xml version=\"1.0\" encoding=\"UTF-8\"?>"))
  }

  test("apache access log: [] quote pair + null-value('-') (:619-712)") {
    val msg = "10.100.20.1 - - [31/Dec/2007:00:17:10 +0100] " +
      "\"GET /cgi-bin/bugzilla/buglist.cgi?keywords_type=allwords&keywords=public&format=simple HTTP/1.1\" " +
      "200 2708 \"-\" " +
      "\"curl/7.15.5 (i4 86-pc-linux-gnu) libcurl/7.15.5 OpenSSL/0.9.8c zlib/1.2.3 libidn/0.6.5\" " +
      "2 bugzilla.balabit"
    val expected = Seq("10.100.20.1", "", "", "31/Dec/2007:00:17:10 +0100",
      "GET /cgi-bin/bugzilla/buglist.cgi?keywords_type=allwords&keywords=public&format=simple HTTP/1.1",
      "200", "2708", "",
      "curl/7.15.5 (i4 86-pc-linux-gnu) libcurl/7.15.5 OpenSSL/0.9.8c zlib/1.2.3 libidn/0.6.5",
      "2", "bugzilla.balabit")
    val full = scan(msg, 11, " ", quotes = "\"\"[]", dialect = "backslash",
      nullValue = Some("-"))
    assert(vals(full) == expected && full._2)
    // 10 columns: last value never scanned, input left -> incomplete
    val ten = scan(msg, 10, " ", quotes = "\"\"[]", dialect = "backslash",
      nullValue = Some("-"))
    assert(vals(ten) == expected.take(10) && !ten._2)
    // 12 columns: C12 unset (input exhausted), incomplete
    val twelve = scan(msg, 12, " ", quotes = "\"\"[]", dialect = "backslash",
      nullValue = Some("-"))
    assert(twelve._1.take(11).flatten == expected && twelve._1(11).isEmpty &&
      !twelve._2)
    // trailing extra field + drop-invalid -> invalid
    assert(!scan(msg + " almafa", 11, " ", quotes = "\"\"[]",
      dialect = "backslash", nullValue = Some("-"))._2)
  }

  test("vhost log: both dialects agree; greedy column may be empty (:735-810)") {
    val msg = "random.vhost 10.0.0.1 - \"GET /index.html HTTP/1.1\" 200"
    val expected = Seq("random.vhost", "10.0.0.1", "",
      "GET /index.html HTTP/1.1", "200")
    for (d <- Seq("none", "backslash")) {
      val r = scan(msg, 5, " ", quotes = "\"\"[]", dialect = d,
        nullValue = Some("-"))
      assert(vals(r) == expected && r._2, d)
      val g = scan(msg, 6, " ", quotes = "\"\"[]", dialect = d,
        greedy = true, nullValue = Some("-"))
      assert(vals(g) == expected :+ "" && g._2, d)
    }
  }

  test("tab-separated with empty fields (:793-825)") {
    val msg = "random.vhost\t10.0.0.1\t-\t\"GET /index.html HTTP/1.1\"\t200"
    assert(scan(msg, 6, "\t", quotes = "\"\"", dialect = "backslash",
      nullValue = Some("-"))._1 ==
      Seq(Some("random.vhost"), Some("10.0.0.1"), Some(""),
        Some("GET /index.html HTTP/1.1"), Some("200"), None))
    val msg2 = "random.vhost\t10.0.0.1\t-\t\"GET /index.html HTTP/1.1\"\t\t200"
    assert(scan(msg2, 7, "\t", quotes = "\"\"", dialect = "backslash",
      nullValue = Some("-"))._1 ==
      Seq(Some("random.vhost"), Some("10.0.0.1"), Some(""),
        Some("GET /index.html HTTP/1.1"), Some(""), Some("200"), None))
  }

  test("config front end: csv-parser drop-invalid + quote-pairs + dialect") {
    import graft.config.{ConfigCompiler, ConfigParser}
    val df = Seq(
      "good,row,three",
      "short,row").toDF("message")
      .withColumn("tags", array().cast("array<string>"))
    val conf = """
      source s { file("/x"); };
      destination d { file("/out"); };
      parser p { csv-parser(columns("a" "b" "c") delimiters(",")
        dialect(escape-none) drop-invalid(yes)); };
      log { source(s); parser(p); destination(d); };
    """
    val out = ConfigCompiler.compile(ConfigParser.parse(conf),
      Map("s" -> df)).head.df
    val rows = out.select("a", "b", "c").collect()
    assert(rows.length == 1)
    assert(rows.head.toSeq == Seq("good", "row", "three"))
  }
}
