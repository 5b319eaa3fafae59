package graft

import graft.functions.JsonFlatten
import graft.operators.Parsers
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ParsersSpec extends GraftSuite {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): Row =
    Seq(input).toDF("s").select(c.as("r")).head

  test("csvParse with double-char quoting") {
    val r = one(Parsers.csvParse(col("s"), Seq("a", "b", "c")),
      """x,"say ""hi"", ok",z""")
    assert(r.getStruct(0).toSeq == Seq("x", """say "hi", ok""", "z"))
  }

  test("csvParse backslash dialect and null-value") {
    // escape dialects govern quoting inside quoted fields (csv-scanner.h:33)
    val r = one(Parsers.csvParse(col("s"), Seq("a", "b"), dialect = Parsers.EscapeBackslash,
      nullValue = Some("-")), "\"a\\\"1\",-")
    assert(r.getStruct(0).getString(0) == "a\"1")
    assert(r.getStruct(0).isNullAt(1))
  }

  test("csv battery from the reference's test_csvparser.c") {
    // modules/csvparser/tests/test_csvparser.c:55-135 — the
    // string-delims cases (delimiters(strings(...)) splits on whole
    // multi-char strings before single chars)
    def splitVals(msg: String, delims: String, strs: Seq[String]): Seq[String] =
      one(Parsers.csvSplit(col("s"), Seq("c1", "c2", "c3"), delims,
          stringDelims = strs), msg)
        .getStruct(0).toSeq.asInstanceOf[Seq[String]].filter(_ != null)
    // string delim present; single-char delim also inside the string
    assert(splitVals("PTHREAD support :initialized", " ", Seq(" :")) ==
      Seq("PTHREAD", "support", "initialized"))
    // string delim + a char delim not in the string
    assert(splitVals("PTHREAD,support :initialized", ",", Seq(" :")) ==
      Seq("PTHREAD", "support", "initialized"))
    // multi-char delim set overlapping the string delim
    assert(splitVals("PTHREAD support :initialized", " :", Seq(" :")) ==
      Seq("PTHREAD", "support", "initialized"))
    // multi-char delim set disjoint from the string delim
    assert(splitVals("PTHREAD,support :initialized", ";,", Seq(" :")) ==
      Seq("PTHREAD", "support", "initialized"))
  }

  test("csvSplit greedy keeps the rest in the last column") {
    val r = one(Parsers.csvSplit(col("s"), Seq("p1", "p2", "rest"), " ", greedy = true),
      "alpha beta gamma delta")
    assert(r.getStruct(0).toSeq == Seq("alpha", "beta", "gamma delta"))
  }

  test("csvSplit multi-delimiter + strip-whitespace") {
    val r = one(Parsers.csvSplit(col("s"), Seq("a", "b", "c"), ",;",
      stripWhitespace = true), "x ; y , z ")
    assert(r.getStruct(0).toSeq == Seq("x", "y", "z"))
  }

  test("kvParse quoted values, stray words, prefix") {
    // kv-scanner.c: unquoted values extend across spaces until the next
    // `key=` lookahead (test_kv_scanner.c "foo=bar lorem ipsum key=value"),
    // so trailing non-key words belong to the preceding value, and only
    // text BEFORE the first pair is stray
    val in = "connect user=joe ok pass='p w' dst=1.2.3.4 done"
    val m = one(Parsers.kvParse(col("s"), prefix = ".kv."), in).getMap[String, String](0)
    assert(m == Map(".kv.user" -> "joe ok", ".kv.pass" -> "p w",
      ".kv.dst" -> "1.2.3.4 done"))
    val stray = one(Parsers.kvStrayWords(col("s")), in).getString(0)
    assert(stray == "connect")
  }

  test("kv battery from the reference's test_kv_scanner.c") {
    def pairs(in: String, vsep: Char = '=', psep: String = ", "): Seq[(String, String)] =
      one(Parsers.kvParse(col("s"), vsep, "", psep), in)
        .getMap[String, String](0).toSeq.sortBy(_._1)
    // values extend across spaces until the next key=
    assert(pairs("foo=bar lorem ipsum key=value some more values") ==
      Seq("foo" -> "bar lorem ipsum", "key" -> "value some more values"))
    // space tolerated between key and separator; key = valid-charset suffix
    assert(pairs("lorem ipsum/dolor = foo=bar\"") ==
      Seq("dolor" -> "", "foo" -> "bar\""))
    // empty values in any position
    assert(pairs("k= a=b c=d") == Seq("a" -> "b", "c" -> "d", "k" -> ""))
    // comma only separates with the default ", " pair separator
    assert(pairs("key1=value1, key2=value2, key3=value3") ==
      Seq("key1" -> "value1", "key2" -> "value2", "key3" -> "value3"))
    assert(pairs("key1=value1,key2=value2,key3=value3") ==
      Seq("key1" -> "value1,key2=value2,key3=value3"))
    // tab is not a pair boundary
    assert(pairs("key1=value1\tkey2=value2 key3=value3") ==
      Seq("key1" -> "value1\tkey2=value2", "key3" -> "value3"))
    // quoted values: escape decoding, unknown escapes stay verbatim
    assert(pairs("key1=\"\\\"value1\"") == Seq("key1" -> "\"value1"))
    assert(pairs("key1=\"\\b \\f \\n \\r \\t \\\\\"") ==
      Seq("key1" -> "\b \f \n \r \t \\"))
    assert(pairs("key1=\"\\p\"") == Seq("key1" -> "\\p"))
    // mid-value quotes stay literal when the value starts unquoted
    assert(pairs("foo=a \"bar baz\" ") == Seq("foo" -> "a \"bar baz\""))
    // repeated = inside value
    assert(pairs("k===a=b") == Seq("k" -> "==a=b"))
    // explicit pair separator (checkpoint's ';')
    assert(pairs("flags: 133440; ifdir: inbound; loguid: {0x1}", ':', ";") ==
      Seq("flags" -> "133440", "ifdir" -> "inbound", "loguid" -> "{0x1}"))
  }

  test("kvParse repeated key: last occurrence wins, no duplicate map keys") {
    // reference kv-parser overwrites the NV entry (set-value semantics);
    // duplicate MapData keys would also break map_concat under ANSI dedup
    val m = one(Parsers.kvParse(col("s")), "k=1 mid=x k=2").getMap[String, String](0)
    assert(m == Map("k" -> "2", "mid" -> "x"))
  }

  test("kvParse escaped quote inside value") {
    val m = one(Parsers.kvParse(col("s")), """k="a\"b" j=2""").getMap[String, String](0)
    assert(m("k") == "a\"b" && m("j") == "2")
  }

  test("auditKvParse hex-decodes unquoted hex values only") {
    // 666F6F20626172 = "foo bar"
    val m = one(Parsers.auditKvParse(col("s")),
      """proctitle=666F6F20626172 exe="/bin/EF" key=BEEF""").getMap[String, String](0)
    assert(m("proctitle") == "foo bar")
    assert(m("exe") == "/bin/EF") // quoted => literal
    assert(m("key") == "BEEF") // field not in the hexcoded set
  }

  test("audit hexdump battery (modules/kvformat/tests/test_linux_audit_scanner.c)") {
    def audit(line: String): Map[String, String] =
      one(Parsers.auditKvParse(col("s")), line).getMap[String, String](0).toMap
    // all-printable decode would not have been escaped by the kernel
    assert(audit("proctitle=41607E")("proctitle") == "41607E")
    assert(audit("proctitle=412042")("proctitle") == "A B")
    // multi-byte UTF-8 decodes
    assert(audit("proctitle=C3A17276C3AD7A74C5B172C59174C3BC6BC3B67266C3BA72C3B367C3A970")("proctitle") ==
      "árvíztűrőtükörfúrógép")
    // NUL separators become TABs
    assert(audit("proctitle=2F62696E2F7368002D65002F6574632F696E69742E642F706F737466697800737461747573")("proctitle") ==
      "/bin/sh\t-e\t/etc/init.d/postfix\tstatus")
    // aN argv registers hex-decode by pattern
    assert(audit("a1=2F62696E2F7368202D6C")("a1") == "/bin/sh -l")
    // odd-length hex stays raw
    assert(audit("proctitle=41204")("proctitle") == "41204")
  }

  test("strftime conversion") {
    assert(Parsers.strftimeToJava("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss")
    assert(Parsers.strftimeToJava("%b %d %H:%M:%S") == "MMM dd HH:mm:ss")
    assert(Parsers.strftimeToJava("%d/%b/%Y:%H:%M:%S %z") == "dd/MMM/yyyy:HH:mm:ss XXX")
    assert(Parsers.strftimeToJava("100%% %Y") == "100% yyyy")
  }

  test("dateParse with timezone") {
    val r = one(unix_timestamp(
      Parsers.dateParse(col("s"), "%Y-%m-%d %H:%M:%S", Some("Europe/Budapest"))),
      "2024-06-01 12:00:00")
    assert(r.getLong(0) == 1717236000L) // 12:00 CEST = 10:00 UTC
  }

  test("tagsParse and mapValuePairs") {
    val tags = one(Parsers.tagsParse(col("s")), "a,b,,c").getSeq[String](0)
    assert(tags == Seq("a", "b", "c"))
    val m = one(Parsers.mapValuePairs(
      Parsers.kvParse(col("s")), Seq(("foo.*", "bar."), ("x", "y"))),
      "foo.a=1 x=2 z=3").getMap[String, String](0)
    assert(m == Map("bar.a" -> "1", "y" -> "2", "z" -> "3"))
  }

  test("JsonFlatten dot-notation, arrays, scalars") {
    val m = one(JsonFlatten(col("s")),
      """{"a": {"b": 1, "c": "x"}, "arr": [10, {"z": true}], "n": null}""")
      .getMap[String, String](0)
    assert(m == Map("a.b" -> "1", "a.c" -> "x", "arr[0]" -> "10",
      "arr[1].z" -> "true", "n" -> ""))
  }

  test("JsonFlatten prefix and extract-prefix") {
    val in = """{"outer": {"k": 5, "deep": {"q": "v"}}, "skip": 1}"""
    val m = one(JsonFlatten(col("s"), ".json.", ""), in).getMap[String, String](0)
    assert(m.keySet == Set(".json.outer.k", ".json.outer.deep.q", ".json.skip"))
    val ex = one(JsonFlatten(col("s"), "", "outer"), in).getMap[String, String](0)
    assert(ex == Map("k" -> "5", "deep.q" -> "v"))
  }

  test("JsonFlatten malformed json -> null") {
    val r = one(JsonFlatten(col("s")), "{nope")
    assert(r.isNullAt(0))
  }

  test("XmlFlatten tags, attrs, repeated-tag lists (reference default >=3.20)") {
    val m = one(graft.functions.XmlFlatten(col("s")),
      """<ev id="7"><user role="a">joe</user><data>first</data><data>second</data></ev>""")
      .getMap[String, String](0)
    assert(m == Map(".xml.ev._id" -> "7", ".xml.ev.user._role" -> "a",
      ".xml.ev.user" -> "joe", ".xml.ev.data" -> "first,second"))
  }

  test("XmlFlatten create-lists(no) concatenates repeated tags") {
    val m = one(graft.functions.XmlFlatten(col("s"), ".xml", Nil,
        stripWhitespaces = false, createLists = false),
      """<ev><data>first</data><data>second</data></ev>""")
      .getMap[String, String](0)
    assert(m == Map(".xml.ev.data" -> "firstsecond"))
  }

  test("XmlFlatten exclude-tags, strip-whitespaces, invalid -> null") {
    val in = """<a><skipme><x>1</x></skipme><keep> v </keep></a>"""
    val m = one(graft.functions.XmlFlatten(col("s"), ".xml.", Seq("skip*"), true), in)
      .getMap[String, String](0)
    assert(m == Map(".xml.a.keep" -> "v"))
    assert(one(graft.functions.XmlFlatten(col("s")), "<tag></missingtag>").isNullAt(0))
    assert(one(graft.functions.XmlFlatten(col("s")), "simple string").isNullAt(0))
  }
}
