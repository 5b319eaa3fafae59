package graft

import graft.functions.ListRepr
import scala.collection.mutable.ArrayBuffer

/** The reference's list-scanner + str-repr batteries, ported
  * case-for-case: `lib/scanner/list-scanner/tests/test_list_scanner.c`
  * and `lib/str-repr/tests/{test_decode.c, test_encode.c}`. Multi-arg
  * scanner inputs replay as comma-joined strings — the scanner treats
  * arg boundaries exactly like delimiters (empty args skip). */
class ListReprBatterySpec extends GraftSuite {

  private def parse(s: String): Seq[String] = {
    val b = new ArrayBuffer[String]
    ListRepr.parse(s, b)
    b.toSeq
  }

  private def encode(e: String): String = {
    val sb = new java.lang.StringBuilder
    ListRepr.encodeElement(e, sb)
    sb.toString
  }

  test("individual items are scanned") {
    assert(parse("foo") == Seq("foo"))
    assert(parse("foo,bar") == Seq("foo", "bar"))
    assert(parse("foo,bar,baz") == Seq("foo", "bar", "baz"))
  }

  test("unquoted empty items are skipped (concatenation-friendly)") {
    assert(parse("") == Nil)
    assert(parse(",foo,bar") == Seq("foo", "bar"))
    assert(parse(",,,,,foo,bar") == Seq("foo", "bar"))
    assert(parse("foo,,bar") == Seq("foo", "bar"))
    assert(parse("foo,") == Seq("foo"))
    // the six-arg case: '' ,foo, bar, ,baz foobar ""
    assert(parse("'',,foo,,bar,,,baz,foobar,\"\"") ==
      Seq("", "foo", "bar", "baz", "foobar", ""))
  }

  test("quoted empty items are parsed as empty values") {
    assert(parse("foo,'',bar") == Seq("foo", "", "bar"))
    assert(parse("foo,\"\",bar") == Seq("foo", "", "bar"))
  }

  test("handles single quotes") {
    assert(parse("'foo'") == Seq("foo"))
    assert(parse("'foo','bar'") == Seq("foo", "bar"))
    assert(parse("'foo,bar'") == Seq("foo,bar"))
    // close-quote not at a delimiter poisons the token to RAW
    assert(parse("'foo''bar'") == Seq("'foo''bar'"))
    assert(parse("'foo'bar") == Seq("'foo'bar"))
  }

  test("handles double quotes") {
    assert(parse("\"foo\"") == Seq("foo"))
    assert(parse("\"\\\"foo\"") == Seq("\"foo"))
    assert(parse("\"foo\",\"bar\"") == Seq("foo", "bar"))
    assert(parse("\"foo,bar\"") == Seq("foo,bar"))
    assert(parse("\"foo\"\"bar\"") == Seq("\"foo\"\"bar\""))
    assert(parse("\"foo\"bar") == Seq("\"foo\"bar"))
  }

  test("malformed quotes stay raw (data over formatting)") {
    assert(parse("'foo") == Seq("'foo"))
    assert(parse("bar,'foo") == Seq("bar", "'foo"))
    // unterminated quote swallows trailing commas
    assert(parse("bar,'foo,") == Seq("bar", "'foo,"))
    assert(parse("\"foo") == Seq("\"foo"))
    assert(parse("bar,\"foo") == Seq("bar", "\"foo"))
    assert(parse("bar,\"foo,") == Seq("bar", "\"foo,"))
  }

  test("str-repr decode: escapes and cross-quote backslash retention") {
    assert(parse("\"al ma\"") == Seq("al ma"))
    assert(parse("\"\\b \\f \\n \\r \\t \\\\\"") == Seq("\b \f \n \r \t \\"))
    // unknown escape keeps its backslash
    assert(parse("\"\\p\"") == Seq("\\p"))
    assert(parse("'al ma'") == Seq("al ma"))
    assert(parse("'\\'value1'") == Seq("'value1"))
    assert(parse("'\\p'") == Seq("\\p"))
    // the OTHER quote's escape keeps the backslash too
    assert(parse("'\\\"x'") == Seq("\\\"x"))
    // junk after a closing quote: raw (test_decode.c malformed)
    assert(parse("'alma'@korte") == Seq("'alma'@korte"))
    assert(parse("alma'") == Seq("alma'"))
    assert(parse("alma\"korte\"") == Seq("alma\"korte\""))
  }

  test("str-repr encode: quote selection and escapes (test_encode.c)") {
    assert(encode("") == "\"\"")
    assert(encode("a") == "a")
    assert(encode("alma") == "alma")
    assert(encode("al\nma") == "\"al\\nma\"")
    assert(encode("foo bar") == "\"foo bar\"")
    // embedded quote picks the OTHER quote, unescaped
    assert(encode("\"value1") == "'\"value1'")
    assert(encode("'value1") == "\"'value1\"")
    assert(encode("\b \f \n \r \t \\") == "\"\\b \\f \\n \\r \\t \\\\\"")
    // forbidden char (the list delimiter) forces quoting
    assert(encode("foo,") == "\"foo,\"")
    // both quote kinds: double quotes with only '"' escaped
    assert(encode("\"'foo,") == "\"\\\"'foo,\"")
  }

  test("encode/decode round-trips every battery value") {
    val values = Seq("", "a", "al ma", "foo,bar", "'quoted'", "\"dquoted\"",
      "\b\f\n\r\t", "back\\slash", "mixed '\" quotes", "tail,")
    for (v <- values) {
      val enc = encode(v)
      assert(parse(enc) == (if (v.isEmpty) Seq("") else Seq(v)), s"value: $v")
    }
  }
}
