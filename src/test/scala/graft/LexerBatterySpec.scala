package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config.ConfigParser

/** Verbatim port of the reference's config-lexer battery
  * (`/root/reference/lib/tests/test_lexer.c`) onto [[ConfigParser.lex]]
  * — string escape processing (cfg-lex.l:339-352), qstring literalness
  * (cfg-lex.l:353-357), the `<*>\\\r?\n` continuation rule, number
  * forms fed through parse_number_with_suffix (cfg-lex.l:302-322), and
  * comment skipping.
  *
  * Skipped C cases and why:
  *  - LL_DOTDOT / '.'-prefix tokens (test_unquoted_string): severity
  *    ranges like `debug..crit` match the identifier rule IN BOTH
  *    lexers (dots are word chars after the first), so the standalone
  *    `..` token has no grammar surface here; this lexer additionally
  *    admits '$'/'.'-initial words for template/value references.
  *  - block-state cases (LL_BLOCK slicing, `()`-NULL): exercised by
  *    the test_lexer_block.c port (CfgLexerSubstSpec / ConfigSpec
  *    block-definition coverage).
  *  - @include / @define / generator-plugin expansion: ported earlier
  *    (resolveIncludes tests + CfgLexerSubstSpec + expandGenerators).
  *  - location tracking (line/column): this front end does not keep
  *    token locations; semantic tokens only.
  */
class LexerBatterySpec extends AnyFunSuite {

  private def toks(src: String): Vector[(String, String)] =
    ConfigParser.lex(src).map(t => (t.kind, t.text))

  private def str1(src: String): String = {
    val ts = toks(src)
    assert(ts.length == 1 && ts.head._1 == "str", s"expected one string token, got $ts")
    ts.head._2
  }

  // Test(lexer, test_string)
  test("string escapes: named, hex, octal, unknown-drops-backslash") {
    assert(str1("\"test\"") == "test")
    assert(str1("\"test\\x0a\"") == "test\n")
    assert(str1("\"test\\o011\"") == "test\t")
    // "test\n\r\a\t\v\c" -> test NL CR BEL TAB VT 'c'
    assert(str1("\"test\\n\\r\\a\\t\\v\\c\"") == "test\n\r\u0007\t\u000bc")
  }

  test("string escapes: hex cap at 2 digits, octal cap at 3, bare \\x falls through") {
    // \x41 is 'A'; a third hex digit is literal content (cfg-lex.l \x{xdigit}{1,2})
    assert(str1("\"\\x414\"") == "A4")
    // \o101 is 'A'; a fourth octal digit is literal (\o{odigit}{1,3})
    assert(str1("\"\\o1011\"") == "A1")
    // \x with no hex digit after it is the generic \<other> rule -> 'x'
    assert(str1("\"\\xzz\"") == "xzz")
    assert(str1("\"\\o9\"") == "o9")
    // \" embeds a quote, \\ a backslash (both via \<other>)
    assert(str1("\"a\\\"b\\\\c\"") == "a\"b\\c")
    // octal past 0xFF truncates to 8 bits: the reference appends via
    // g_string_append_c(gchar) (cfg-lex.l:345), so \o777 is 0xFF and
    // \o400 is NUL — not U+01FF / U+0100 (r12 advisor)
    assert(str1("\"\\o777\"") == "\u00ff")
    assert(str1("\"a\\o400b\"") == "a\u0000b")
  }

  // Test(lexer, test_qstring)
  test("qstring takes content literally (no escape processing)") {
    assert(str1("'test'") == "test")
    // '"test\n\r"' -> the 11 chars "test\n\r" with BACKSLASHES KEPT
    assert(str1("'\"test\\n\\r\"'") == "\"test\\n\\r\"")
  }

  // Test(lexer, test_multiline_string_literals)
  test("dquote: backslash-newline is a continuation; raw newline is content") {
    assert(str1("\"test another\\\nfoo\"") == "test anotherfoo")
    assert(str1("\"test another\nfoo\"") == "test another\nfoo")
    // CRLF continuation too (<*>\\\r?\n)
    assert(str1("\"test another\\\r\nfoo\"") == "test anotherfoo")
  }

  // Test(lexer, test_multiline_qstring_literals)
  test("qstring: newline and backslash-newline are both kept literally") {
    assert(str1("'test another\nfoo'") == "test another\nfoo")
    assert(str1("'test another\\\nfoo'") == "test another\\\nfoo")
  }

  // Test(lexer, test_lexer_others) — numbers through parse_number_with_suffix
  test("number forms: float, decimal, hex, octal, signed") {
    val ts = toks("4.2 12 0x50 011 +12 -12 -4.2 +4.2")
    assert(ts.map(_._1).forall(_ == "num"), s"all numbers: $ts")
    // integer forms normalize through parse_number_with_suffix (so
    // "+12" -> 12 like the C's strtoll); float TEXT is kept verbatim
    // for the later float parse, sign included
    assert(ts.map(_._2) ==
      Vector("4.2", "12", "80", "9", "12", "-12", "-4.2", "+4.2"))
  }

  // Test(lexer, test_lexer_others) — comment + identifier + punctuation
  test("comments are skipped; identifiers and punctuation tokenize") {
    assert(toks("#This is a full line comment\nfoobar") ==
      Vector(("word", "foobar")))
    assert(toks("test_value") == Vector(("word", "test_value")))
    val punct = toks("(){};,")
    assert(punct.map(_._1) == Vector("(", ")", "{", "}", ";", ","))
  }

  // Test(lexer, at_version_stores_config_version_in_parsed_version_in_hex_form)
  test("@version parses to hex-form code; 'current' accepted") {
    assert(ConfigParser.versionCode("3.1") == 0x0301)
    assert(ConfigParser.versionCode("3.5") == 0x0305)
    assert(ConfigParser.versionCode("4.8") == 0x0408)
    // VERSION_VALUE_CURRENT resolves to the compiled-in current version
    assert(ConfigParser.versionCode("current") > 0)
  }

  // End-to-end: the lexer rules must survive the full parse path
  test("escape semantics reach parsed option values end-to-end") {
    val cfg = ConfigParser.parse(
      """source s { example-msg-generator(template("a\x41b\o012'c' \d")); };
        |destination d { file('/tmp/lex\n.log'); };
        |log { source(s); destination(d); };
        |""".stripMargin)
    val tmpl = cfg.sources("s").stmts.head.args.collectFirst {
      case ConfigParser.KV("template", Seq(ConfigParser.Lit(v))) => v
    }.get
    assert(tmpl == "aAb\n'c' d")
    val path = cfg.destinations("d").stmts.head.args.collectFirst {
      case ConfigParser.Lit(v) => v
    }.get
    assert(path == "/tmp/lex\\n.log") // qstring: backslash-n literal
  }
}
