package graft

import graft.patterndb.Radix
import graft.functions.RadixMatch
import org.apache.spark.sql.functions._

/** Mirrors the reference's radix/patterndb tests
  * (`/root/reference/modules/dbparser/tests/test_radix.c`,
  * `test_patterndb.c`) in spirit: typed parsers, prefix sharing,
  * literal-over-parser preference, full-line anchoring. */
class RadixSpec extends GraftSuite {

  private val sshRules = Seq(
    ("ssh-accept", "security",
      "Accepted @ESTRING:auth_method: @for @ESTRING:username: @from @IPvANY:client_addr@ port @NUMBER:port@ ssh2"),
    ("ssh-fail", "security",
      "Failed password for @ESTRING:username: @from @IPvANY:client_addr@ port @NUMBER:port@ ssh2"),
    ("cron-session", "system",
      "pam_unix(cron:session): session @ESTRING:action: @for user @ANYSTRING:username@"))

  test("typed parser primitives") {
    assert(Radix.parserMatch("NUMBER", "", "12345 rest", 0) == 5)
    assert(Radix.parserMatch("NUMBER", "", "0x1F rest", 0) == 4)
    assert(Radix.parserMatch("NUMBER", "", "abc", 0) == -1)
    assert(Radix.parserMatch("FLOAT", "", "3.14 x", 0) == 4)
    assert(Radix.parserMatch("IPv4", "", "10.0.0.1 port", 0) == 8)
    assert(Radix.parserMatch("IPv4", "", "999.0.0.1", 0) == -1)
    assert(Radix.parserMatch("IPv6", "", "2001:db8::1 x", 0) == 11)
    assert(Radix.parserMatch("MACADDR", "", "00:1a:2b:3c:4d:5e!", 0) == 17)
    assert(Radix.parserMatch("QSTRING", "''", "'hello' x", 0) == 7)
    assert(Radix.parserMatch("ESTRING", ":", "user: x", 0) == 4)
    assert(Radix.parserMatch("SET", "alpha,beta,alphabet", "alphabet!", 0) == 8)
    assert(Radix.parserMatch("EMAIL", "", "a.b@c.org rest", 0) == 9)
    assert(Radix.parserMatch("PCRE", "[a-z]+", "abc123", 0) == 3)
  }

  test("ASCII-only hex digits (g_ascii_isxdigit fidelity)") {
    // Unicode decimal digits (U+0660 ARABIC-INDIC, fullwidth U+FF11) and
    // fullwidth A-F must not parse as hex anywhere (radix.c:345,475,565)
    assert(Radix.parserMatch("NUMBER", "", "0x٠١", 0) == -1)
    assert(Radix.parserMatch("NUMBER", "", "0x1１", 0) == 3) // stops at U+FF11
    assert(Radix.parserMatch("IPv6", "", "٠٠٠٠::1", 0) == -1)
    assert(Radix.parserMatch("IPv6", "", "2001:db８::1", 0) == -1)
    assert(Radix.parserMatch("MACADDR", "", "٠٠0:1a:2b:3c:4d:5e", 0) == -1)
    assert(Radix.parserMatch("LLADDR", "", "a１:bb x", 0) == -1)
  }

  test("EMAIL accepts an empty local part (r_parser_email:280)") {
    assert(Radix.parserMatch("EMAIL", "", "@a.b rest", 0) == 4)
    assert(Radix.parserMatch("EMAIL", "<>", "<@a.b> rest", 0) == 6)
    // but a lone '@' with a one-label host still fails (count < 2)
    assert(Radix.parserMatch("EMAIL", "", "@a rest", 0) == -1)
  }

  test("LLADDR param: leading-digit prefix (r_parser_lladdr:384)") {
    // "6x" parses as 6 parts — matches up to 6 hex pairs
    assert(Radix.parserMatch("LLADDR", "6x", "00:1a:2b:3c:4d:5e:ff rest", 0) == 17)
    // digit-less param -> 0 parts -> never matches
    assert(Radix.parserMatch("LLADDR", "x", "00:1a", 0) == -1)
    // absent param defaults to 20 parts
    assert(Radix.parserMatch("LLADDR", "", "00:1a:2b x", 0) == 8)
    // explicit small count truncates at whole pairs
    assert(Radix.parserMatch("LLADDR", "2", "00:1a:2b:3c", 0) == 5)
  }

  test("radix match with captures") {
    val tree = Radix.build(sshRules)
    val r = tree.find("Accepted password for root from 10.0.0.5 port 22341 ssh2")
    assert(r != null)
    assert(r._1.ruleId == "ssh-accept")
    assert(r._2.toMap == Map(
      "auth_method" -> "password", "username" -> "root",
      "client_addr" -> "10.0.0.5", "port" -> "22341"))
  }

  test("radix shares literal prefixes and anchors the full line") {
    val tree = Radix.build(sshRules)
    assert(tree.find("Failed password for root from 1.2.3.4 port 1 ssh2")._1.ruleId == "ssh-fail")
    // partial line (missing trailing ssh2) must NOT match
    assert(tree.find("Failed password for root from 1.2.3.4 port 1") == null)
    assert(tree.find("totally unrelated") == null)
  }

  test("literal edge preferred over parser edge") {
    val tree = Radix.build(Seq(
      ("lit", "c1", "error 42 occurred"),
      ("num", "c2", "error @NUMBER:code@ occurred")))
    assert(tree.find("error 42 occurred")._1.ruleId == "lit")
    assert(tree.find("error 7 occurred")._1.ruleId == "num")
  }

  test("@@ escapes a literal @") {
    val tree = Radix.build(Seq(("at", "c", "user@@host logged in")))
    assert(tree.find("user@host logged in") != null)
  }

  test("IP capture goldens (reference test_radix.c:285-520)") {
    def ip(pattern: String, input: String): Option[String] = {
      val tree = Radix.build(Seq(("r", "c", pattern)))
      Option(tree.find(input)).flatMap(_._2.toMap.get("ip"))
    }
    // IPv4: consume exactly the address, leave trailing dots/text
    assert(ip("@IPvANY:ip@ huhuhu", "192.168.1.1 huhuhu").contains("192.168.1.1"))
    assert(ip("@IPvANY:ip@. huhuhu", "192.168.1.1. huhuhu").contains("192.168.1.1"))
    assert(ip("@IPv4:ip@huhuhu", "192.168.1.1huhuhu").contains("192.168.1.1"))
    assert(ip("@IPv4:ip@huhuhu", "192.168.1huhuhu").isEmpty) // 3 octets: no match
    assert(ip("@IPv4:ip@ huhuhu", "192.168.1 huhuhu").isEmpty)
    // IPv6 incl. compressed, embedded v4, trailing-dot trim
    assert(ip("@IPvANY:ip@ huhuhu", "abcd:ef01:2345:6789:abcd:ef01:2345:6789 huhuhu")
      .contains("abcd:ef01:2345:6789:abcd:ef01:2345:6789"))
    assert(ip("@IPvANY:ip@ huhuhu", ":: huhuhu").contains("::"))
    assert(ip("@IPvANY:ip@ huhuhu", "0:0:0:0:0:0:13.1.68.3 huhuhu")
      .contains("0:0:0:0:0:0:13.1.68.3"))
    assert(ip("@IPvANY:ip@ huhuhu", "::202.1.68.3 huhuhu").contains("::202.1.68.3"))
    assert(ip("@IPvANY:ip@.huhuhu", "2001:0DB8:0:CD30::.huhuhu")
      .contains("2001:0DB8:0:CD30::"))
  }

  test("NUMBER/SET/QSTRING goldens (test_radix.c:227-278)") {
    def caps(pattern: String, input: String): Option[Map[String, String]] = {
      val tree = Radix.build(Seq(("r", "c", pattern)))
      Option(tree.find(input)).map(_._2.toMap)
    }
    assert(caps("a@NUMBER:szamx@aaa", "a15555aaa")
      .contains(Map("szamx" -> "15555")))
    assert(caps("AAA@SET:set:alma,korte@AAA", "AAAkorteAAA")
      .contains(Map("set" -> "korte")))
    assert(caps("xxx@QSTRING:q:\"@x", "xxx\"quoted\"x")
      .contains(Map("q" -> "quoted")))
    // literal @@ escape
    assert(caps("a@@b@NUMBER:n@", "a@b77").contains(Map("n" -> "77")))
  }

  test("r_parser_string / r_parser_qstring battery (test_parsers.c verbatim)") {
    // _invoke_parser: the matched STRING is the consumed prefix; the
    // QSTRING match drops the delimiting quotes (match.ofs=1, len=-2)
    def pString(s: String, param: String): Option[String] = {
      val n = Radix.parserMatch("STRING", param, s, 0)
      if (n > 0) Some(s.substring(0, n)) else None
    }
    // test_string_parser (test_parsers.c:67-81): param chars are EXTRA
    // allowed characters on top of alnum, not delimiters
    assert(pString("foo", "") == Some("foo"))
    assert(pString("foo bar", "") == Some("foo"))
    assert(pString("foo123 bar", "") == Some("foo123"))
    assert(pString("foo{}", "") == Some("foo"))
    assert(pString("foo[]", "") == Some("foo"))
    assert(pString("foo", "X") == Some("foo"))
    assert(pString("foo=bar", "=") == Some("foo=bar"))
    assert(pString("", "") == None)
    // test_qstring_parser (:105-147): consumed includes the quotes, the
    // capture is the inner span
    def pQ(s: String, quotes: String): Option[(Int, String)] = {
      val n = Radix.parserMatch("QSTRING", quotes, s, 0)
      if (n > 0) Some((n, s.substring(1, n - 1))) else None
    }
    assert(pQ("'foo'", "''") == Some((5, "foo")))
    assert(pQ("\"foo\"", "\"\"") == Some((5, "foo")))
    assert(pQ("{foo}", "{}") == Some((5, "foo")))
  }

  test("RadixMatch expression in a DataFrame plan") {
    import spark.implicits._
    val df = Seq(
      "Accepted publickey for alice from 192.168.1.9 port 2222 ssh2",
      "something else entirely").toDF("message")
    val out = df.select(RadixMatch(col("message"), sshRules).as("m"))
      .select(col("m.rule_id"), col("m.rule_class"),
        element_at(col("m.captures"), "username").as("user"))
      .collect()
    assert(out(0).getString(0) == "ssh-accept")
    assert(out(0).getString(2) == "alice")
    assert(out(1).getString(0) == null)
    assert(out(1).getString(1) == "unknown")
  }
}
