package graft

import graft.functions.RegexMatchStore
import graft.operators.{Filters, Scl}
import graft.template.Template
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The PCRE filter battery, ported from
  * `/root/reference/lib/filter/tests/test_filters_regexp.c`: invalid
  * pattern rejection, the full store-matches backref table (named
  * groups, dupnames, participation truncation), the match table over
  * parsed fields, and/or compositions, and the legacy MSGHDR+MSG
  * default match target.
  */
class RegexpFilterBatterySpec extends GraftSuite {
  import spark.implicits._

  private def parsed(msg: String): DataFrame =
    Scl.parseSyslogMessage(Seq(msg).toDF("message"))

  test("invalid patterns fail at filter creation (test_filters_regexp.c:60-87)") {
    val invalid = Seq(
      "((", "(?iana", "(?P<foo_123", "(?P<1>a)", "(?P<!>a)", "(?P<foo!>a)",
      "a[b-a]", "a[", "*a", "(*)b", "a\\", "abc)", "(abc", "a**", ")(",
      "(?<DN>foo)|(?<DN>bar)")
    invalid.foreach { re =>
      assertThrows[Exception](RegexMatchStore.compile(re, dupnames = false))
    }
    // the duplicate-name pattern becomes valid WITH dupnames
    RegexMatchStore.compile("(?<DN>foo)|(?<DN>bar)", dupnames = true)
  }

  /** testcase_with_backref_chk: run match(re flags(store-matches)) on
    * the parsed MESSAGE, assert the verdict and one stored register —
    * digit names resolve via $N templates, other names via values.
    * expected == null asserts the register is UNSET. */
  private def backref(body: String, re: String, name: String,
      expected: String, dupnames: Boolean = false): Unit = {
    val df = Filters.matchStore(
      parsed(s"<15>Oct 15 16:17:01 host openvpn[2499]: $body"),
      re, col("message"), dupnames)
    assert(df.filter(col("matched")).count() == 1, s"$re should match $body")
    val rendered = df.select(
      Template.column("$" + name, df.columns).cast("string")).head.getString(0)
    assert(rendered == Option(expected).getOrElse(""),
      s"$$$name of '$re' on '$body'")
    if (expected == null && name.forall(_.isDigit)) {
      // unset register: really null, not empty-string
      val reg = df.select(try_element_at(col("matches"), lit(name.toInt + 1))).head
      assert(reg.isNullAt(0), s"$$$name of '$re' on '$body' should be unset")
    }
  }

  test("store-matches backref table (test_filters_regexp.c:91-151)") {
    backref("al fa", "(a)(l) (fa)", "1", "a")
    backref("al fa", "(a)(l) (fa)", "0", "al fa")
    backref("al fa", "(a)(l) (fa)", "232", null)
    backref("alma fa", "(?P<a>a)(?P<l>l)(?P<MM>m)(?P<aa>a) (?P<fa>fa)", "MM", "m")
    backref("alma fa", "(?P<a>a)(?P<l>l)(?P<MM>m)(?P<aa>a) (?P<fa>fa)", "aaaa", null)
    backref("alma fa", "(?P<a>a)(?P<l>l)(?P<MM>m)(?P<aa>a) (?P<fa_name>fa)", "fa_name", "fa")
    backref("al fa", "(a)(l) (fa)", "2", "l")
    backref("al fa", "(a)(l) (fa)", "3", "fa")
    backref("al fa", "(a)(l) (fa)", "233", null)
    backref("foobar bar", "(?<foobar>foobar) (?<foo>foo)?(?<bar>bar)", "bar", "bar")
    backref("foobar bar", "(?<foobar>foobar) (?<foo>foo)?(?<bar>bar)", "foobar", "foobar")
    backref("foobar bar", "(?<foobar>foobar) (?<foo>foo)?(?<bar>bar)", "foo", null)
    backref("abc", "((a))", "1", "a")
    backref("abc", "((a))", "2", "a")
    backref("ab", "(a+|b)*", "1", "b")
    backref("ab", "(a+|b){0,}", "1", "b")
    backref("ab", "(a+|b)+", "1", "b")
    backref("ab", "(a+|b){1,}", "1", "b")
    backref("ab", "(a+|b)?", "1", "a")
    backref("ab", "(a+|b){0,1}", "1", "a")
    backref("abbbcd", "([abc])*d", "1", "c")
    backref("abcd", "([abc])*bcd", "1", "a")
    backref("xabyabbbz", "ab*", "0", "ab")
    backref("xayabbbz", "ab*", "0", "a")
    backref("abcdef", "(abc|)ef", "0", "ef")
    backref("abcd", "(a|b)c*d", "1", "b")
    backref("abc", "(ab|ab*)bc", "1", "a")
    backref("abc", "a([bc]*)c*", "1", "bc")
    backref("abcd", "a([bc]*)(c*d)", "2", "d")
    backref("abcd", "a([bc]+)(c*d)", "2", "d")
    backref("abcd", "a([bc]*)(c+d)", "2", "cd")
    backref("alpha", "[a-zA-Z_][a-zA-Z0-9_]*", "0", "alpha")
    backref("abh", "^a(bc+|b[eh])g|.h$", "1", null)
    backref("effgz", "(bc+d$|ef*g.|h?i(j|k))", "1", "effgz")
    backref("effgz", "(bc+d$|ef*g.|h?i(j|k))", "2", null)
    backref("ij", "(bc+d$|ef*g.|h?i(j|k))", "1", "ij")
    backref("ij", "(bc+d$|ef*g.|h?i(j|k))", "2", "j")
    backref("reffgz", "(bc+d$|ef*g.|h?i(j|k))", "1", "effgz")
    backref("reffgz", "(bc+d$|ef*g.|h?i(j|k))", "2", null)
    backref("a", "((((((((((a))))))))))", "10", "a")
    backref("aa", "((((((((((a))))))))))\\10", "0", "aa")
    backref("abcde", "(.*)c(.*)", "1", "ab")
    backref("abcde", "(.*)c(.*)", "2", "de")
    backref("(a, b)", "\\((.*), (.*)\\)", "1", "a")
    backref("(a, b)", "\\((.*), (.*)\\)", "2", "b")
    backref("abcabc", "(abc)\\1", "1", "abc")
    backref("abcabc", "([a-c]*)\\1", "1", "abc")
    backref("a:bc-:de:f", "(?<!-):(.*?)(?<!-):", "1", "bc-:de")
    backref("A", "(?i)(?:(?:(?:(?:(?:(?:(?:(?:(?:(a))))))))))", "1", "A")
    backref("C", "(?i)(?:(?:(?:(?:(?:(?:(?:(?:(?:(a|b|c))))))))))", "1", "C")
    backref("ace", "a(?:b|c|d)(.)", "1", "e")
    backref("ace", "a(?:b|c|d)*(.)", "1", "e")
    backref("ace", "a(?:b|c|d)+?(.)", "1", "e")
    backref("ace", "a(?:b|(c|e){1,2}?|d)+?(.)", "1", "c")
    backref("ace", "a(?:b|(c|e){1,2}?|d)+?(.)", "2", "e")
    // duplicate names with flags(dupnames): last participating wins
    backref("hello foo", "(?<DN>foo)|(?<DN>bar)", "DN", "foo", dupnames = true)
    backref("hello bar", "(?<DN>foo)|(?<DN>bar)", "DN", "bar", dupnames = true)
    backref("foobar", "(?<DN>foo)(?<DN>bar)", "DN", "bar", dupnames = true)
  }

  private def fieldMatch(msg: String, field: String, re: String): Boolean =
    parsed(msg).filter(Filters.matches(re, col(field))).count() == 1

  test("regexp filter table over parsed fields (test_filters_regexp.c:154-238)") {
    val P = ": PTHREAD support initialized"
    assert(fieldMatch(s"<15> openvpn[2501]$P", "program", "^openvpn$"))
    assert(!fieldMatch(s"<15> openvpn[2500]$P", "program", "^open$"))
    assert(fieldMatch(s"<15>Oct 15 16:17:01 host openvpn[2499]$P", "host", "^host$"))
    assert(!fieldMatch(s"<15>Oct 15 16:17:02 host openvpn[2499]$P", "host", "^hos$"))
    assert(!fieldMatch(s"<15>Oct 15 16:17:03 host openvpn[2499]$P", "host", "pthread"))
    assert(fieldMatch(s"<15>Oct 15 16:17:04 host openvpn[2499]$P", "message", "^PTHREAD "))
    assert(fieldMatch(s"<15>Oct 15 16:17:05 host openvpn[2499]$P", "message", "PTHREAD s"))
    assert(!fieldMatch(s"<15>Oct 15 16:17:06 host openvpn[2499]$P", "message", "^PTHREAD$"))
    assert(fieldMatch(s"<15>Oct 15 16:17:07 host openvpn[2499]$P", "message", "(?i)pthread"))

    def m(body: String, re: String): Boolean = {
      val df = Filters.matchStore(
        parsed(s"<15> openvpn[2491]: $body"), re, col("message"))
      df.filter(col("matched")).count() == 1
    }
    assert(m("a", "\\141"))
    assert(m("", "[\\1]"))
    assert(m("abc", "ab*c")); assert(m("abc", "ab*bc"))
    assert(m("abbbbc", "ab{0,}bc")); assert(m("abbc", "ab+bc"))
    assert(!m("abq", "ab+bc"))
    assert(m("abbbbc", "ab{1,3}bc")); assert(!m("abbbbc", "ab{4,5}bc"))
    assert(m("abbc", "ab?bc")); assert(!m("abbbbc", "ab?bc"))
    assert(m("axyzc", "a.*c")); assert(!m("axyzd", "a.*c"))
    assert(!m("abc", "a[bc]d")); assert(m("abd", "a[bc]d"))
    assert(!m("abd", "a[b-d]e")); assert(m("ace", "a[b-d]e"))
    assert(m("a-", "a[-b]")); assert(m("a-", "a[b-]"))
    assert(m("a]", "a]")); assert(m("a]b", "a[]]b"))
    assert(m("aed", "a[^bc]d")); assert(!m("abd", "a[^bc]d"))
    assert(m("adc", "a[^-b]c")); assert(!m("a-c", "a[^-b]c"))
    assert(!m("a]c", "a[^]b]")); assert(m("adc", "a[^]b]c"))
    assert(m("abc", "ab|cd")); assert(m("abcd", "ab|cd"))
    assert(m("a(b", "a\\(b")); assert(m("ab", "a\\(*b")); assert(m("a((b", "a\\(*b"))
    assert(m("a\\b", "a\\\\b"))
    assert(m("abcabc", "a.+?c"))
    assert(!m("effg", "(bc+d$|ef*g.|h?i(j|k))"))
    assert(!m("bcdd", "(bc+d$|ef*g.|h?i(j|k))"))
    assert(m("abad", "a(?!b).")); assert(m("abad", "a(?=d)."))
    assert(m("abad", "a(?=c|d)."))
    assert(!m("a\nb", "a.b")); assert(m("a\nb", "(?s)a.b"))
    assert(m("--ab_cd0123--", "\\w+")); assert(m("--ab_cd0123--", "[\\w]+"))
    assert(m("1234abc5678", "\\D+")); assert(m("1234abc5678", "[\\D]+"))
    assert(m("123abc", "[\\da-fA-F]+"))
    assert(m(" testing!1972", "([\\s]*)([\\S]*)([\\s]*)"))
    assert(m(" testing!1972", "(\\s*)(\\S*)(\\s*)"))
    assert(m("ÿ", "\\xff")); assert(!m("ÿ", "\\x00ff"))
  }

  test("and/or filter composition (test_filters_regexp.c:247-280)") {
    val msg = "<15>Oct 16 16:17:01 host openvpn[2499]: PTHREAD support initialized"
    val df = parsed(msg)
    val target = Filters.matchDefaultTarget(df)
    def hits(re: String) = Filters.matches(re, target)
    // AND over the default MSGHDR+MSG target
    assert(df.filter(hits(" PTHREAD ") && hits("PTHREAD")).count() == 1)
    assert(df.filter(hits(" PTHREAD ") && hits("^PTHREAD$")).count() == 0)
    assert(df.filter(hits("^PTHREAD$") && hits(" PTHREAD ")).count() == 0)
    assert(df.filter(hits(" PAD ") && hits("^PTHREAD$")).count() == 0)
    // OR
    assert(df.filter(hits(" PTHREAD ") || hits("PTHREAD")).count() == 1)
    assert(df.filter(hits(" PTHREAD ") || hits("^PTHREAD$")).count() == 1)
    assert(df.filter(hits("^PTHREAD$") || hits(" PTHREAD ")).count() == 1)
    assert(df.filter(hits(" PAD ") || hits("^PTHREAD$")).count() == 0)
  }

  test("match default target and value()/template() forms (test_filters_regexp.c:283-333)") {
    val msg = "<15>Oct 15 16:17:01 host openvpn[2499]: PTHREAD support initialized"
    val df = parsed(msg)
    val target = Filters.matchDefaultTarget(df)
    assert(df.filter(Filters.matches(" PTHREAD ", target)).count() == 1)
    assert(df.filter(Filters.matches("^openvpn\\[2499\\]: PTHREAD", target)).count() == 1)
    assert(df.filter(Filters.matches("^PTHREAD$", target)).count() == 0)
    assert(df.filter(Filters.matches("(?i)pthread", target)).count() == 1)
    // value() forms
    assert(df.filter(Filters.matches("^PTHREAD", col("message"))).count() == 1)
    assert(df.filter(Filters.matches("^2499", col("pid"))).count() == 1)
    // template() forms
    assert(df.filter(Filters.matches("^2499 openvpn",
      Template.column("$PID $PROGRAM", df.columns))).count() == 1)
  }
}
