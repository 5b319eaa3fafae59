package graft

import graft.patterndb.{PdbLoader, PdbMatcher}
import org.scalatest.funsuite.AnyFunSuite

/** The dbparser end-to-end typed-parser battery, ported case-for-case
  * from `/root/reference/modules/dbparser/tests/test_parsers_e2e.c`:
  * each capture parser embedded in a generated one-pattern ruleset,
  * matched against the WHOLE message (pattern_db_process requires the
  * pattern to consume the message fully). The XML skeleton mirrors the
  * C test's, including the entity-escaped parser params. */
class ParsersE2eBatterySpec extends AnyFunSuite {

  private def matcherFor(pattern: String): PdbMatcher = {
    val xml = s"""<?xml version='1.0' encoding='UTF-8'?>
      <patterndb version='4' pub_date='2010-02-22'>
        <ruleset name='test1_program' id='480de478-d4a6-4a7f-bea4-0c0245d361e1'>
          <patterns><pattern>test</pattern></patterns>
          <rules>
            <rule id='1' class='test1' provider='my'>
              <patterns><pattern>$pattern</pattern></patterns>
            </rule>
          </rules>
        </ruleset>
      </patterndb>"""
    new PdbMatcher(PdbLoader.loadString(xml))
  }

  private def check(rule: String, message: String, expected: Boolean): Unit = {
    val hit = matcherFor(rule).classify("test", message).isDefined
    assert(hit == expected,
      s"rule '$rule' on '$message': got $hit, expected $expected")
  }

  // (rule, message, matches) triplets verbatim from parser_params[]
  private val cases: Seq[(String, String, Boolean)] = Seq(
    ("@ANYSTRING:TEST@", "ab ba ab", true),
    ("@ANYSTRING:TEST@", "1234ab", true),
    ("@ANYSTRING:TEST@", "ab1234", true),
    ("@ANYSTRING:TEST@", "1.2.3.4", true),
    ("@ANYSTRING:TEST@", "ab  1234  ba", true),
    ("@ANYSTRING:TEST@", "&lt;ab ba&gt;", true),
    ("@DOUBLE:TEST@", "1234", true),
    ("@DOUBLE:TEST@", "1234.567", true),
    ("@DOUBLE:TEST@", "1.2.3.4", true),
    ("@DOUBLE:TEST@", "1234ab", true),
    ("@DOUBLE:TEST@", "ab1234", false),
    ("@ESTRING:TEST:endmark@", "ab ba endmark", true),
    ("@ESTRING:TEST:endmark@", "ab ba", false),
    ("@ESTRING:TEST:&gt;@", "ab ba > ab", true),
    ("@ESTRING:TEST:&gt;@", "ab ba", false),
    ("@FLOAT:TEST@", "1234", true),
    ("@FLOAT:TEST@", "1234.567", true),
    ("@FLOAT:TEST@", "1.2.3.4", true),
    ("@FLOAT:TEST@", "1234ab", true),
    ("@FLOAT:TEST@", "ab1234", false),
    ("@SET:TEST: \t@", " a ", true),
    ("@SET:TEST: \t@", "  a ", true),
    ("@SET:TEST: \t@", " \ta ", true),
    ("@SET:TEST: \t@", " \t a ", true),
    ("@SET:TEST: \t@", "ab1234", false),
    ("@OPTIONALSET:TEST: \t@", " a ", true),
    ("@OPTIONALSET:TEST: \t@", "  a ", true),
    ("@OPTIONALSET:TEST: \t@", " \ta ", true),
    ("@OPTIONALSET:TEST: \t@", " \t a ", true),
    ("@OPTIONALSET:TEST: \t@", "ab1234", true),
    ("@IPv4:TEST@", "1.2.3.4", true),
    ("@IPv4:TEST@", "0.0.0.0", true),
    ("@IPv4:TEST@", "255.255.255.255", true),
    ("@IPv4:TEST@", "256.256.256.256", false),
    ("@IPv4:TEST@", "1234", false),
    ("@IPv4:TEST@", "ab1234", false),
    ("@IPv4:TEST@", "ab1.2.3.4", false),
    ("@IPv4:TEST@", "1,2,3,4", false),
    ("@IPv6:TEST@", "2001:0db8:0000:0000:0000:0000:1428:57ab", true),
    ("@IPv6:TEST@", "2001:0db8:0000:0000:0000::1428:57ab", true),
    ("@IPv6:TEST@", "2001:0db8:0:0:0:0:1428:57ab", true),
    ("@IPv6:TEST@", "2001:0db8:0:0::1428:57ab", true),
    ("@IPv6:TEST@", "2001:0db8::1428:57ab", true),
    ("@IPv6:TEST@", "2001:db8::1428:57ab", true),
    ("@IPv6:TEST@", "2001:0db8::34d2::1428:57ab", false),
    ("@NUMBER:TEST@", "1234", true),
    ("@NUMBER:TEST@", "1.2", true),
    ("@NUMBER:TEST@", "1.2.3.4", true),
    ("@NUMBER:TEST@", "1234ab", true),
    ("@NUMBER:TEST@", "ab1234", false),
    ("@QSTRING:TEST:&lt;&gt;@", "<aa bb>", true),
    ("@QSTRING:TEST:&lt;&gt;@", "< aabb >", true),
    ("@QSTRING:TEST:&lt;&gt;@", "aabb>", false),
    ("@QSTRING:TEST:&lt;&gt;@", "<aabb", false),
    ("@STRING:TEST@", "aabb", true),
    ("@STRING:TEST@", "aa bb", true),
    ("@STRING:TEST@", "1234", true),
    ("@STRING:TEST@", "ab1234", true),
    ("@STRING:TEST@", "1234bb", true),
    ("@STRING:TEST@", "1.2.3.4", true))

  test("test_parsers_e2e.c: the full typed-parser match matrix") {
    cases.foreach { case (rule, msg, expected) => check(rule, msg, expected) }
  }

  // capture goldens from test_radix.c test_radix_search_matches
  // (:850-1055), locking the faithful float/email/hostname/lladdr/
  // nlstring parsers and the CRLF literal tolerance
  private def caps(pattern: String, input: String): Option[Map[String, String]] = {
    val tree = graft.patterndb.Radix.build(Seq(("r", "c", pattern)))
    Option(tree.find(input)).map(_._2.toMap)
  }

  test("FLOAT captures incl. exponent forms (test_radix.c:852-933)") {
    assert(caps("@FLOAT:float@", "12345 hihihi").contains(Map("float" -> "12345")))
    assert(caps("@FLOAT:float@", "12345hihihi").contains(Map("float" -> "12345")))
    assert(caps("@FLOAT:float@", "12.345hihihi").contains(Map("float" -> "12.345")))
    assert(caps("@FLOAT:float@", "12.345.hihihi").contains(Map("float" -> "12.345")))
    assert(caps("@FLOAT:float@", "12.345.6hihihi").contains(Map("float" -> "12.345")))
    assert(caps("@FLOAT:float@", "12345.hihihi").contains(Map("float" -> "12345.")))
    assert(caps("@FLOAT:float@", "-12.345 hihihi").contains(Map("float" -> "-12.345")))
    assert(caps("@FLOAT:float@", "-12.345e12 hihihi").contains(Map("float" -> "-12.345e12")))
    assert(caps("@FLOAT:float@", "-12.345e-12 hihihi").contains(Map("float" -> "-12.345e-12")))
    assert(caps("@FLOAT:float@", "12.345e12 hihihi").contains(Map("float" -> "12.345e12")))
    assert(caps("@FLOAT:float@", "12.345E-12 hihihi").contains(Map("float" -> "12.345E-12")))
    assert(caps("@FLOAT:float@", "v12345").isEmpty)
  }

  test("EMAIL with bracket strip (test_radix.c:975-990)") {
    assert(caps("@EMAIL:email:[<]>@", "blint@balabit.hu")
      .contains(Map("email" -> "blint@balabit.hu")))
    assert(caps("@EMAIL:email:[<]>@", "<blint@balabit.hu>")
      .contains(Map("email" -> "blint@balabit.hu")))
    assert(caps("@EMAIL:email:[<]>@", "[blint@balabit.hu]")
      .contains(Map("email" -> "blint@balabit.hu")))
  }

  test("HOSTNAME labels (test_radix.c:991-1001)") {
    assert(caps("@HOSTNAME:hostname@", "www.example.org")
      .contains(Map("hostname" -> "www.example.org")))
    assert(caps("@HOSTNAME:hostname@", "www.example.org. kkk")
      .contains(Map("hostname" -> "www.example.org.")))
  }

  test("LLADDR part-bounded link-layer address (test_radix.c:1002-1013)") {
    assert(caps("@LLADDR:lladdr6:6@", "83:63:25:93:eb:51:aa:bb.iii")
      .contains(Map("lladdr6" -> "83:63:25:93:eb:51")))
    assert(caps("@MACADDR:macaddr@", "82:63:25:93:eb:51.iii")
      .contains(Map("macaddr" -> "82:63:25:93:eb:51")))
  }

  test("NLSTRING + CRLF literal tolerance (test_radix.c:1035-1055)") {
    assert(caps("@NLSTRING:nlstring@\n", "foobar\r\nbaz")
      .contains(Map("nlstring" -> "foobar")))
    assert(caps("@NLSTRING:nlstring@\n", "foobar\nbaz")
      .contains(Map("nlstring" -> "foobar")))
    assert(caps("@NLSTRING:nlstring@\n", "\nbaz")
      .contains(Map("nlstring" -> "")))
    assert(caps("@NLSTRING:nlstring@\n", "\r\nbaz")
      .contains(Map("nlstring" -> "")))
  }

  test("SET whitespace-class captures (test_radix.c:938-963)") {
    assert(caps("@SET:set:  @", " aaa").contains(Map("set" -> " ")))
    assert(caps("@SET:set:  @", "  aaa").contains(Map("set" -> "  ")))
    assert(caps("@OPTIONALSET:set:  @", "aaa").contains(Map("set" -> "")))
  }

  test("pub_date survives the load (test_parsers_e2e.c loader check)") {
    val xml = """<?xml version='1.0' encoding='UTF-8'?>
      <patterndb version='4' pub_date='2010-02-22'>
        <ruleset name='r' id='i'>
          <patterns><pattern>p</pattern></patterns>
        </ruleset>
      </patterndb>"""
    // the loader accepts the skeleton; rulesets parse
    assert(PdbLoader.loadString(xml).nonEmpty)
  }
}
