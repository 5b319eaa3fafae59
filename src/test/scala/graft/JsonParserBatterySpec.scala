package graft

import graft.functions.{JsonDotNotation, JsonFlatten}
import org.apache.spark.sql.functions._

/** The json-parser and dot-notation batteries, ported from
  * `/root/reference/modules/json/tests/test_json_parser.c` and
  * `test_dot_notation.c` — single-quoted json-c leniency, type
  * representations (%f doubles, exact int64, array[i] keys), marker
  * gating, extract-prefix through the real dot-notation engine.
  */
class JsonParserBatterySpec extends GraftSuite {
  import spark.implicits._

  private def parseMap(json: String, prefix: String = "",
      extractPrefix: String = ""): Option[Map[String, String]] = {
    val row = Seq(json).toDF("j")
      .select(JsonFlatten(col("j"), prefix, extractPrefix).as("m")).head
    if (row.isNullAt(0)) None
    else Some(row.getMap[String, String](0).toMap)
  }

  test("well-formed json lands in the message, with prefix (test_json_parser.c:79-100)") {
    assert(parseMap("{'foo': 'bar'}") == Some(Map("foo" -> "bar")))
    assert(parseMap("{'foo': 'bar'}", ".prefix.") ==
      Some(Map(".prefix.foo" -> "bar")))
  }

  test("marker gating (test_json_parser.c:102-120)") {
    import graft.operators.Scl
    val hit = Scl.jsonWithMarker(
      Seq("@cee: {'foo': 'bar'}").toDF("message"), "@cee:", "")
    assert(hit.select(element_at(col("values"), "foo")).head.getString(0) == "bar")
    val miss = Scl.jsonWithMarker(
      Seq("@cxx: {'foo': 'bar'}").toDF("message"), "@cee:", "")
    // non-matching rows pass through unchanged: no values parsed
    assert(miss.select(size(map_keys(col("values")))).head.getInt(0) == 0)
  }

  test("invalid json fails (test_json_parser.c:122-126)") {
    assert(parseMap("not-valid-json").isEmpty)
  }

  test("type representations (test_json_parser.c:129-148)") {
    val m = parseMap(
      "{'int': 123, 'booltrue': true, 'boolfalse': false, 'double': 1.23, " +
        "'object': {'member1': 'foo', 'member2': 'bar'}, 'array': [1, 2, 3], " +
        "'null': null}", ".prefix.").get
    assert(m(".prefix.int") == "123")
    assert(m(".prefix.booltrue") == "true")
    assert(m(".prefix.boolfalse") == "false")
    assert(m(".prefix.double") == "1.230000")
    assert(m(".prefix.object.member1") == "foo")
    assert(m(".prefix.object.member2") == "bar")
    assert(m(".prefix.array[0]") == "1")
    assert(m(".prefix.array[1]") == "2")
    assert(m(".prefix.array[2]") == "3")
  }

  test("int64 extremes render exactly (test_json_parser.c:150-178)") {
    assert(parseMap("{'int': 9223372036854775807}", ".prefix.").get(".prefix.int")
      == "9223372036854775807")
    assert(parseMap("{'int': -9223372036854775807}", ".prefix.").get(".prefix.int")
      == "-9223372036854775807")
    assert(parseMap("{'int': 1595441285858}", ".prefix.").get(".prefix.int")
      == "1595441285858")
  }

  test("non-object top element fails; extract-prefix reaches it (test_json_parser.c:180-198)") {
    assert(parseMap("[1, 2, 3]").isEmpty)
    assert(parseMap("").isEmpty)
    assert(parseMap("[{'foo':'bar'}, {'bar':'foo'}]", "", "[0]") ==
      Some(Map("foo" -> "bar")))
  }

  // ---- dot-notation engine (test_dot_notation.c) --------------------------

  private def extract(json: String, subscript: String): Option[String] =
    JsonDotNotation.extractString(json, subscript)

  private def canon(json: String): String =
    JsonDotNotation.extractString(json, "").get

  test("dot-notation: empty subscript returns the whole object (test_dot_notation.c:88)") {
    assert(extract("{'foo': 'bar'}", "") == Some(canon("{'foo': 'bar'}")))
  }

  test("dot-notation: missing members and invalid subscripts (test_dot_notation.c:93-110)") {
    // missing members eval to nothing
    assert(extract("{}", "123").isEmpty)
    assert(extract("{}", "foo123_?").isEmpty)
    // invalid array references fail to compile
    assert(JsonDotNotation.compile("foo[1]bar").isEmpty)
    assert(JsonDotNotation.compile("foo[zbc]").isEmpty)
    assert(JsonDotNotation.compile("foo.[0]").isEmpty)
  }

  test("dot-notation: member chains (test_dot_notation.c:112-124)") {
    assert(extract("{'fOo123_': 'bar'}", "fOo123_") == Some("\"bar\""))
    assert(extract("{'foo': 'bar'}", "foo") == Some("\"bar\""))
    assert(extract("{'foo': {'foo': 'bar'}}", "foo") == Some(canon("{'foo': 'bar'}")))
    assert(extract("{'foo': {'foo': 'bar'}}", "foo.foo") == Some("\"bar\""))
    assert(extract("{'foo': {'foo': {'foo': 'bar'}}}", "foo.foo.foo") == Some("\"bar\""))
  }

  test("dot-notation: odd identifiers are valid member names (test_dot_notation.c:126-136)") {
    assert(extract("{'@foo': 'bar'}", "@foo") == Some("\"bar\""))
    assert(extract("{'_foo': 'bar'}", "_foo") == Some("\"bar\""))
    assert(extract("{'foo+4': 'bar'}", "foo+4") == Some("\"bar\""))
    assert(extract("{'foo,bar': 'bar'}", "foo,bar") == Some("\"bar\""))
    assert(extract("{'foo bar': 'bar'}", "foo bar") == Some("\"bar\""))
    assert(extract("{'foo-bar': 'bar'}", "foo-bar") == Some("\"bar\""))
    assert(extract("{'1': 'bar'}", "1") == Some("\"bar\""))
  }

  test("dot-notation: container type mismatches and indexing (test_dot_notation.c:138-168)") {
    assert(extract("[1, 2, 3]", "foo").isEmpty)
    assert(extract("{'foo': 'bar'}", "[0]").isEmpty)
    assert(extract("['foo', 'bar', 'baz']", "[0]") == Some("\"foo\""))
    assert(extract("['foo', 'bar', 'baz']", "[1]") == Some("\"bar\""))
    assert(extract("{'foo': 'bar', 'baz': ['1', '2', '3']}", "baz[2]") == Some("\"3\""))
    assert(extract(
      "{'foo': 'bar', 'baz': [['1','2','3'],['4','5','6'],['7','8','9']]}",
      "baz[0][2]") == Some("\"3\""))
    assert(extract("['foo', 'bar', 'baz']", "[3]").isEmpty)
    assert(JsonDotNotation.compile("[-1]").isEmpty)
  }
}
