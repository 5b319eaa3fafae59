package graft

import graft.functions.{FormatJson, JsonFlatten}
import graft.operators.ValuePairs
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ValuePairsSpec extends GraftSuite {
  import spark.implicits._

  private def m(pairs: (String, String)*): org.apache.spark.sql.Column =
    map(pairs.flatMap(p => Seq(lit(p._1), lit(p._2))): _*)

  private def run(c: org.apache.spark.sql.Column): Row =
    Seq(1).toDF("x").select(c.as("r")).head

  test("select with include/exclude globs, exclusions win") {
    val r = run(ValuePairs.select(m("a.x" -> "1", "a.y" -> "2", "b" -> "3"),
      include = Seq("a.*"), exclude = Seq("*.y"))).getMap[String, String](0)
    assert(r == Map("a.x" -> "1"))
  }

  test("rekey: addPrefix, replacePrefix, shift, shiftLevels") {
    assert(run(ValuePairs.addPrefix(m("k" -> "1"), ".x.")).getMap[String, String](0)
      == Map(".x.k" -> "1"))
    assert(run(ValuePairs.replacePrefix(m(".SDATA.a" -> "1", "other" -> "2"),
      ".SDATA.", ".sd.")).getMap[String, String](0)
      == Map(".sd.a" -> "1", "other" -> "2"))
    assert(run(ValuePairs.shift(m("abcdef" -> "1"), 3)).getMap[String, String](0)
      == Map("def" -> "1"))
    assert(run(ValuePairs.shiftLevels(m("a.b.c" -> "1"), 2)).getMap[String, String](0)
      == Map("c" -> "1"))
  }

  test("formatFlatJson sorts keys and escapes") {
    val r = run(ValuePairs.formatFlatJson(m("b" -> "2", "a" -> "say \"hi\"")))
    assert(r.getString(0) == """{"a":"say \"hi\"","b":"2"}""")
  }

  test("formatJson nests dot keys, object wins over scalar") {
    val r = run(ValuePairs.formatJson(
      m("a.b" -> "1", "a.c.d" -> "x", "a" -> "shadowed", "top" -> "t")))
    assert(r.getString(0) == """{"a":{"b":"1","c":{"d":"x"}},"top":"t"}""")
  }

  test("formatJson shadow check sees past keys sorting between scalar and children") {
    // '-' (45) sorts before '.' (46): "a-x" lands between "a" and "a.b";
    // the scalar "a" must still be shadowed by the object "a"
    val r = run(ValuePairs.formatJson(
      m("a" -> "shadowed", "a-x" -> "1", "a.b" -> "2")))
    assert(r.getString(0) == """{"a-x":"1","a":{"b":"2"}}""")
  }

  test("formatJson round-trips with JsonFlatten") {
    val json = run(ValuePairs.formatJson(
      m("h.q" -> "1", "h.w" -> "2", "z" -> "3"))).getString(0)
    val back = Seq(json).toDF("s").select(JsonFlatten(col("s")).as("m"))
      .head.getMap[String, String](0)
    assert(back == Map("h.q" -> "1", "h.w" -> "2", "z" -> "3"))
  }

  test("formatGraphite: name value timestamp lines, sorted, trailing newline") {
    val r = run(ValuePairs.formatGraphite(
      m("cpu.user" -> "42", "mem.free" -> "1024"), lit(1700000000L)))
    assert(r.getString(0) ==
      "cpu.user 42 1700000000\nmem.free 1024 1700000000\n")
    assert(run(ValuePairs.formatGraphite(
      map().cast("map<string,string>"), lit(1L))).getString(0) == "")
  }

  test("formatWelf: id first, sorted, space-valued quoted") {
    val r = run(ValuePairs.formatWelf(
      m("src" -> "1.2.3.4", "id" -> "fw1", "msg" -> "two words")))
    assert(r.getString(0) == "id=fw1 msg=\"two words\" src=1.2.3.4")
  }

  test("formatCef escapes = and backslash") {
    val r = run(ValuePairs.formatCef(m("k" -> "a=b", "p" -> "c\\d")))
    assert(r.getString(0) == "k=a\\=b p=c\\\\d")
  }

  test("rfc3164 scope + pair()") {
    val base = ValuePairs.rfc3164Scope(lit("h1"), lit("prog"), lit("42"),
      lit("hello"), lit("Jun  1 12:00:00"), lit("daemon"), lit("info"))
    val r = run(ValuePairs.formatWelf(ValuePairs.withPair(
      ValuePairs.select(base, include = Seq("HOST", "PROGRAM")), "id", lit("x"))))
    assert(r.getString(0) == "id=x HOST=h1 PROGRAM=prog")
  }
}
