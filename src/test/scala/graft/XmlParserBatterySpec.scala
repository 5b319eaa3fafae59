package graft

import graft.config.{ConfigCompiler, ConfigParser}
import org.apache.spark.sql.functions._

/** The xml-parser battery, ported from
  * `/root/reference/modules/xml/tests/test_xml_parser.c`: invalid
  * inputs (incl. root sequences with loose text), dot-path/attr
  * naming, the one-push-per-element text model, create-lists str-repr
  * quoting, exclude-tag globs, strip-whitespaces, prefix forms, and
  * drop-invalid through the config front end.
  */
class XmlParserBatterySpec extends GraftSuite {
  import spark.implicits._

  private def parse(input: String, prefix: String = ".xml",
      exclude: Seq[String] = Nil, strip: Boolean = false,
      lists: Boolean = true): Option[Map[String, String]] = {
    val df = Seq(input).toDF("s")
    val r = df.select(graft.functions.XmlFlatten(col("s"), prefix, exclude,
      strip, lists).as("m")).head
    if (r.isNullAt(0)) None else Some(r.getMap[String, String](0).toMap)
  }

  private def value(input: String, key: String,
      exclude: Seq[String] = Nil, lists: Boolean = true): String =
    parse(input, exclude = exclude, lists = lists)
      .flatMap(_.get(key)).getOrElse("")

  test("invalid inputs fail the parse (test_xml_parser.c:81-115)") {
    val invalid = Seq(
      "simple string",
      "<tag></missingtag>",
      "<tag></tag></extraclosetag>",
      "<tag><tag></tag>",
      "<tag1><tag2>closewrongorder</tag1></tag2>",
      "<tag id=\"missingquote></tag>",
      "<tag id='missingquote></tag>",
      "<tag id=missingquote\"></tag>",
      "<tag id=missingquote'></tag>",
      "<space in tag/>",
      "</>",
      "<tag></tag>>")
    invalid.foreach(in => assert(parse(in).isEmpty, in))
  }

  test("valid inputs: dot paths, attrs, one-push-per-element text (test_xml_parser.c:126-136)") {
    assert(value("<tag1>value1</tag1>", ".xml.tag1") == "value1")
    assert(value("<tag1 attr='attr_value'>value1</tag1>", ".xml.tag1._attr") == "attr_value")
    assert(value("<tag1><tag2>value2</tag2></tag1>", ".xml.tag1.tag2") == "value2")
    assert(value("<tag1>part1<tag2>value2</tag2>part2</tag1>", ".xml.tag1") == "part1part2")
    assert(value("<tag1><tag11></tag11><tag12><tag121>value</tag121></tag12></tag1>",
      ".xml.tag1.tag12.tag121") == "value")
    val attrs = "<tag1><tag11></tag11><tag12><tag121 attr1='1' attr2='2'>value</tag121></tag12></tag1>"
    assert(value(attrs, ".xml.tag1.tag12.tag121._attr1") == "1")
    assert(value(attrs, ".xml.tag1.tag12.tag121._attr2") == "2")
    assert(value("<tag1><tag1>t11.1</tag1><tag1>t11.2</tag1></tag1>",
      ".xml.tag1.tag1") == "t11.1,t11.2")
  }

  test("create-lists str-repr quoting battery (test_xml_parser.c:171-215)") {
    assert(value("<tag1><simple_namevalue> value,2 </simple_namevalue></tag1>",
      ".xml.tag1.simple_namevalue", lists = false) == " value,2 ")
    assert(value("<tag1><simple_namevalue> value,2 </simple_namevalue></tag1>",
      ".xml.tag1.simple_namevalue") == "\" value,2 \"")
    assert(value("<events><data>1</data><data> 2 </data></events>",
      ".xml.events.data") == "1,\" 2 \"")
    assert(value("<events><data>1</data><data> 2 </data><data>3,</data><data>4</data></events>",
      ".xml.events.data") == "1,\" 2 \",\"3,\",4")
    assert(value("<noquotes><data>one</data><data>two</data><data>three</data></noquotes>",
      ".xml.noquotes.data") == "one,two,three")
    assert(value("<array><data>,first element</data><data>second element</data><data>Third element</data></array>",
      ".xml.array.data") ==
      "\",first element\",\"second element\",\"Third element\"")
    assert(value("<array><data>\"Quoted elements escaped with single-quote\"</data><data>unquoted with double-quotes</data></array>",
      ".xml.array.data") ==
      "'\"Quoted elements escaped with single-quote\"',\"unquoted with double-quotes\"")
    assert(value("<array><data>'Single quoted becomes quoted'</data><data>simple</data></array>",
      ".xml.array.data") == "\"'Single quoted becomes quoted'\",simple")
    assert(value("<events><data>first</data><data>second</data></events>",
      ".xml.events.data", lists = false) == "firstsecond")
    assert(value("<events><data>first</data><data>second, long entry</data></events>",
      ".xml.events.data", lists = false) == "firstsecond, long entry")
  }

  test("single exclude-tag globs (test_xml_parser.c:272-314)") {
    val in = "<longtag>Text</longtag>"
    val negative = Seq("longtag", "longt?g", "?ongtag", "longta?", "lon?ta?",
      "longt*", "*tag", "lo*gtag", "long*ag", "*")
    negative.foreach(p =>
      assert(value(in, ".xml.longtag", exclude = Seq(p)) == "", p))
    val positive = Seq("longtag_break", "longt?g_break", "?ongtag_break",
      "longta?_break", "lon?ta?_break", "break_longt*", "lo*gtag_break",
      "break_long*ag", "*tag_break")
    positive.foreach(p =>
      assert(value(in, ".xml.longtag", exclude = Seq(p)) == "Text", p))

    val nested = "<longtag>Outer<inner>Inner</inner></longtag>"
    assert(value(nested, ".xml.longtag", exclude = Seq("inner")) == "Outer")
    assert(value(nested, ".xml.longtag.inner", exclude = Seq("inner")) == "")

    val seq2 = "<exclude>excude1Text</exclude><notexclude>notexcludeText<exclude>excude2Text</exclude></notexclude>"
    assert(value(seq2, ".xml.exclude", exclude = Seq("exclude")) == "")
    assert(value(seq2, ".xml.notexclude.exclude", exclude = Seq("exclude")) == "")
    assert(value(seq2, ".xml.notexclude", exclude = Seq("exclude")) == "notexcludeText")
  }

  test("multiple exclude-tags (test_xml_parser.c:346-380)") {
    val m = parse(
      "<tag1>Text1</tag1><tag2>Text2</tag2><tag3>Text3<innertag>TextInner</innertag></tag3>",
      exclude = Seq("tag1", "tag2", "inner*")).get
    assert(m.getOrElse(".xml.tag1", "") == "")
    assert(m.getOrElse(".xml.tag2", "") == "")
    assert(m(".xml.tag3") == "Text3")
    assert(m.getOrElse(".xml.tag3.innertag", "") == "")
  }

  test("strip-whitespaces strips each text run (test_xml_parser.c:382-403; same case is the scanner-level test_xml_scanner.c:156-177)") {
    assert(parse("<tag> \n\t part1 <tag2/> part2 \n\n</tag>", strip = true)
      .get(".xml.tag") == "part1part2")
  }

  test("prefix forms incl. compacted trailing dot (test_xml_parser.c:413-426)") {
    assert(value("<tag>default_prefix</tag>", ".xml.tag") == "default_prefix")
    assert(parse("<tag>foo</tag>", prefix = "").get("tag") == "foo")
    assert(parse("<tag>foobar</tag>", prefix = ".xmlparser").get(".xmlparser.tag") == "foobar")
    assert(parse("<tag>baz</tag>", prefix = ".meta.").get(".meta.tag") == "baz")
    assert(parse("<top><t1>asd</t1><t2>jkl</t2></top>", prefix = "").get("top.t2") == "jkl")
    assert(parse("<top><t1>1</t1><t2><t3>3</t3></t2></top>", prefix = "").get("top.t2.t3") == "3")
    assert(parse("<top><t1>1</t1><t2><t3>3</t3></t2><misc>value</misc></top>",
      prefix = "").get("top.misc") == "value")
  }

  test("drop-invalid through the config front end (test_xml_parser.c:243-260)") {
    val logs = Seq("<tag>ok</tag>", "<tag>").toDF("message")
    def run(dropInvalid: String): Long = {
      val cfg = ConfigParser.parse(s"""
        source s { file("/x"); };
        parser p { xml-parser(prefix(".xml") drop-invalid($dropInvalid)); };
        destination d { file("/out"); };
        log { source(s); parser(p); destination(d); };
      """)
      ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df.count()
    }
    assert(run("no") == 2)  // forward-invalid: message passes unparsed
    assert(run("yes") == 1)
  }
}
