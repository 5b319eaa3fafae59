package graft

import graft.template.Template
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The format-json battery, ported from
  * `/root/reference/modules/json/tests/test_format_json.c` over a frame
  * equivalent to libtest's standard message (PROGRAM=syslog-ng,
  * PID=23323, HOST=bzorp, local3.err, Feb 11 10:34:56, the APP.* /
  * .unix.* / .json.* NV battery). One deliberate divergence: the
  * reference emits object keys in DESCENDING order (its GTree walk);
  * this engine emits ASCENDING — semantically identical JSON, expected
  * strings here are re-ordered accordingly.
  */
class FormatJsonBatterySpec extends GraftSuite {
  import spark.implicits._

  private val Msg = "árvíztűrőtükörfúrógép"

  private lazy val frame: DataFrame = Seq(1).toDF("one").drop("one")
    .withColumn("host", lit("bzorp"))
    .withColumn("program", lit("syslog-ng"))
    .withColumn("pid", lit("23323"))
    .withColumn("message", lit(Msg))
    .withColumn("facility", lit(19)) // local3
    .withColumn("severity", lit(3)) // err
    .withColumn("ts", to_timestamp(lit("2006-02-11 10:34:56")))
    .withColumn("tags",
      array(lit("alma"), lit("korte"), lit("citrom"), lit("tag,containing,comma")))
    .withColumn("sourceip", lit("10.11.12.13"))
    .withColumn("seqnum", lit(999))
    .withColumn("values", map(Seq(
      "APP.VALUE" -> "value", "APP.VALUE2" -> "value", "APP.VALUE3" -> "value",
      "APP.VALUE4" -> "value", "APP.VALUE5" -> "value", "APP.VALUE6" -> "value",
      "APP.VALUE7" -> "value",
      "APP.STRIP1" -> "     value", "APP.STRIP2" -> "value     ",
      "APP.STRIP3" -> "     value     ", "APP.STRIP4" -> "value",
      "APP.STRIP5" -> "", "APP.QVALUE" -> "\"value\"",
      ".unix.uid" -> "1000", ".unix.gid" -> "1000", ".unix.cmd" -> "command",
      ".json.foo" -> "bar",
      ".json.sub.value1" -> "subvalue1", ".json.sub.value2" -> "subvalue2",
      "comma_value" -> "value,with,a,comma",
      "empty_value" -> ""
    ).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))

  private def render(template: String): String =
    frame.select(Template.column(template, frame.columns).cast("string"))
      .head.getString(0)

  private def check(template: String, expected: String): Unit =
    assert(render(template) == expected, template)

  private val Rfc3164Json =
    "{\"DATE\":\"Feb 11 10:34:56\",\"FACILITY\":\"local3\",\"HOST\":\"bzorp\"," +
      s""""MESSAGE":"$Msg","PID":"23323","PRIORITY":"err","PROGRAM":"syslog-ng"}"""

  test("format-json basics (test_format_json.c:52-73)") {
    check("$(format-json MSG=$MSG)", s"""{"MSG":"$Msg"}""")
    check("$(format-json --scope rfc3164)", Rfc3164Json)
    check("$(format-json msg.text=$MSG msg.id=42 host=bzorp)",
      s"""{"host":"bzorp","msg":{"id":"42","text":"$Msg"}}""")
    check("$(format-json msg.text.str=$MSG msg.text.len=42 msg.id=42 host=bzorp)",
      s"""{"host":"bzorp","msg":{"id":"42","text":{"len":"42","str":"$Msg"}}}""")
    check("$(format-json kernel.SUBSYSTEM=pci kernel.DEVICE.type=pci kernel.DEVICE.name=0000:02:00.0 MSGID=801 MESSAGE=test)",
      "{\"MESSAGE\":\"test\",\"MSGID\":\"801\",\"kernel\":{\"DEVICE\":" +
        "{\"name\":\"0000:02:00.0\",\"type\":\"pci\"},\"SUBSYSTEM\":\"pci\"}}")
    check("$(format-json .foo=bar)", "{\"_foo\":\"bar\"}")
    // duplicate scopes dedupe
    check("$(format-json --scope rfc3164,rfc3164)", Rfc3164Json)
    // SDATA enterprise-id dots stay inside one level (vp_walker)
    check("$(format-json sdata.win@18372.4.fruit=\"pear\" sdata.win@18372.4.taste=\"good\")",
      "{\"sdata\":{\"win@18372.4\":{\"fruit\":\"pear\",\"taste\":\"good\"}}}")
  }

  test("format-json scope selected-macros with str-repr quoted tags (test_format_json.c:75)") {
    check("$(format-json --scope selected_macros)",
      "{\"DATE\":\"Feb 11 10:34:56\",\"FACILITY\":\"local3\",\"HOST\":\"bzorp\"," +
        s""""MESSAGE":"$Msg","PID":"23323","PRIORITY":"err","PROGRAM":"syslog-ng",""" +
        "\"SEQNUM\":\"999\",\"SOURCEIP\":\"10.11.12.13\"," +
        "\"TAGS\":\"alma,korte,citrom,\\\"tag,containing,comma\\\"\"}")
  }

  test("format-json --key patterns select from the full NV+macro space (test_format_json.c:77,97-110)") {
    check("$(format-json --key PID)", "{\"PID\":\"23323\"}")
    check("$(format-json --key HOST)", "{\"HOST\":\"bzorp\"}")
    check("$(format-json --key MESSAGE)", s"""{"MESSAGE":"$Msg"}""")
    check("$(format-json --key HOST --key MESSAGE)",
      s"""{"HOST":"bzorp","MESSAGE":"$Msg"}""")
    check("$(format-json --key MSG)", s"""{"MSG":"$Msg"}""")
    check("$(format-json --key DATE)", "{\"DATE\":\"Feb 11 10:34:56\"}")
    check("$(format-json --key PRI)", "{\"PRI\":\"155\"}")
    // scope + key union keeps both MSG and MESSAGE
    check("$(format-json --scope selected-macros --key MSG)",
      "{\"DATE\":\"Feb 11 10:34:56\",\"FACILITY\":\"local3\",\"HOST\":\"bzorp\"," +
        s""""MESSAGE":"$Msg","MSG":"$Msg","PID":"23323","PRIORITY":"err",""" +
        "\"PROGRAM\":\"syslog-ng\",\"SEQNUM\":\"999\",\"SOURCEIP\":\"10.11.12.13\"," +
        "\"TAGS\":\"alma,korte,citrom,\\\"tag,containing,comma\\\"\"}")
    // *.* pulls the dotted NVs: initial dot becomes underscore
    check("$(format-json --scope rfc3164 --key *.*)",
      "{\"APP\":{\"QVALUE\":\"\\\"value\\\"\",\"STRIP1\":\"     value\"," +
        "\"STRIP2\":\"value     \",\"STRIP3\":\"     value     \"," +
        "\"STRIP4\":\"value\",\"STRIP5\":\"\",\"VALUE\":\"value\"," +
        "\"VALUE2\":\"value\",\"VALUE3\":\"value\",\"VALUE4\":\"value\"," +
        "\"VALUE5\":\"value\",\"VALUE6\":\"value\",\"VALUE7\":\"value\"}," +
        "\"DATE\":\"Feb 11 10:34:56\",\"FACILITY\":\"local3\",\"HOST\":\"bzorp\"," +
        s""""MESSAGE":"$Msg","PID":"23323","PRIORITY":"err","PROGRAM":"syslog-ng",""" +
        "\"_json\":{\"foo\":\"bar\",\"sub\":{\"value1\":\"subvalue1\"," +
        "\"value2\":\"subvalue2\"}},\"_unix\":{\"cmd\":\"command\"," +
        "\"gid\":\"1000\",\"uid\":\"1000\"}}")
  }

  test("format-json @-key nesting quirks (test_format_json.c:83-94)") {
    check("$(format-json @program=${PROGRAM})", "{\"@program\":\"syslog-ng\"}")
    check("$(format-json @program.123=${PROGRAM})",
      "{\"@program\":{\"123\":\"syslog-ng\"}}")
    check("$(format-json .@program.123=${PROGRAM})",
      "{\"_@program\":{\"123\":\"syslog-ng\"}}")
    check("$(format-json @.program=${PROGRAM})",
      "{\"@\":{\"program\":\"syslog-ng\"}}")
    check("$(format-json .program.n@me=${PROGRAM})",
      "{\"_program\":{\"n@me\":\"syslog-ng\"}}")
    check("$(format-json .program.@name=${PROGRAM})",
      "{\"_program\":{\"@name\":\"syslog-ng\"}}")
    check("$(format-json --leave-initial-dot .program.@name=${PROGRAM})",
      "{\".program\":{\"@name\":\"syslog-ng\"}}")
    // unset positional key globs add nothing
    check("$(format-json --leave-initial-dot .program.@name=${PROGRAM} .program.foo .program.bar)",
      "{\".program\":{\"@name\":\"syslog-ng\"}}")
    // transforms attach to the last --key pattern and rewrite pairs too
    check("$(format-json .program.@name=${PROGRAM} .program.foo .program.bar --key .program.* --shift-levels 2 --add-prefix _)",
      "{\"_@name\":\"syslog-ng\"}")
  }

  test("format-json --rekey (test_format_json.c:113)") {
    check("$(format-json .msg.text=dotted --rekey .* --shift 1 --add-prefix _)",
      "{\"_msg\":{\"text\":\"dotted\"}}")
  }

  test("format-json --omit-empty-values (test_format_json.c:119)") {
    check("$(format-json --omit-empty-values msg.set=value msg.unset='')",
      "{\"msg\":{\"set\":\"value\"}}")
    check("$(format-json --omit-empty-values msg.set=value --key empty_value)",
      "{\"msg\":{\"set\":\"value\"}}")
    check("$(format-json msg.set=value --key empty_value)",
      "{\"empty_value\":\"\",\"msg\":{\"set\":\"value\"}}")
  }

  test("format-json type hints (test_format_json.c:130)") {
    check("$(format-json i32=int32(1234))", "{\"i32\":1234}")
    check("$(format-json \"i=ifoo(\")", "{\"i\":\"ifoo(\"}")
    check("$(format-json b=boolean(TRUE))", "{\"b\":true}")
    check("$(format-json l=list($comma_value))",
      "{\"l\":[\"value\",\"with\",\"a\",\"comma\"]}")
    check("$(format-json b=literal(whatever))", "{\"b\":whatever}")
    check("$(format-json b=literal($(format-json subkey=bar)))",
      "{\"b\":{\"subkey\":\"bar\"}}")
  }

  test("format-json on-error modes (test_format_json.c:147)") {
    // drop-message (the reference's default template-options mode)
    check("$(format-json x=y bad=boolean(blah) foo=bar)", "")
    check("$(format-json x=y bad=boolean($unsetvalue) foo=bar)", "")
    check("$(format-json x=y bad=int32(blah) foo=bar)", "")
    check("$(format-json x=y bad=int64(blah) foo=bar)", "")
    check("$(format-json x=y bad=double(blah) foo=bar)", "")

    check("$(format-json --on-error drop-property x=y bad=boolean(blah) foo=bar)",
      "{\"foo\":\"bar\",\"x\":\"y\"}")
    check("$(format-json --on-error drop-property x=y bad=boolean(blah))",
      "{\"x\":\"y\"}")
    check("$(format-json --on-error drop-property x=y bad=int32(blah))",
      "{\"x\":\"y\"}")
    check("$(format-json --on-error drop-property x=y bad=int32($unsetvalue))",
      "{\"x\":\"y\"}")

    check("$(format-json --on-error fallback-to-string x=y bad=boolean(blah) foo=bar)",
      "{\"bad\":\"blah\",\"foo\":\"bar\",\"x\":\"y\"}")
    check("$(format-json --on-error fallback-to-string x=y bad=int32(blah))",
      "{\"bad\":\"blah\",\"x\":\"y\"}")
    check("$(format-json --on-error fallback-to-string x=y bad=int32($unsetvalue))",
      "{\"bad\":\"\",\"x\":\"y\"}")
  }

  test("format-json utf8 passthrough (test_format_json.c:193)") {
    val f2 = frame.withColumn("values", map(
      lit("UTF8-C2"), lit("¿ ¶ © ±"),
      lit("UTF8-C3"), lit("È Ð")))
    def r(t: String) =
      f2.select(Template.column(t, f2.columns).cast("string")).head.getString(0)
    assert(r("$(format-json MSG=\"${UTF8-C2}\")") ==
      "{\"MSG\":\"¿ ¶ © ±\"}")
    assert(r("$(format-json MSG=\"${UTF8-C3}\")") == "{\"MSG\":\"È Ð\"}")
  }

  test("format-flat-json keeps keys literal (test_format_json.c:206-242)") {
    check("$(format-flat-json a.b.c1=abc a.b.d=abd a.bc=abc)",
      "{\"a.b.c1\":\"abc\",\"a.b.d\":\"abd\",\"a.bc\":\"abc\"}")
    check("$(format-flat-json a=b c=d)", "{\"a\":\"b\",\"c\":\"d\"}")
    check("$(format-flat-json i32=int32(1234))", "{\"i32\":1234}")
    check("$(format-flat-json \"i=ifoo(\")", "{\"i\":\"ifoo(\"}")
    check("$(format-flat-json b=boolean(TRUE))", "{\"b\":true}")
    check("$(format-flat-json l=list($comma_value))",
      "{\"l\":[\"value\",\"with\",\"a\",\"comma\"]}")
    check("$(format-flat-json b=literal(whatever))", "{\"b\":whatever}")
    check("$(format-flat-json b=literal($(format-flat-json subkey=bar)))",
      "{\"b\":{\"subkey\":\"bar\"}}")
  }

  test("format-welf over the same cmdline (test_format_welf.c:52-62,112-163)") {
    check("$(format-welf MSG=$MSG)", s"MSG=$Msg")
    check("xxx$(format-welf MSG=$MSG)yyy", s"xxxMSG=${Msg}yyy")
    // values with spaces double-quote
    val f2 = frame.withColumn("values", map(Seq(
      "with_space" -> "with space",
      "prefix.key1" -> "value1", "prefix.key2" -> "value2",
      "prefix.exclude1" -> "exclude1", "prefix.exclude2" -> "exclude2")
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))
    def r(t: String) =
      f2.select(Template.column(t, f2.columns).cast("string")).head.getString(0)
    assert(r("$(format-welf --key with_space)") == "with_space=\"with space\"")
    assert(r("$(format-welf --key prefix.key*)") ==
      "prefix.key1=value1 prefix.key2=value2")
    assert(r("$(format-welf --key prefix.key1,prefix.key2)") ==
      "prefix.key1=value1 prefix.key2=value2")
    assert(r("$(format-welf --key prefix.* --exclude prefix.exclude*)") ==
      "prefix.key1=value1 prefix.key2=value2")
    assert(r("$(format-welf --key prefix.* --exclude prefix.exclude1,prefix.exclude2)") ==
      "prefix.key1=value1 prefix.key2=value2")
    assert(r("$(format-welf --key prefix.* --exclude prefix.exclude1 --exclude prefix.exclude2)") ==
      "prefix.key1=value1 prefix.key2=value2")
    assert(r("$(format-welf --key prefix.* --exclude prefix.exclude* --exclude prefix.key2)") ==
      "prefix.key1=value1")
  }

  test("--on-error parse: six accepted modes, junk rejected (test_template_on_error.c)") {
    for (m <- Seq("drop-message", "silently-drop-message", "drop-property",
        "silently-drop-property", "fallback-to-string",
        "silently-fallback-to-string"))
      Template.column(s"$$(format-json --scope nv-pairs --on-error $m)",
        frame.columns) // compiles
    intercept[IllegalArgumentException] {
      Template.column("$(format-json --scope nv-pairs --on-error do-what-i-mean)",
        frame.columns)
    }
  }
}
