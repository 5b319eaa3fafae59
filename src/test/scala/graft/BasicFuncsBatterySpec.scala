package graft

import graft.config.{ConfigCompiler, ConfigParser}
import graft.template.Template
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The basicfuncs battery, ported from
  * `/root/reference/modules/basicfuncs/tests/test_basicfuncs.c` over a
  * frame equivalent to libtest's standard message
  * (`libtest/cr_template.c:75-133`: PRI 155 = local3.err, HOST=bzorp,
  * PROGRAM=syslog-ng, PID=23323, MSG=árvíztűrőtükörfúrógép,
  * SOURCEIP=10.11.12.13, the APP-prefixed NV battery).
  *
  * Declared divergences from the C battery:
  *  - `$(grep ...)@N` msgref suffixes (per-context-row re-evaluation,
  *    `lib/template/compiler.c` msg-ref) — context functions here are
  *    group-wise Spark aggregates without per-row addressing.
  *  - `$(iterate)`'s cross-invocation mutable state (tf-iterate.c keeps
  *    `current` between template evaluations) — the batch form
  *    `$(iterate tmpl init count)` is spec'd in TemplateSpec instead.
  *  - dns-resolve-ip resolves via the NSS files backend (NssSpec), not
  *    the battery's stubbed resolver hostnames.
  */
class BasicFuncsBatterySpec extends GraftSuite {
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
    .withColumn("values", map(Seq(
      "APP.VALUE" -> "value", "APP.QVALUE" -> "\"value\"",
      "APP.STRIP1" -> "     value", "APP.STRIP2" -> "value     ",
      "APP.STRIP3" -> "     value     ", "APP.STRIP4" -> "value",
      "APP.STRIP5" -> "",
      "comma_value" -> "value,with,a,comma",
      "template_name" -> "dummy"
    ).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))

  private val DummyTemplates = Map("dummy" -> "dummy template expanded $HOST")

  private def render(template: String): String =
    frame.select(Template.column(template, frame.columns,
        templates = DummyTemplates).cast("string"))
      .head.getString(0)

  private def check(template: String, expected: String): Unit =
    assert(render(template) == expected, template)

  private def checkFails(template: String): Unit =
    intercept[Exception] {
      frame.select(Template.column(template, frame.columns).cast("string"))
        .head
    }

  // ---- test_cond_funcs (single-message parts) -----------------------------

  test("$(if) with string word-comparison conditions (test_basicfuncs.c:144-149)") {
    check("$(if '\"$FACILITY\" lt \"local3\"' alma korte)", "korte")
    check("$(if '\"$FACILITY\" le \"local3\"' alma korte)", "alma")
    check("$(if '\"$FACILITY\" eq \"local3\"' alma korte)", "alma")
    check("$(if '\"$FACILITY\" ne \"local3\"' alma korte)", "korte")
    check("$(if '\"$FACILITY\" gt \"local3\"' alma korte)", "korte")
    check("$(if '\"$FACILITY\" ge \"local3\"' alma korte)", "alma")
  }

  test("$(if) with numeric symbolic conditions and and/or (test_basicfuncs.c:151-159)") {
    check("$(if '\"$FACILITY_NUM\" < \"19\"' alma korte)", "korte")
    check("$(if '\"$FACILITY_NUM\" <= \"19\"' alma korte)", "alma")
    check("$(if '\"$FACILITY_NUM\" == \"19\"' alma korte)", "alma")
    check("$(if '\"$FACILITY_NUM\" != \"19\"' alma korte)", "korte")
    check("$(if '\"$FACILITY_NUM\" > \"19\"' alma korte)", "korte")
    check("$(if '\"$FACILITY_NUM\" >= \"19\"' alma korte)", "alma")
    check("$(if '\"$FACILITY_NUM\" >= \"19\" and \"kicsi\" eq \"nagy\"' alma korte)", "korte")
    check("$(if '\"$FACILITY_NUM\" >= \"19\" or \"kicsi\" eq \"nagy\"' alma korte)", "alma")
  }

  test("$(if) with filter-call conditions incl. pcre search (test_basicfuncs.c:141-161)") {
    check("$(if 'facility(local4)' alma korte)", "korte")
    check("$(if 'facility(local3)' alma korte)", "alma")
    check("$(if program(\"slog-ng\" type(pcre)) alma korte)", "alma")
  }

  test("$(or) returns the first non-empty argument (test_basicfuncs.c:167-170)") {
    check("$(or 1 \"\" 2)", "1")
    check("$(or \"\" 2)", "2")
    check("$(or \"\" \"\")", "")
    check("$(or)", "")
  }

  // ---- test_str_funcs ------------------------------------------------------

  test("ipv4-to-int, multi-arg length (test_basicfuncs.c:175,196-198)") {
    check("$(ipv4-to-int $SOURCEIP)", "168496141")
    check("$(length $HOST $PID)", "5 5")
    check("$(length $HOST)", "5")
    check("$(length)", "")
  }

  test("substr incl. negative starts and over-length (test_basicfuncs.c:200-206)") {
    check("$(substr $HOST 1 3)", "zor")
    check("$(substr $HOST 1)", "zorp")
    check("$(substr $HOST -1)", "p")
    check("$(substr $HOST -2 1)", "r")
    check("$(substr 'ssstring-shorter-than-the-specified-length' 2 1400)",
      "string-shorter-than-the-specified-length")
  }

  test("strip battery incl. multi-arg empty-drop and wide chars (test_basicfuncs.c:209-219)") {
    check("$(strip ${APP.STRIP1})", "value")
    check("$(strip ${APP.STRIP2})", "value")
    check("$(strip ${APP.STRIP3})", "value")
    check("$(strip ${APP.STRIP4})", "value")
    check("$(strip ${APP.STRIP5})", "")
    check("$(strip ${APP.STRIP5} ${APP.STRIP1} ${APP.STRIP5})", "value")
    check("$(strip ${APP.STRIP1} ${APP.STRIP2} ${APP.STRIP3} ${APP.STRIP4} ${APP.STRIP5})",
      "value value value value")
    check("$(strip ŐRÜLT_ÍRÓ)", "ŐRÜLT_ÍRÓ")
    check("$(strip ' \n\t\r  a  b \n\t\r ')", "a  b")
  }

  test("sanitize flags battery (test_basicfuncs.c:221-229)") {
    check("$(sanitize alma/bela)", "alma_bela")
    check("$(sanitize -r @ alma/bela)", "alma@bela")
    check("$(sanitize -i @ alma@bela)", "alma_bela")
    check("$(sanitize -i '@/l ' alma@/bela)", "a_ma__be_a")
    check("$(sanitize alma\u001b_bela)", "alma__bela")
    check("$(sanitize -C alma\u001b_bela)", "alma\u001b_bela")
    check("$(sanitize $HOST $PROGRAM)", "bzorp/syslog-ng")
    checkFails("$(sanitize ${missingbrace)")
  }

  test("indent-multi-line, case, replace-delimiter (test_basicfuncs.c:231-236)") {
    check("$(indent-multi-line 'foo\nbar')", "foo\n\tbar")
    check("$(lowercase ŐRÜLT ÍRÓ)", "őrült író")
    check("$(uppercase őrült író)", "ŐRÜLT ÍRÓ")
    check("$(replace-delimiter \"\t\" \",\" \"hello\tworld\")", "hello,world")
  }

  test("padding: cyclic fill, never truncates, empty pad (test_basicfuncs.c:238-244)") {
    check("$(padding foo 10)", "       foo")
    check("$(padding foo 10 x)", "xxxxxxxfoo")
    check("$(padding foo 10 abc)", "abcabcafoo")
    check("$(padding foo 2)", "foo")
    check("$(padding foo 3)", "foo")
    check("$(padding foo 6 abc)", "abcfoo")
    check("$(padding foo 4 '')", " foo")
  }

  test("binary: hex/octal/decimal bytes, compile-time validation (test_basicfuncs.c:246-253)") {
    checkFails("$(binary)")
    checkFails("$(binary abc)")
    checkFails("$(binary 256)")
    checkFails("$(binary 08)")
    check("$(binary 1)", "\u0001")
    check("$(binary 1 0x1)", "\u0001\u0001")
    check("$(binary 0xFF 255 0377)", "\u00ff\u00ff\u00ff")
    check("$(binary 0xFF 0x00 0x40)", "\u00ff\u0000@")
  }

  test("base64-encode: multi-arg concat, no line wrap (test_basicfuncs.c:255-265)") {
    check("[$(base64-encode)]", "[]")
    check("[$(base64-encode abc)]", "[YWJj]")
    check("[$(base64-encode abcxyz)]", "[YWJjeHl6]")
    check("[$(base64-encode abcd)]", "[YWJjZA==]")
    check("[$(base64-encode abcdabcdabcdabcd)]", "[YWJjZGFiY2RhYmNkYWJjZA==]")
    check("[$(base64-encode abcd abcd abcd abcd)]", "[YWJjZGFiY2RhYmNkYWJjZA==]")
    check("[$(base64-encode 'X X')]", "[WCBY]")
    check("[$(base64-encode " + "x" * 134 + ")]",
      "[" + java.util.Base64.getEncoder.encodeToString(Array.fill(134)('x'.toByte)) + "]")
  }

  // ---- test_numeric_funcs --------------------------------------------------

  test("integer arithmetic: int64, NaN on garbage and div/mod zero (test_basicfuncs.c:270-284)") {
    check("$(+ $FACILITY_NUM 1)", "20")
    check("$(+ -1 -1)", "-2")
    check("$(- $FACILITY_NUM 1)", "18")
    check("$(- $FACILITY_NUM 20)", "-1")
    check("$(* $FACILITY_NUM 2)", "38")
    check("$(/ $FACILITY_NUM 2)", "9")
    check("$(% $FACILITY_NUM 3)", "1")
    check("$(/ $FACILITY_NUM 0)", "NaN")
    check("$(% $FACILITY_NUM 0)", "NaN")
    check("$(+ foo bar)", "NaN")
    check("$(/ 2147483648 1)", "2147483648")
    check("$(+ 5000000000 5000000000)", "10000000000")
    check("$(% 10000000000 5000000001)", "4999999999")
    check("$(* 5000000000 2)", "10000000000")
    check("$(- 10000000000 5000000000)", "5000000000")
  }

  test("float promotion renders %.20f incl. fmod (test_basicfuncs.c:286-294)") {
    check("$(+ 1.5 .25)", "1.75000000000000000000")
    check("$(- -1.5 .25)", "-1.75000000000000000000")
    check("$(/ 3 2)", "1")
    check("$(/ 3.0 2)", "1.50000000000000000000")
    check("$(/ 3 2.0)", "1.50000000000000000000")
    check("$(* 1.5 2.0)", "3.00000000000000000000")
    check("$(% 3.14 0.7)", "0.34000000000000030198")
    check("$(+ 5e-1 0)", "0.50000000000000000000")
  }

  test("round/floor/ceil: precision window 0..20, half-away (test_basicfuncs.c:296-305)") {
    check("$(round 2.0)", "2")
    check("$(round 2.123456 3)", "2.123")
    check("$(round 2.123456 4)", "2.1235")
    check("$(round 0.5)", "1")
    check("$(round 2 -1)", "NaN")
    check("$(round 2 21)", "NaN")
    check("$(round 2 0)", "2")
    check("$(round 2 20)", "2.00000000000000000000")
    check("$(floor 0.7)", "0")
    check("$(ceil 0.2)", "1")
  }

  // ---- test_fname_funcs ----------------------------------------------------

  test("basename/dirname (test_basicfuncs.c:310-317)") {
    check("$(basename foo)", "foo")
    check("$(basename /foo/bar)", "bar")
    check("$(basename /foo/bar/baz)", "baz")
    check("$(dirname foo)", ".")
    check("$(dirname /foo/bar)", "/foo")
    check("$(dirname /foo/bar/)", "/foo/bar")
    check("$(dirname /foo/bar/baz)", "/foo/bar")
  }

  // ---- test_misc_funcs -----------------------------------------------------

  test("$(env) present/absent (test_basicfuncs.c:389-396)") {
    check("$(env GRAFT_SURELY_UNSET_ENV_VAR)", "")
    // PATH is always set in the sbt JVM
    assert(render("$(env PATH)").nonEmpty)
  }

  // ---- test_tf_template ----------------------------------------------------

  test("$(template) static and dynamic binding (test_basicfuncs.c:398-410)") {
    check("foo $(template dummy) bar", "foo dummy template expanded bzorp bar")
    intercept[Exception] {
      frame.select(Template.column("foo $(template unknown) bar",
        frame.columns, templates = DummyTemplates)).head
    }
    check("foo $(template ${template_name}) bar",
      "foo dummy template expanded bzorp bar")
    check("foo $(template '${unknown:-unknown}' fallback) bar", "foo fallback bar")
    check("foo $(template '${unknown:-unknown}' fallback more args $HOST) bar",
      "foo fallback more args bzorp bar")
    check("foo $(template '${unknown:-unknown}') bar", "foo  bar")
  }

  // ---- test_list_funcs -----------------------------------------------------

  test("list-concat (test_basicfuncs.c:414-420)") {
    check("$(list-concat)", "")
    check("$(list-concat foo bar baz)", "foo,bar,baz")
    check("$(list-concat foo bar baz '')", "foo,bar,baz")
    check("$(list-concat foo $HOST $PROGRAM $PID bar)", "foo,bzorp,syslog-ng,23323,bar")
    check("$(list-concat foo $HOST,$PROGRAM,$PID bar)", "foo,bzorp,syslog-ng,23323,bar")
    check("$(list-concat foo '$HOST,$PROGRAM,$PID' bar)", "foo,bzorp,syslog-ng,23323,bar")
    check("$(list-concat foo '$HOST,$PROGRAM,$PID,' bar)", "foo,bzorp,syslog-ng,23323,bar")
  }

  test("list-append str-repr encodes new elements (test_basicfuncs.c:422-429)") {
    check("$(list-append)", "")
    check("$(list-append '' foo)", "foo")
    check("$(list-append '' foo bar)", "foo,bar")
    check("$(list-append '' foo bar baz)", "foo,bar,baz")
    check("$(list-append foo,bar,baz 'x')", "foo,bar,baz,x")
    check("$(list-append foo,bar,baz '')", "foo,bar,baz,\"\"")
    check("$(list-append foo,bar,baz 'xxx,')", "foo,bar,baz,\"xxx,\"")
    check("$(list-append foo,bar,baz 'a\tb')", "foo,bar,baz,\"a\\tb\"")
  }

  test("list-head drops unquoted empties (test_basicfuncs.c:431-443)") {
    check("$(list-head)", "")
    check("$(list-head '')", "")
    check("$(list-head foo)", "foo")
    check("$(list-head foo,)", "foo")
    check("$(list-head foo,bar)", "foo")
    check("$(list-head foo,bar,baz)", "foo")
    check("$(list-head ,bar,baz)", "bar")
    check("$(list-head foo bar)", "foo")
    check("$(list-head foo bar baz)", "foo")
    check("$(list-head '' bar baz)", "bar")
    check("$(list-head '\"\\tfoo,\",bar,baz')", "\tfoo,")
  }

  test("list-nth incl. negative indexes (test_basicfuncs.c:445-453)") {
    check("$(list-nth 0 '\"foo,\",\"bar\",\"baz\"')", "foo,")
    check("$(list-nth 1 '\"foo,\",\"bar\",\"baz\"')", "bar")
    check("$(list-nth 2 '\"foo,\",\"bar\",\"baz\"')", "baz")
    check("$(list-nth 3 '\"foo,\",\"bar\",\"baz\"')", "")
    check("$(list-nth 4 '\"foo,\",\"bar\",\"baz\"')", "")
    check("$(list-nth -1 '\"foo,\",\"bar\",\"baz\"')", "baz")
    check("$(list-nth -2 '\"foo,\",\"bar\",\"baz\"')", "bar")
    check("$(list-nth -3 '\"foo,\",\"bar\",\"baz\"')", "foo,")
    check("$(list-nth -4 '\"foo,\",\"bar\",\"baz\"')", "")
  }

  test("list-tail (test_basicfuncs.c:455-463)") {
    check("$(list-tail)", "")
    check("$(list-tail foo)", "")
    check("$(list-tail foo,bar)", "bar")
    check("$(list-tail foo,)", "")
    check("$(list-tail ,bar)", "")
    check("$(list-tail foo,bar,baz)", "bar,baz")
    check("$(list-tail foo bar baz)", "bar,baz")
    check("$(list-tail foo,bar baz bad)", "bar,baz,bad")
    check("$(list-tail foo,bar,xxx, baz bad)", "bar,xxx,baz,bad")
  }

  test("list-slice full form battery (test_basicfuncs.c:465-492)") {
    check("$(list-slice 0:0 foo,bar,xxx,baz,bad)", "")
    check("$(list-slice 0:1 foo,bar,xxx,baz,bad)", "foo")
    check("$(list-slice 0:2 foo,bar,xxx,baz,bad)", "foo,bar")
    check("$(list-slice 0:3 foo,bar,xxx,baz,bad)", "foo,bar,xxx")
    check("$(list-slice 1:1 foo,bar,xxx,baz,bad)", "")
    check("$(list-slice 1:2 foo,bar,xxx,baz,bad)", "bar")
    check("$(list-slice : foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz,bad")
    check("$(list-slice 0: foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz,bad")
    check("$(list-slice 3: foo,bar,xxx,baz,bad)", "baz,bad")
    check("$(list-slice :1 foo,bar,xxx,baz,bad)", "foo")
    check("$(list-slice :2 foo,bar,xxx,baz,bad)", "foo,bar")
    check("$(list-slice :3 foo,bar,xxx,baz,bad)", "foo,bar,xxx")
    check("$(list-slice -1: foo,bar,xxx,baz,bad)", "bad")
    check("$(list-slice -2: foo,bar,xxx,baz,bad)", "baz,bad")
    check("$(list-slice -3: foo,bar,xxx,baz,bad)", "xxx,baz,bad")
    check("$(list-slice -5: foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz,bad")
    check("$(list-slice -6: foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz,bad")
    check("$(list-slice -100: foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz,bad")
    check("$(list-slice :-1 foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz")
    check("$(list-slice :-2 foo,bar,xxx,baz,bad)", "foo,bar,xxx")
    check("$(list-slice :-3 foo,bar,xxx,baz,bad)", "foo,bar")
    check("$(list-slice :-4 foo,bar,xxx,baz,bad)", "foo")
    check("$(list-slice :-5 foo,bar,xxx,baz,bad)", "")
    check("$(list-slice :-6 foo,bar,xxx,baz,bad)", "")
  }

  test("list-count, explode, implode (test_basicfuncs.c:494-502)") {
    check("$(list-count foo,bar,xxx, baz bad)", "5")
    check("$(explode ' ' foo bar xxx baz bad)", "foo,bar,xxx,baz,bad")
    check("$(explode ' ' 'foo bar xxx baz bad')", "foo,bar,xxx,baz,bad")
    check("$(explode ';' foo;bar;xxx;baz;bad)", "foo,bar,xxx,baz,bad")
    check("$(explode ';' foo;bar xxx;baz;bad)", "foo,bar,xxx,baz,bad")
    check("$(implode ' ' foo,bar,xxx,baz,bad)", "foo bar xxx baz bad")
    check("$(implode ' ' $(list-slice :3 foo,bar,xxx,baz,bad))", "foo bar xxx")
  }

  test("list-search literal mode with start-index and multi-list (test_basicfuncs.c:504-511)") {
    check("$(list-search almafa '')", "")
    check("$(list-search 'foo,' '\"foo,\",\"bar\",\"baz\",\"bar\"')", "0")
    check("$(list-search --start-index 0 --mode literal bar '\"foo,\",\"bar\",\"baz\",\"bar\"')", "1")
    check("$(list-search --start-index 2 bar '\"foo,\",\"bar\",\"baz\",\"bar\"')", "3")
    check("$(list-search --mode literal --start-index 1 baz '\"foo,\",\"bar\",\"baz\",\"bar\"')", "2")
    check("$(list-search --start-index 5 baz '\"foo,\",\"bar\",\"baz\",\"bar\"' '\"foo,\",\"bar\",\"baz\",\"bar\"')", "6")
    check("$(list-search almafa --mode literal '\"foo,\",\"bar\",\"baz\",\"bar\"')", "")
  }

  test("list-search prefix/substring/glob/pcre modes (test_basicfuncs.c:513-539)") {
    check("$(list-search --mode prefix --start-index 0 almafa '')", "")
    check("$(list-search --start-index 0 --mode prefix fo '\"foo,\",\"bar\",\"baz\"')", "0")
    check("$(list-search --mode prefix ba '\"foo,\",\"bar\",\"baz\"')", "1")
    check("$(list-search --mode prefix --start-index 1 ba '\"foo,\",\"bar\",\"baz\"')", "1")
    check("$(list-search --start-index 2 --mode prefix ba '\"foo,\",\"bar\",\"baz\"')", "2")
    check("$(list-search --mode prefix --start-index 0 almafa '\"foo,\",\"bar\",\"baz\"')", "")

    check("$(list-search --mode substring almafa '')", "")
    check("$(list-search --start-index 0 --mode substring oo '\"foo,\",\"bar\",\"baz\"')", "0")
    check("$(list-search --mode substring --start-index 2 a '\"foo,\",\"bar\",\"baz\"')", "2")
    check("$(list-search --mode substring ar '\"foo,\",\"bar\",\"baz\"')", "1")
    check("$(list-search --start-index 1 --mode substring ar '\"foo,\",\"bar\",\"baz\"')", "1")
    check("$(list-search --mode substring almafa '\"foo,\",\"bar\",\"baz\"')", "")

    check("$(list-search --mode glob al*fa '')", "")
    check("$(list-search --start-index 0 --mode glob f*, '\"foo,\",\"bar\",\"baz\"')", "0")
    check("$(list-search --mode glob --start-index 1 *az '\"foo,\",\"bar\",\"baz\"')", "2")
    check("$(list-search --mode glob ar '\"foo,\",\"bar\",\"baz\"')", "")
    check("$(list-search --mode glob ba* '\"foo,\",\"bar\",\"baz\"')", "1")
    check("$(list-search --mode glob al*fa '\"foo,\",\"bar\",\"baz\"')", "")

    check("$(list-search --mode pcre al.*fa '')", "")
    check("$(list-search --mode pcre --start-index 0 f.*, '\"foo,\",\"bar\",\"baz\"')", "0")
    check("$(list-search --start-index 1 --mode pcre .az '\"foo,\",\"bar\",\"baz\"')", "2")
    check("$(list-search --mode pcre ^bar$ '\"foo,\",\"bar\",\"baz\"')", "1")
    check("$(list-search --mode pcre ba. '\"foo,\",\"bar\",\"baz\"')", "1")
    check("$(list-search --mode pcre a...fa '\"foo,\",\"bar\",\"baz\"')", "")
  }

  // ---- test_tfurlencode / test_tfurldecode ---------------------------------

  test("url-encode %20-style escaping (test_basicfuncs.c:556-562)") {
    check("$(url-encode '')", "")
    check("$(url-encode test)", "test")
    check("$(url-encode <>)", "%3C%3E")
    check("$(url-encode &)", "%26")
    // g_uri_escape_string: space is %20, never '+'
    check("$(url-encode 'a b')", "a%20b")
    check("$(url-encode a+b)", "a%2Bb")
  }

  test("url-decode: multi-arg concat, malformed escapes empty the result (test_basicfuncs.c:564-574)") {
    check("$(url-decode '')", "")
    check("$(url-decode test)", "test")
    check("$(url-decode %3C%3E)", "<>")
    check("$(url-decode %26)", "&")
    check("$(url-decode %26 %26)", "&&")
    check("$(url-decode %)", "")
    check("$(url-decode %00a)", "")
    // '+' is NOT form-decoded to space (g_uri_unescape_string)
    check("$(url-decode a+b)", "a+b")
  }

  // ---- test_map / test_filter (parameterized sets) -------------------------

  test("$(map) parameterized battery (test_basicfuncs.c:607-623)") {
    check("Some prefix $(map \"$(+ 1 $_)\" 0,1,2)", "Some prefix 1,2,3")
    check("Some prefix $(map \"$(+ 1 $_)\" $(+ 1 1))", "Some prefix 3")
    check("Some prefix $(map \"$(+ 1 $_)\" '')", "Some prefix ")
    check("Some prefix $(map $(+ 1 $_) $(map $(+ 1 $_) 0,1,2))", "Some prefix 2,3,4")
    check("Some prefix $(map \"$(if ('$_' eq '1') 'same' 'different')\" 0,1,2)",
      "Some prefix different,same,different")
    check("Some prefix $(map \"$(if ('$_' le '1') 'smaller' 'larger')\" 0,1,2)",
      "Some prefix smaller,smaller,larger")
    check("Some prefix $(map \"$(if ('$_' ge '1') 'larger' 'smaller')\" 0,1,2)",
      "Some prefix smaller,larger,larger")
    check("$(map \"$(if ('$(echo $_)' eq '1') 'same' 'different')\" 0,1,2)",
      "different,same,different")
  }

  test("$(filter) parameterized battery (test_basicfuncs.c:630-647)") {
    check("Some prefix $(filter ('1' == '1') 0,1,2)", "Some prefix 0,1,2")
    check("$(filter ('$_' le '1') 0,1,2)", "0,1")
    check("$(filter ('$(% $_ 2)' eq '0') 0,1,2,3)", "0,2")
    check("Something $(filter ('$_' eq '0') '')", "Something ")
    check("$(filter ('1' eq '0') '')", "")
    check("$(filter message('árvíztűrőtükörfúrógép') 'doesnotchange')", "doesnotchange")
    check("$(filter (message('árvíz') and ('$APP.VALUE' == 'value')) 'doesnotchange')",
      "doesnotchange")
    check("$(filter (message('donotmatch') or ('$APP.VALUE' == 'value')) 'doesnotchange')",
      "doesnotchange")
    check("$(filter ('$YEAR' ge '1900') 'doesnotchange')", "doesnotchange")
    check("$(filter ('$YEAR' le '1900') 'doesnotchange')", "")
  }

  // ---- context-function tests (grouping path) ------------------------------
  // assert_template_format_with_context evaluates over a 2-message
  // context of create_sample_message — here a 2-row group through
  // grouping-by() aggregate values, the engine's context surface.

  private def contextRender(aggTemplate: String): String = {
    val ctx = Seq(
      ("bzorp", "syslog-ng", "23323", 19, 100L),
      ("bzorp", "syslog-ng", "23323", 19, 200L))
      .toDF("host", "program", "pid", "facility", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("severity", lit(3))
      .withColumn("message", lit(Msg))
      .withColumn("tags", array().cast("array<string>"))
      .withColumn("values", map(lit("comma_value"), lit("value,with,a,comma")))
    val cfg = ConfigParser.parse(s"""
      source s { file("/x"); };
      parser p_grp { grouping-by(key("$$HOST") timeout(3600)
        aggregate(value("out" "$aggTemplate"))); };
      destination d { file("/out"); };
      log { source(s); parser(p_grp); destination(d); };
    """)
    ConfigCompiler.compile(cfg, Map("s" -> ctx)).head.df
      .select("out").head.getString(0)
  }

  test("$(grep) incl. -m and multi-value interleave (test_basicfuncs.c:132-139)") {
    assert(contextRender("$(grep 'facility(local3)' $PID)") == "23323,23323")
    assert(contextRender("$(grep -m 1 'facility(local3)' $PID)") == "23323")
    assert(contextRender("$(grep 'facility(local3)' $PID $PROGRAM)") ==
      "23323,syslog-ng,23323,syslog-ng")
    assert(contextRender("$(grep 'facility(local4)' $PID)") == "")
    assert(contextRender("$(grep ('$FACILITY' eq 'local4') $PID)") == "")
    // unbalanced parens INSIDE the quoted operands must not confuse the
    // condition tokenizer (test_basicfuncs.c:137-138)
    assert(contextRender("$(grep ('$FACILITY(' eq 'local3(') $PID)") ==
      "23323,23323")
    assert(contextRender("$(grep ('$FACILITY(' eq 'local4)') $PID)") == "")
  }

  test("$(grep) renders unset values as empty but keeps their position (cond-funcs.c:133, ADVICE r11)") {
    // each matched message appends EVERY value template with a ','
    // separator; an unset macro renders "" without shifting later
    // values left — 2 messages × ($PID, unset) = "23323,,23323,"
    assert(contextRender("$(grep 'facility(local3)' $PID ${no_such_value})") ==
      "23323,,23323,")
    assert(contextRender("$(grep 'facility(local3)' ${no_such_value} $PID)") ==
      ",23323,,23323")
  }

  test("$(context-length), $(context-lookup)/$(context-values) with str-repr quoting (test_basicfuncs.c:542-553)") {
    assert(contextRender("$(context-length)") == "2")
    assert(contextRender("$(context-lookup 'facility(local3)' ${comma_value})") ==
      "\"value,with,a,comma\",\"value,with,a,comma\"")
    assert(contextRender("$(context-values ${PID})") == "23323,23323")
    assert(contextRender("$(context-values ${comma_value})") ==
      "\"value,with,a,comma\",\"value,with,a,comma\"")
  }

  private def numberContextRender(aggTemplate: String, numbers: Seq[String]): String = {
    val ctx = numbers.zipWithIndex
      .map { case (n, i) => ("h", n, 100L + i) }
      .toDF("host", "number", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("message", lit("x"))
      .withColumn("tags", array().cast("array<string>"))
      .withColumn("values", map(lit("NUMBER"), col("number")))
    val cfg = ConfigParser.parse(s"""
      source s { file("/x"); };
      parser p_grp { grouping-by(key("$$HOST") timeout(3600)
        aggregate(value("out" "$aggTemplate"))); };
      destination d { file("/out"); };
      log { source(s); parser(p_grp); destination(d); };
    """)
    ConfigCompiler.compile(cfg, Map("s" -> ctx)).head.df
      .select("out").head.getString(0)
  }

  test("numeric aggregates over context (test_basicfuncs.c:341-355)") {
    val nums = Seq("1", "-1", "3")
    assert(numberContextRender("$(sum ${NUMBER})", nums) == "3")
    assert(numberContextRender("$(min ${NUMBER})", nums) == "-1")
    assert(numberContextRender("$(max ${NUMBER})", nums) == "3")
    assert(numberContextRender("$(average ${NUMBER})", nums) == "1")
  }

  test("numeric aggregates skip invalid values (test_basicfuncs.c:357-371)") {
    val nums = Seq("abc", "1", "c", "2", "")
    assert(numberContextRender("$(sum ${NUMBER})", nums) == "3")
    assert(numberContextRender("$(min ${NUMBER})", nums) == "1")
    assert(numberContextRender("$(max ${NUMBER})", nums) == "2")
    assert(numberContextRender("$(average ${NUMBER})", nums) == "1")
  }

  test("numeric aggregates: all-invalid incl. int64 overflow renders empty (test_basicfuncs.c:373-387)") {
    val nums = Seq("abc", "184467440737095516160", "c", "")
    assert(numberContextRender("$(sum ${NUMBER})", nums) == "")
    assert(numberContextRender("$(min ${NUMBER})", nums) == "")
    assert(numberContextRender("$(max ${NUMBER})", nums) == "")
    assert(numberContextRender("$(average ${NUMBER})", nums) == "")
  }
}
