package graft

import graft.template.Template
import org.apache.spark.sql.functions._

class TemplateSpec extends GraftSuite {
  import spark.implicits._

  private def logDf = {
    Seq(
      ("h1", "sshd", "1234", "login failed", 4, 3, "2024-03-05T10:20:30Z"),
      ("h2", "cron", null, "job done", 9, 6, "2024-12-31T23:59:59Z")
    ).toDF("host", "program", "pid", "message", "facility", "severity", "iso")
      .withColumn("ts", to_timestamp(col("iso")))
      .withColumn("tags", array(lit("t1"), lit("t2")))
      .withColumn("values", map(lit("custom"), lit("cv")))
  }

  private def render(t: String): Seq[String] = {
    val df = logDf
    df.select(Template.column(t, df.columns).as("out"))
      .collect().map(_.getString(0)).toSeq
  }

  test("plain refs and literals") {
    assert(render("$HOST $PROGRAM: $MESSAGE") ==
      Seq("h1 sshd: login failed", "h2 cron: job done"))
  }

  test("missing value renders empty, default kicks in") {
    assert(render("[$PID]") == Seq("[1234]", "[]"))
    assert(render("${PID:-nopid}") == Seq("1234", "nopid"))
  }

  test("escape and braces") {
    assert(render("$$HOST=${HOST}") == Seq("$HOST=h1", "$HOST=h2"))
  }

  test("severity/facility macros") {
    assert(render("$FACILITY.$SEVERITY") == Seq("auth.err", "cron.info"))
    assert(render("$PRI") == Seq("35", "78"))
  }

  test("date macros") {
    assert(render("$YEAR-$MONTH-$DAY $HOUR:$MIN:$SEC") ==
      Seq("2024-03-05 10:20:30", "2024-12-31 23:59:59"))
    assert(render("$ISODATE") ==
      Seq("2024-03-05T10:20:30+00:00", "2024-12-31T23:59:59+00:00"))
    assert(render("$UNIXTIME") == Seq("1709634030", "1735689599"))
  }

  test("dynamic values map fallback") {
    assert(render("$custom") == Seq("cv", "cv"))
    assert(render("$nosuch") == Seq("", ""))
  }

  test("string functions") {
    assert(render("$(uppercase $HOST)") == Seq("H1", "H2"))
    assert(render("$(length $MESSAGE)") == Seq("12", "8"))
    assert(render("$(substr $MESSAGE 0 5)") == Seq("login", "job d"))
    assert(render("$(substr $MESSAGE -6)") == Seq("failed", "b done"))
    assert(render("$(echo a b)") == Seq("a b", "a b"))
    assert(render("$(padding $PID 6 0)") == Seq("001234", "000000"))
  }

  test("numeric functions") {
    assert(render("$(+ $FACILITY_NUM $SEVERITY_NUM)") == Seq("7", "15"))
    assert(render("$(* 3 $SEVERITY_NUM)") == Seq("9", "18"))
    assert(render("$(max 5 $SEVERITY_NUM)") == Seq("5", "6"))
    assert(render("$(% $PRI 8)") == Seq("3", "6"))
  }

  test("list functions (comma repr like the reference)") {
    assert(render("$(list-head $TAGS)") == Seq("t1", "t1"))
    assert(render("$(list-count $TAGS)") == Seq("2", "2"))
    assert(render("$(list-nth 1 $TAGS)") == Seq("t2", "t2"))
    assert(render("$(list-append $TAGS t3)") == Seq("t1,t2,t3", "t1,t2,t3"))
    assert(render("$(implode : $TAGS)") == Seq("t1:t2", "t1:t2"))
  }

  test("list battery from the reference's test_basicfuncs.c") {
    def one(t: String): String = render(t).head
    assert(one("$(list-concat foo bar baz)") == "foo,bar,baz")
    assert(one("$(list-concat foo bar baz '')") == "foo,bar,baz")
    assert(one("$(list-concat foo '$HOST,$PROGRAM' bar)") == "foo,h1,sshd,bar")
    assert(one("$(list-append '' foo)") == "foo")
    assert(one("$(list-append '' foo bar)") == "foo,bar")
    assert(one("$(list-append foo,bar,baz x)") == "foo,bar,baz,x")
    assert(one("$(list-append foo,bar,baz '')") == "foo,bar,baz,\"\"")
    assert(one("$(list-append foo,bar,baz 'xxx,')") == "foo,bar,baz,\"xxx,\"")
    assert(one("$(list-head '')") == "")
    assert(one("$(list-head foo,)") == "foo")
    assert(one("$(list-head ,bar,baz)") == "bar")
    assert(one("$(list-head foo bar baz)") == "foo")
    assert(one("$(list-head '' bar baz)") == "bar")
    assert(one("$(list-head '\"\\tfoo,\",bar,baz')") == "\tfoo,")
    assert(one("$(list-nth 0 '\"foo,\",\"bar\",\"baz\"')") == "foo,")
    assert(one("$(list-nth 1 '\"foo,\",\"bar\",\"baz\"')") == "bar")
    assert(one("$(list-nth 3 '\"foo,\",\"bar\",\"baz\"')") == "")
    assert(one("$(list-tail foo)") == "")
    assert(one("$(list-tail foo,)") == "")
    assert(one("$(list-tail ,bar)") == "")
    assert(one("$(list-tail foo,bar,baz)") == "bar,baz")
    assert(one("$(list-tail foo bar baz)") == "bar,baz")
    assert(one("$(list-tail foo,bar,xxx, baz bad)") == "bar,xxx,baz,bad")
    assert(one("$(list-slice 0:0 foo,bar,xxx,baz,bad)") == "")
    assert(one("$(list-slice 0:2 foo,bar,xxx,baz,bad)") == "foo,bar")
    assert(one("$(list-slice 1:2 foo,bar,xxx,baz,bad)") == "bar")
    assert(one("$(list-slice : foo,bar,xxx,baz,bad)") == "foo,bar,xxx,baz,bad")
    assert(one("$(list-slice 3: foo,bar,xxx,baz,bad)") == "baz,bad")
    assert(one("$(list-slice :2 foo,bar,xxx,baz,bad)") == "foo,bar")
    assert(one("$(list-slice -2: foo,bar,xxx,baz,bad)") == "baz,bad")
    assert(one("$(list-slice -100: foo,bar,xxx,baz,bad)") == "foo,bar,xxx,baz,bad")
    assert(one("$(list-slice :-2 foo,bar,xxx,baz,bad)") == "foo,bar,xxx")
    assert(one("$(list-count foo,bar,baz)") == "3")
    assert(one("$(list-count '')") == "0")
  }

  test("if / binary / structured formatters") {
    assert(render("$(if true yes no)") == Seq("yes", "yes"))
    assert(render("$(if 0 yes no)") == Seq("no", "no"))
    assert(render("$(binary 0x41 66 0x43)") == Seq("ABC", "ABC"))
    assert(render("$(format-json host=$HOST app=$PROGRAM)") ==
      Seq("""{"app":"sshd","host":"h1"}""", """{"app":"cron","host":"h2"}"""))
    assert(render("$(format-cef-extension msg=$MESSAGE)") ==
      Seq("msg=login failed", "msg=job done"))
  }

  test("crypto functions") {
    assert(render("$(md5 x)") == Seq.fill(2)("9dd4e461268c8034f5c8564e155c67a6"))
    assert(render("$(sha256 x)").head.length == 64)
  }

  test("md4: RFC 1320 test vectors") {
    assert(render("$(md4 a)") == Seq.fill(2)("bde52cb31de33e46245e05fbdbd6fb24"))
    assert(render("$(md4 abc)") == Seq.fill(2)("a448017aaf21d8525fc10ae87aa6729d"))
    assert(render("$(md4 'message digest')") ==
      Seq.fill(2)("d9130a8164549fe818874806e1c7014b"))
    assert(render("$(md4 abcdefghijklmnopqrstuvwxyz)") ==
      Seq.fill(2)("d79e1c308aa5bbcdeea8ed63df412da9"))
    // two blocks: 8x"1234567890" = 80 bytes crosses the 64-byte boundary
    assert(render(
      "$(md4 12345678901234567890123456789012345678901234567890123456789012345678901234567890)") ==
      Seq.fill(2)("e33b4ddc9c38f2199c3e7b164fcc0536"))
  }

  test("crypto functions concatenate args and honor --length") {
    // cryptofuncs.c tf_hash: values concatenate before digesting
    assert(render("$(md5 x y)") == render("$(md5 xy)"))
    assert(render("$(sha1 --length 8 foo)") ==
      render("$(sha1 foo)").map(_.take(8)))
    assert(render("$(hash x)") == render("$(sha256 x)"))
  }

  test("crypto goldens from the reference's test_cryptofuncs.c") {
    // modules/cryptofuncs/tests/test_cryptofuncs.c:49-68
    def one(t: String): String = render(t).head
    assert(one("$(sha1 foo)") == "0beec7b5ea3f0fdbc95d0dd47f3c5bc275da8a33")
    assert(one("$(sha1 bar)") == "62cdb7020ff920e5aa642c3d4066950dd1f01f4d")
    assert(one("$(md5 foo)") == "acbd18db4cc2f85cedef654fccc4a4d8")
    assert(one("$(hash foo)") ==
      "2c26b46b68ffc68ff99b453c1d30413413422d706483bfa0f98a5e886266e7ae")
    assert(one("$(md4 foo)") == "0ac6700c491d70fb8650940b1ca1e4b2")
    assert(one("$(sha256 foo)") ==
      "2c26b46b68ffc68ff99b453c1d30413413422d706483bfa0f98a5e886266e7ae")
    assert(one("$(sha1 --length 5 foo)") == "0beec")
    assert(one("$(sha1 -l 5 foo)") == "0beec")
    assert(one("$(sha1 --length 99999 foo)") ==
      "0beec7b5ea3f0fdbc95d0dd47f3c5bc275da8a33")
    assert(one("$(sha1 foo bar)") == "8843d7f92416211de9ebb963ff4ce28125932878")
    assert(one("$(sha1 \"foo bar\")") ==
      "3773dea65156909838fa6c22825cafe090ff8030")
    assert(one("$(md5 $(sha1 foo) bar)") == "196894290a831b2d2755c8de22619a97")
  }

  test("underscore spellings resolve like dashed ones") {
    assert(render("$(format_welf k v)") == render("$(format-welf k v)"))
  }

  test("or/default picks first non-empty") {
    assert(render("$(or $PID $HOST)") == Seq("1234", "h2"))
  }

  test("filename functions") {
    assert(render("$(basename /var/log/syslog)") == Seq.fill(2)("syslog"))
    assert(render("$(dirname /var/log/syslog)") == Seq.fill(2)("/var/log"))
  }

  test("higher-order $(map): reference test_basicfuncs.c fixtures") {
    assert(render("Some prefix $(map \"$(+ 1 $_)\" 0,1,2)") ==
      Seq("Some prefix 1,2,3", "Some prefix 1,2,3"))
    assert(render("Some prefix $(map \"$(+ 1 $_)\" $(+ 1 1))") ==
      Seq("Some prefix 3", "Some prefix 3"))
    assert(render("Some prefix $(map \"$(+ 1 $_)\" '')") ==
      Seq("Some prefix ", "Some prefix "))
    // embedded map
    assert(render("$(map $(+ 1 $_) $(map $(+ 1 $_) 0,1,2))") ==
      Seq("2,3,4", "2,3,4"))
    // template condition inside the mapped template
    assert(render("$(map \"$(if ('$_' eq '1') 'same' 'different')\" 0,1,2)") ==
      Seq("different,same,different", "different,same,different"))
    assert(render("$(map \"$(if ('$_' le '1') 'smaller' 'larger')\" 0,1,2)") ==
      Seq("smaller,smaller,larger", "smaller,smaller,larger"))
  }

  test("higher-order $(filter): filter-expression conditions over lists") {
    assert(render("Some prefix $(filter ('1' eq '1') 0,1,2)") ==
      Seq("Some prefix 0,1,2", "Some prefix 0,1,2"))
    assert(render("$(filter ('$_' le '1') 0,1,2)") == Seq("0,1", "0,1"))
    assert(render("$(filter ('$(% $_ 2)' eq '0') 0,1,2,3)") == Seq("0,2", "0,2"))
    assert(render("Something $(filter ('$_' eq '0') '')") ==
      Seq("Something ", "Something "))
    // message() primitive as the condition, like the reference fixtures
    assert(render("$(filter (message('login')) keep,me)") == Seq("keep,me", ""))
  }

  test("higher-order $(iterate): batch form emits the first N iterates") {
    assert(render("$(iterate \"$(+ 2 $_)\" 0 4)") == Seq("0,2,4,6", "0,2,4,6"))
    assert(render("$(iterate \"$(+ 1 $_)\" 5 1)") == Seq("5", "5"))
    assert(render("$(iterate \"$(+ 1 $_)\" 5 0)") == Seq("", ""))
  }

  test("$(if) accepts a filter expression condition") {
    assert(render("$(if ('$PROGRAM' eq 'sshd') secure other)") ==
      Seq("secure", "other"))
    // symbolic < is the numeric family: $LEVEL_NUM renders the number
    assert(render("$(if ('$LEVEL_NUM' < '5') high low)") == Seq("high", "low"))
    assert(render("$(if (severity(emerg..err) and message('failed')) y n)") ==
      Seq("y", "n"))
  }

  private def renderAt(ts: String, t: String): String = {
    val df = Seq(1).toDF("x").withColumn("ts", to_timestamp(lit(ts)))
    df.select(Template.column(t, Seq("ts")).as("out")).head.getString(0)
  }

  test("date-part macro golden battery (lib/template/tests/test_template.c:161-182)") {
    val ts = "2006-02-11 10:34:56"
    assert(renderAt(ts, "$YEAR") == "2006")
    assert(renderAt(ts, "$YEAR_DAY") == "042")
    assert(renderAt(ts, "$MONTH") == "02")
    assert(renderAt(ts, "$MONTH_WEEK") == "1")
    assert(renderAt(ts, "$MONTH_ABBREV") == "Feb")
    assert(renderAt(ts, "$MONTH_NAME") == "February")
    assert(renderAt(ts, "$DAY") == "11")
    assert(renderAt(ts, "$WEEK") == "06")
    assert(renderAt(ts, "$WEEK_DAY") == "7")
    assert(renderAt(ts, "$WEEK_DAY_NAME") == "Saturday")
    assert(renderAt(ts, "$WEEK_DAY_ABBREV") == "Sat")
    assert(renderAt(ts, "$WEEKDAY") == "Sat")
  }

  test("WEEK counts Monday-weeks from Jan 1 (macros.c:338); ISOWEEK is ISO 8601") {
    // Jan 1 2022 is a Saturday: week-of-year 00, but ISO week 52 of 2021 —
    // the January divergence that breaks $YEAR$WEEK-partitioned paths
    assert(renderAt("2022-01-01 00:00:00", "$WEEK") == "00")
    assert(renderAt("2022-01-01 00:00:00", "$ISOWEEK") == "52")
    // Jan 3 opens week 01, Jan 10 week 02 ((yday - daysSinceMonday + 7)/7)
    assert(renderAt("2022-01-10 00:00:00", "$WEEK") == "02")
    assert(renderAt("2022-01-10 00:00:00", "$ISOWEEK") == "02")
  }

  test("$(sanitize) option flags (test_basicfuncs.c:221-228)") {
    assert(render("$(sanitize alma/bela)") == Seq("alma_bela", "alma_bela"))
    assert(render("$(sanitize -r @ alma/bela)") == Seq("alma@bela", "alma@bela"))
    assert(render("$(sanitize -i @ alma@bela)") == Seq("alma_bela", "alma_bela"))
    assert(render("$(sanitize -i '@/l ' alma@/bela)") == Seq("a_ma__be_a", "a_ma__be_a"))
    assert(render("$(sanitize alma_bela)") == Seq("alma__bela", "alma__bela"))
    assert(render("$(sanitize -C alma_bela)") == Seq("alma_bela", "alma_bela"))
    assert(render("$(sanitize $HOST $PROGRAM)") == Seq("h1/sshd", "h2/cron"))
  }

  test("$(if) quoted filter-expression form (test_basicfuncs.c:144-156)") {
    assert(render("$(if '\"$FACILITY_NUM\" == \"4\"' alma korte)") ==
      Seq("alma", "korte"))
    assert(render("$(if '\"$FACILITY_NUM\" >= \"4\"' alma korte)") ==
      Seq("alma", "alma"))
    assert(render("$(if '\"$PROGRAM\" eq \"cron\"' alma korte)") ==
      Seq("korte", "alma"))
    assert(render("$(if '\"$FACILITY_NUM\" >= \"4\" and \"kicsi\" eq \"nagy\"' alma korte)") ==
      Seq("korte", "korte"))
    assert(render("$(if '\"$FACILITY_NUM\" >= \"4\" or \"kicsi\" eq \"nagy\"' alma korte)") ==
      Seq("alma", "alma"))
  }

  test("nested functions and refs") {
    assert(render("$(uppercase $(substr $MESSAGE 0 3))") == Seq("LOG", "JOB"))
  }
  test("frac-digits(3) composite date macros (test_template.c:161-204)") {
    // the libtest stamp: 2006-02-11T10:34:56+01:00 = 09:34:56Z;
    // RECVD = 1139684315.639 = 18:58:35.639Z
    val df = logDf.limit(1)
      .withColumn("ts", to_timestamp(lit("2006-02-11 09:34:56")))
      .withColumn("recvd_ts", to_timestamp(lit("2006-02-11 18:58:35.639")))
    def r(t: String): String =
      df.select(Template.column(t, df.columns, tz = Some("Europe/Budapest"),
        fracDigits = 3).cast("string")).head.getString(0)
    assert(r("$DATE") == "Feb 11 10:34:56.000")
    assert(r("$STAMP") == "Feb 11 10:34:56.000")
    assert(r("$FULLDATE") == "2006 Feb 11 10:34:56.000")
    assert(r("$ISODATE") == "2006-02-11T10:34:56.000+01:00")
    assert(r("$UNIXTIME") == "1139650496.000")
    assert(r("$TZOFFSET") == "+01:00")
    assert(r("$R_DATE") == "Feb 11 19:58:35.639")
    assert(r("$R_ISODATE") == "2006-02-11T19:58:35.639+01:00")
    assert(r("$R_UNIXTIME") == "1139684315.639")
  }
  test("FULLHOST/FULLHOST_FROM/UNIQID macros (test_template.c:227-244)") {
    val df = logDf.limit(1)
      .withColumn("host_from", lit("kismacska"))
      .withColumn("hostid", lit(0xcafebabeL))
      .withColumn("rcptid", lit(555L))
    def r(t: String): String =
      df.select(Template.column(t, df.columns).cast("string")).head.getString(0)
    assert(r("$FULLHOST") == "h1")
    assert(r("$HOST_FROM") == "kismacska")
    assert(r("$FULLHOST_FROM") == "kismacska")
    assert(r("$UNIQID") == "cafebabe@000000000000022b")
  }
  test("template-escape(yes) escapes value expansions only (test_template.c:90-97)") {
    val df = logDf.limit(1)
      .withColumn("values", map(lit("APP.QVALUE"), lit("\"value\"")))
    def r(t: String, esc: Boolean): String =
      df.select(Template.column(t, df.columns, escape = esc).cast("string"))
        .head.getString(0)
    assert(r("${APP.QVALUE}", esc = false) == "\"value\"")
    assert(r("${APP.QVALUE}", esc = true) == "\\\"value\\\"")
    // literal text never escapes
    assert(r("say \"${APP.QVALUE}\"", esc = true) == "say \"\\\"value\\\"\"")
  }
}
