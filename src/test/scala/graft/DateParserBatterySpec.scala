package graft

import graft.functions.DateScan
import org.apache.spark.sql.functions._

/** The date-parser battery, ported from
  * `/root/reference/modules/timestamp/tests/test_date.c` — ISO8601
  * variants with military/named zones, strftime formats, the
  * closest-year heuristic, missing-field defaults, %s epoch, multiple
  * formats, full-consume rejection and guess-timezone. "now" is the
  * reference's faked Dec 30 2015 clock in its CET-1 test zone.
  */
class DateParserBatterySpec extends GraftSuite {
  import spark.implicits._

  // test_date.c:82-88: fake_time(1451473200) = Wed Dec 30 2015, TZ=CET-1
  private val RefNow = 1451473200L
  private val Zone = "CET"

  private def scan(msg: String, format: String, timezone: String = null,
      formats: Seq[String] = null, guess: Boolean = false): Option[(Long, Int, Int)] = {
    val fmts = if (formats != null) formats else Option(format).toSeq
    val df = Seq(msg).toDF("m").select(
      DateScan(col("m"), fmts, Option(timezone), Zone, RefNow, guess).as("d"))
    val row = df.select("d.ok", "d.epoch", "d.usec", "d.gmtoff").head
    if (!row.getBoolean(0)) None
    else Some((row.getLong(1), row.getInt(2), row.getInt(3)))
  }

  /** append_format_unix_time TS_FMT_ISO: wall clock in the PARSED
    * offset + that offset. */
  private def iso(epoch: Long, gmtoff: Int): String = {
    val ldt = java.time.Instant.ofEpochSecond(epoch)
      .atOffset(java.time.ZoneOffset.ofTotalSeconds(gmtoff))
    ldt.format(java.time.format.DateTimeFormatter.ofPattern(
      "yyyy-MM-dd'T'HH:mm:ssxxx"))
  }

  private def check(msg: String, format: String, expected: String,
      timezone: String = null): Unit = {
    val r = scan(msg, format, timezone)
    assert(r.isDefined, s"unable to parse format=$format msg=$msg")
    val (e, _, off) = r.get
    assert(iso(e, off) == expected, s"msg=$msg format=$format got ${iso(e, off)}")
  }

  test("ISO8601 variants incl. military and named zones (test_date.c:100-117)") {
    check("2015-01-26T16:14:49+0300", null, "2015-01-26T16:14:49+03:00")
    check("2015-01-26T16:14:49+0330", null, "2015-01-26T16:14:49+03:30")
    check("2015-01-26T16:14:49+0200", null, "2015-01-26T16:14:49+02:00")
    check("2015-01-26T16:14:49+03:00", null, "2015-01-26T16:14:49+03:00")
    check("2015-01-26T16:14:49+03:30", null, "2015-01-26T16:14:49+03:30")
    check("2015-01-26T16:14:49+02:00", null, "2015-01-26T16:14:49+02:00")
    check("2015-01-26T16:14:49Z", null, "2015-01-26T16:14:49+00:00")
    check("2015-01-26T16:14:49A", null, "2015-01-26T16:14:49-01:00")
    check("2015-01-26T16:14:49B", null, "2015-01-26T16:14:49-02:00")
    check("2015-01-26T16:14:49N", null, "2015-01-26T16:14:49+01:00")
    check("2015-01-26T16:14:49O", null, "2015-01-26T16:14:49+02:00")
    check("2015-01-26T16:14:49GMT", null, "2015-01-26T16:14:49+00:00")
    check("2015-01-26T16:14:49PDT", null, "2015-01-26T16:14:49-07:00")
  }

  test("strftime formats: rfc2822, apache, zones (test_date.c:120-131)") {
    check("Tue, 27 Jan 2015 11:48:46 +0200", "%a, %d %b %Y %T %z",
      "2015-01-27T11:48:46+02:00")
    check("21/Jan/2015:14:40:07 +0500", "%d/%b/%Y:%T %z",
      "2015-01-21T14:40:07+05:00")
    // no zone in the input: the configured / default zone applies
    check("Tue, 27 Jan 2015 11:48:46", "%a, %d %b %Y %T",
      "2015-01-27T11:48:46+01:00")
    check("Tue, 27 Jan 2015 11:48:46", "%a, %d %b %Y %T",
      "2015-01-27T11:48:46-07:00", timezone = "America/Phoenix")
    check("Tue, 27 Jan 2015 11:48:46", "%a, %d %b %Y %T",
      "2015-01-27T11:48:46+05:00", timezone = "+05:00")
  }

  test("closest-year heuristic (test_date.c:132-138)") {
    check("01/Jan:00:40:07 +0500", "%d/%b:%T %z", "2016-01-01T00:40:07+05:00")
    check("01/Aug:00:40:07 +0500", "%d/%b:%T %z", "2015-08-01T00:40:07+05:00")
    check("01/Sep:00:40:07 +0500", "%d/%b:%T %z", "2015-09-01T00:40:07+05:00")
    check("01/Oct:00:40:07 +0500", "%d/%b:%T %z", "2015-10-01T00:40:07+05:00")
    check("01/Nov:00:40:07 +0500", "%d/%b:%T %z", "2015-11-01T00:40:07+05:00")
  }

  test("%s epoch (test_date.c:141-142)") {
    check("1446128356 +01:00", "%s %z", "2015-10-29T15:19:16+01:00")
    check("1446128356", "%s", "2015-10-29T15:19:16+01:00",
      timezone = "Europe/Budapest")
  }

  test("named zones via %z and %Z (test_date.c:144-171)") {
    for (zdir <- Seq("%z", "%Z")) {
      check(s"2015-01-26 00:40:07 PDT", s"%Y-%m-%d %H:%M:%S $zdir",
        "2015-01-26T00:40:07-07:00")
      check(s"2015-01-26 00:40:07 EDT", s"%Y-%m-%d %H:%M:%S $zdir",
        "2015-01-26T00:40:07-04:00")
      check(s"2015-01-26 00:40:07 CET", s"%Y-%m-%d %H:%M:%S $zdir",
        "2015-01-26T00:40:07+01:00")
    }
  }

  test("missing-field defaults (test_date.c:173-180)") {
    check("10:30:00 PDT", "%H:%M:%S %Z", "2015-12-30T10:30:00-07:00")
    check("03-17 10:30:00 PDT", "%m-%d %H:%M:%S %Z", "2015-03-17T10:30:00-07:00")
    check("03 10:30:00 PDT", "%m %H:%M:%S %Z", "2015-03-01T10:30:00-07:00")
    check("2015-03 10:30:00 EDT", "%Y-%m %H:%M:%S %Z", "2015-03-01T10:30:00-04:00")
    check("2015-03-01 EDT", "%Y-%m-%d %Z", "2015-03-01T00:00:00-04:00")
    check("2015-03 EDT", "%Y-%m %Z", "2015-03-01T00:00:00-04:00")
    check("2015-03-01 10:30 EDT", "%Y-%m-%d %H:%M %Z", "2015-03-01T10:30:00-04:00")
  }

  test("trailing text fails the parse (test_date.c:205-218)") {
    assert(scan("2015-01-26T16:14:49+0300 Disappointing log file", null).isEmpty)
  }

  test("multiple formats tried in order, fractional seconds (test_date.c:229-264)") {
    val fmts = Seq("%F %T", "%F %T,%f", "%FT%T.%f%z")
    def usec(msg: String): Int = scan(msg, null, formats = fmts).get._2
    assert(usec("2017-02-02 00:29:16") == 0)
    assert(usec("2017-02-02 00:29:16,706") == 706000)
    assert(usec("2019-05-04T21:55:46.989+02:00") == 989000)
  }

  test("guess-timezone reinterprets the wall clock near now (test_date.c:267-288)") {
    val r = scan("2015-12-30T12:00:00+05:00", null, guess = true)
    assert(r.isDefined)
    val (e, _, off) = r.get
    assert(iso(e, off) == "2015-12-30T12:00:00+01:00", iso(e, off))
  }

  test("config text: date-parser(format list, timezone) sets ts") {
    import graft.config.{ConfigCompiler, ConfigParser}
    val cfg = ConfigParser.parse("""
      source s { file("/x"); };
      destination d { file("/out/x.log"); };
      parser p_date { date-parser(format("%F %T,%f" "%F %T") timezone("+05:00")); };
      log { source(s); parser(p_date); destination(d); };
    """)
    val logs = Seq("2017-02-02 00:29:16,706", "2017-02-02 00:29:16").toDF("message")
    val out = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
    val ts = out.select(col("ts").cast("long")).as[Long].collect().toSet
    // 2017-02-02T00:29:16+05:00 = 1485977356 UTC
    assert(ts == Set(1485977356L), ts)
  }
}
