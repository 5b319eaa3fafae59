package graft

import graft.functions.SyslogLineParser

/** Golden cases mirroring the reference's parser tests
  * (`/root/reference/tests/unit/test_msgparse.c:220-302` semantics). */
class SyslogParserSpec extends GraftSuite {

  test("RFC3164 with pri, host, program[pid]") {
    val p = SyslogLineParser.parse(
      "<34>Oct 11 22:14:15 mymachine su[123]: 'su root' failed for lonvick", 2024)
    assert(p.pri == 34)
    assert(p.pri / 8 == 4)  // facility auth
    assert(p.pri % 8 == 2)  // severity crit
    assert(p.version == 0)
    assert(p.host == "mymachine")
    assert(p.program == "su")
    assert(p.pid == "123")
    assert(p.message == "'su root' failed for lonvick")
    assert(p.tsMicros != Long.MinValue)
  }

  test("flags(): no-parse, expect-hostname, no-hostname, no-parse-date") {
    val line = "<34>Oct 11 22:14:15 su[123]: hello"
    // no-parse: whole line is MESSAGE, default pri, nothing extracted
    val np = SyslogLineParser.parse(line, 2024, noParse = true,
      expectHostname = false, noHostname = false, noParseDate = false)
    assert(np.message == line && np.pri == 13 && np.host == null)
    // default heuristics: "su[123]:" looks like a tag -> no host
    val dflt = SyslogLineParser.parse(line, 2024)
    assert(dflt.host == null && dflt.program == "su")
    // expect-hostname: the reference's hostname scan stops at '[' and a
    // token is a hostname only when the scan stopped at a SPACE
    // (log_msg_parse_hostname, syslog-format.c:440-495) — so a
    // tag-looking token is still the program, never the host (r9 fix:
    // the old behavior forced it to HOST, diverging from the reference)
    val eh = SyslogLineParser.parse(line, 2024, noParse = false,
      expectHostname = true, noHostname = false, noParseDate = false)
    assert(eh.host == null && eh.program == "su" && eh.pid == "123")
    // no-hostname (reference flags=0): the first token after the
    // timestamp is the PROGRAM (test_msgparse.c:293-300 "alma korte")
    val nh = SyslogLineParser.parse(
      "<34>Oct 11 22:14:15 mymachine su: x", 2024, noParse = false,
      expectHostname = false, noHostname = true, noParseDate = false)
    assert(nh.host == null && nh.program == "mymachine" &&
      nh.message == "su: x")
    // no-parse-date: header parses, stamp left unset
    val nd = SyslogLineParser.parse(
      "<34>Oct 11 22:14:15 mymachine su[1]: x", 2024, noParse = false,
      expectHostname = false, noHostname = false, noParseDate = true)
    assert(nd.tsMicros == Long.MinValue && nd.host == "mymachine" && nd.program == "su")
  }

  test("RFC3164 without pid") {
    val p = SyslogLineParser.parse(
      "<13>Feb  5 17:32:18 10.0.0.99 prg: Use the BFG!", 2024)
    assert(p.host == "10.0.0.99")
    assert(p.program == "prg")
    assert(p.pid == null)
    assert(p.message == "Use the BFG!")
  }

  test("RFC3164 tag without host") {
    val p = SyslogLineParser.parse("<13>Feb  5 17:32:18 prg[9]: hi", 2024)
    assert(p.host == null)
    assert(p.program == "prg")
    assert(p.pid == "9")
    assert(p.message == "hi")
  }

  test("no timestamp: header parse continues (test_msgparse.c:266)") {
    // "<15> openvpn[2499]: PTHREAD support initialized"
    val p = SyslogLineParser.parse("<15> openvpn[2499]: PTHREAD support initialized", 2024)
    assert(p.pri == 15)
    assert(p.tsMicros == Long.MinValue)
    assert(p.host == null)
    assert(p.program == "openvpn")
    assert(p.pid == "2499")
    assert(p.message == "PTHREAD support initialized")
  }

  test("spaces between PRI and timestamp (test_msgparse.c:512-539)") {
    val p = SyslogLineParser.parse(
      "<7> Aug 29 02:00:00.156789 ctld snmpd[2499]: PTHREAD support initialized", 2006)
    assert(p.host == "ctld")
    assert(p.program == "snmpd")
    assert(p.tsMicros ==
      java.time.Instant.parse("2006-08-29T02:00:00.156789Z").toEpochMilli * 1000L + 789)
    // bare trailing dot form also accepted
    val q = SyslogLineParser.parse("<7> Aug 29 02:00:00. ctld snmpd[2499]: m", 2006)
    assert(q.host == "ctld" && q.program == "snmpd")
  }

  test("Cisco year-before-time + %PIX tag (test_msgparse.c:557)") {
    val p = SyslogLineParser.parse(
      "<190>Apr 15 2007 21:28:13: %PIX-6-302014: Teardown TCP connection 1688438", 2024)
    assert(p.tsMicros == java.time.Instant.parse("2007-04-15T21:28:13Z").toEpochMilli * 1000L)
    assert(p.program == "%PIX-6-302014")
    assert(p.message == "Teardown TCP connection 1688438")
  }

  test("linksys year-after-time (test_msgparse.c:611)") {
    val p = SyslogLineParser.parse("<190>Apr 15 21:28:13 2007 linksys app: msg", 2024)
    assert(p.tsMicros == java.time.Instant.parse("2007-04-15T21:28:13Z").toEpochMilli * 1000L)
    assert(p.host == "linksys")
    assert(p.program == "app")
    assert(p.message == "msg")
  }

  test("program with slash (test_msgparse.c:548)") {
    val p = SyslogLineParser.parse(
      "<7>Aug 29 02:00:00 bzorp ctld/snmpd[2499]: PTHREAD support initialized", 2006)
    assert(p.host == "bzorp" && p.program == "ctld/snmpd" && p.pid == "2499")
  }

  test("RFC5424 nil timestamp (test_msgparse.c:392)") {
    val p = SyslogLineParser.parse("<7>1 - bzorp openvpn 2499 - - PTHREAD support initialized", 2024)
    assert(p.version == 1 && p.tsMicros == Long.MinValue)
    assert(p.host == "bzorp" && p.program == "openvpn" && p.pid == "2499")
    assert(p.message == "PTHREAD support initialized")
  }

  test("no pri defaults to 13") {
    val p = SyslogLineParser.parse("Feb  5 17:32:18 h p: m", 2024)
    assert(p.pri == 13)
    assert(p.host == "h")
  }

  test("pathological truncated lines never throw") {
    for (line <- Seq("<34>1 ", "<999>weird", "", "<", "<34>", "<34>1", "<13>Feb",
        "<13>Feb 30 25:99:99 h p: m", "<34>1 - h", "<34>1 2024-01-01T00:00:00Z")) {
      val p = SyslogLineParser.parse(line, 2024)
      assert(p.pri >= 0, s"line: $line")
    }
  }

  test("line without timestamp parses as 'program message' (test_msgparse.c:1166)") {
    // the reference's no-timestamp branch ALWAYS extracts a legacy
    // program name (syslog-format.c:794-808; test_simple_message:
    // "some message" → program "some", msg "message") — r9 fix: the
    // old parser left the whole line as MESSAGE
    val p = SyslogLineParser.parse("not a syslog line at all", 2024)
    assert(p.pri == 13)
    assert(p.tsMicros == Long.MinValue)
    assert(p.program == "not")
    assert(p.message == "a syslog line at all")
  }

  test("RFC5424 full") {
    val p = SyslogLineParser.parse(
      """<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog 1370 ID47 [exampleSDID@32473 iut="3" eventSource="Application"] An application event""",
      2024)
    assert(p.pri == 165)
    assert(p.version == 1)
    assert(p.host == "mymachine.example.com")
    assert(p.program == "evntslog")
    assert(p.pid == "1370")
    assert(p.msgid == "ID47")
    assert(p.sdataKeys.toSeq == Seq("exampleSDID@32473.iut", "exampleSDID@32473.eventSource"))
    assert(p.sdataVals.toSeq == Seq("3", "Application"))
    assert(p.message == "An application event")
    // 2003-10-11T22:14:15.003Z = 1065910455.003
    assert(p.tsMicros == 1065910455003000L)
  }

  test("RFC5424 nil fields") {
    val p = SyslogLineParser.parse("<34>1 - - - - - - hi", 2024)
    assert(p.version == 1)
    assert(p.host == null)
    assert(p.program == null)
    assert(p.message.contains("hi"))
  }

  test("RFC5424 escaped sdata values") {
    val p = SyslogLineParser.parse(
      """<34>1 2024-01-01T00:00:00Z h a 1 m [x k="a\"b\\c\]d"] msg""", 2024)
    assert(p.sdataVals.toSeq == Seq("""a"b\c]d"""))
  }

  test("RFC5424 multiple SDATA blocks (test_msgparse.c:220)") {
    val p = SyslogLineParser.parse(
      """<5>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - - [timeQuality isSynced="0"][origin ip="127.0.0.1"] msg""",
      2024)
    assert(p.sdataKeys.toSeq == Seq("timeQuality.isSynced", "origin.ip"))
    assert(p.sdataVals.toSeq == Seq("0", "127.0.0.1"))
    assert(p.host == "mymachine" && p.message == "msg")
  }

  test("pathologically long fractional seconds still parse (test_msgparse.c:320)") {
    val p = SyslogLineParser.parse(
      "<7>2006-11-10T10:43:21.15600000000000000000000000000000000000000000000000000000000000+01:00 bzorp openvpn[2499]: x",
      2024)
    assert(p.host == "bzorp" && p.program == "openvpn")
    // 10:43:21.156+01:00 == 09:43:21.156Z
    assert(p.tsMicros ==
      java.time.Instant.parse("2006-11-10T09:43:21.156Z").toEpochMilli * 1000L)
  }

  test("RFC5424 Zulu with microsecond fraction (test_msgparse.c:672)") {
    val p = SyslogLineParser.parse(
      """<7>1 2006-10-29T01:59:59.156123Z myhost app - ID47 - m""", 2024)
    assert(p.tsMicros ==
      java.time.Instant.parse("2006-10-29T01:59:59.156123Z").toEpochMilli * 1000L + 123)
  }

  test("host token with dashes and dots (test_msgparse.c:568)") {
    val p = SyslogLineParser.parse(
      "<190>Nov 22 00:00:33 192.168.33.8-1 CMDLOGGER[165319912]: cmd done", 2024)
    assert(p.host == "192.168.33.8-1")
    assert(p.program == "CMDLOGGER" && p.pid == "165319912")
    assert(p.message == "cmd done")
  }

  test("ISO timestamp in RFC3164 position") {
    val p = SyslogLineParser.parse(
      "<13>2024-03-05T10:20:30+02:00 myhost app: hello", 2024)
    assert(p.host == "myhost")
    assert(p.program == "app")
    // 10:20:30+02:00 == 08:20:30Z
    assert(p.tsMicros == java.time.Instant.parse("2024-03-05T08:20:30Z").toEpochMilli * 1000L)
  }

  test("BSD timestamp year inference uses refYear") {
    val p = SyslogLineParser.parse("<13>Jun 30 12:00:00 h p: m", 2023)
    assert(p.tsMicros == java.time.Instant.parse("2023-06-30T12:00:00Z").toEpochMilli * 1000L)
  }

  test("expression integrates with DataFrame API") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      "<34>Oct 11 22:14:15 mymachine su[123]: 'su root' failed",
      "<165>1 2003-10-11T22:14:15.003Z host app 1 ID47 - msg").toDF("line")
      .select(graft.functions.GraftFunctions.parse_syslog(col("line")).as("p"))
      .select("p.facility", "p.severity", "p.host", "p.program", "p.message")
    val rows = df.collect()
    assert(rows(0).getInt(0) == 4 && rows(0).getString(2) == "mymachine")
    assert(rows(1).getString(3) == "app")
  }

  test("expression works via SQL registration") {
    import spark.implicits._
    Seq("<13>Feb  5 17:32:18 h p: m").toDF("line").createOrReplaceTempView("raw")
    val r = spark.sql("SELECT parse_syslog(line).program AS prg FROM raw").collect()
    assert(r(0).getString(0) == "p")
  }
}
