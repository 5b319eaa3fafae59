package graft

import graft.functions.SyslogLineParser
import graft.functions.SyslogLineParser.Parsed

/** Verbatim port of the reference's flagship parser battery
  * (`/root/reference/tests/unit/test_msgparse.c`) — every Test(msgparse,
  * ...) case with the engine's representation conventions:
  *
  *  - flags: LP_SYSLOG_PROTOCOL → `syslogProtocol=true` (strict RFC5424
  *    with error injection), LP_EXPECT_HOSTNAME → the engine default
  *    (hostname parse on), flags=0 → `noHostname=true` (the reference
  *    parses a legacy hostname ONLY under LP_EXPECT_HOSTNAME),
  *    LP_CHECK_HOSTNAME → `checkHostname=true`, LP_NO_HEADER →
  *    `noHeader=true`;
  *  - timestamps: the C suite runs under TZ=MET-1METDST and stores local
  *    wall-clock + offset; the engine parses zone-less stamps as UTC, so
  *    a C expectation (sec, usec, ofs) maps to ourMicros =
  *    (sec + ofs) * 1e6 + usec for zone-less stamps and sec * 1e6 + usec
  *    for stamps carrying an explicit zone;
  *  - "timestamp = now" expectations (the fake_time receive stamp) map
  *    to tsMicros == Long.MinValue (STAMP=RECVD downstream);
  *  - empty C values ("") map to null; SDATA keys drop the `.SDATA.`
  *    prefix (the egress prefixes it).
  */
class MsgparseBatterySpec extends GraftSuite {
  private def P(line: String, strict: Boolean = false,
      noHost: Boolean = false, check: Boolean = false,
      noHeader: Boolean = false, bad: String = null,
      refYear: Int = 2019): Parsed =
    SyslogLineParser.parse(line, refYear, noParse = false,
      expectHostname = true, noHostname = noHost, noParseDate = false,
      refMon = -1,
      badHostname = if (bad == null) null else java.util.regex.Pattern.compile(bad),
      syslogProtocol = strict, checkHostname = check, noHeader = noHeader)

  private def iso(s: String): Long = {
    val i = java.time.Instant.parse(s)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def sd(p: Parsed): Map[String, String] =
    if (p.sdataKeys == null) Map.empty
    else p.sdataKeys.zip(p.sdataVals).toMap

  test("test_parse_longer_than_32_sd_id: >32-char SD-ID accepted (:207)") {
    val p = P("<5>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - - " +
      "[timeQuality isSynced=\"0\"][1234567890123456789012345678901234 i=\"long_33\"]" +
      " An application event log entry...", strict = true)
    assert(p.pri == 5 && p.version == 1)
    assert(p.tsMicros == iso("2006-10-29T00:59:59.156Z"))
    assert(p.host == "mymachine" && p.program == "evntslog")
    assert(sd(p) == Map("timeQuality.isSynced" -> "0",
      "1234567890123456789012345678901234.i" -> "long_33"))
    assert(p.message == "An application event log entry...")
  }

  test("test_bad_sd_data_unescaped: strict parse error injects >@< (:238)") {
    val line = "<132>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - - " +
      "[a i=\"\"ok\"] An application event log entry..."
    val p = P(line, strict = true)
    assert(p.pri == 43)      // syslog.err (LOG_SYSLOG | LOG_ERR)
    assert(p.host == "" && p.program == "syslog-ng")
    assert(p.tsMicros == Long.MinValue) // STAMP = RECVD
    assert(p.message == "Error processing log message: " +
      "<132>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - - " +
      "[a i=\">@<\"ok\"] An application event log entry...")
    assert(p.sdataKeys == null)
  }

  test("test_timestamp: BSD year inference + ISO zones + DST folds (:261)") {
    // no timestamp → STAMP=RECVD, header parse continues
    val p0 = P("<15> openvpn[2499]: PTHREAD support initialized")
    assert(p0.pri == 15 && p0.tsMicros == Long.MinValue &&
      p0.program == "openvpn" && p0.pid == "2499" &&
      p0.message == "PTHREAD support initialized")
    // BSD Jan  1 / Jan 10 (C: MET sec+3600ofs → our UTC wall-clock)
    val p1 = P("<15>Jan  1 01:00:00 bzorp openvpn[2499]: PTHREAD support initialized")
    assert(p1.tsMicros == iso("2019-01-01T01:00:00Z") && p1.host == "bzorp")
    val p2 = P("<15>Jan 10 01:00:00 bzorp openvpn[2499]: PTHREAD support initialized")
    assert(p2.tsMicros == iso("2019-01-10T01:00:00Z"))
    // flags=0: first token after the timestamp is PROGRAM (:293)
    val p3 = P("<13>Jan  1 14:40:51 alma korte: message", noHost = true)
    assert(p3.pri == 13 && p3.host == null && p3.program == "alma" &&
      p3.message == "korte: message" &&
      p3.tsMicros == iso("2019-01-01T14:40:51Z"))
    // ISO zone math: +02:00 vs +01:00 one hour apart (:302-318)
    val p4 = P("<7>2006-11-10T10:43:21.156+02:00 bzorp openvpn[2499]: x")
    assert(p4.tsMicros == iso("2006-11-10T08:43:21.156Z"))
    val p5 = P("<7>2006-11-10T10:43:21.156+01:00 bzorp openvpn[2499]: x")
    assert(p5.tsMicros == iso("2006-11-10T09:43:21.156Z"))
    // DST-fold sides keep their explicit offsets (:338-390)
    assert(P("<7>2006-03-26T01:59:59.156+01:00 b o[1]: x").tsMicros ==
      iso("2006-03-26T00:59:59.156Z"))
    assert(P("<7>2006-03-26T02:00:00.156+01:00 b o[1]: x").tsMicros ==
      iso("2006-03-26T01:00:00.156Z"))
    assert(P("<7>2006-03-26T03:00:00.156+02:00 b o[1]: x").tsMicros ==
      iso("2006-03-26T01:00:00.156Z"))
    assert(P("<7>2006-10-29T01:00:00.156+02:00 b o[1]: x").tsMicros ==
      iso("2006-10-28T23:00:00.156Z"))
    assert(P("<7>2006-10-29T01:59:59.156+02:00 b o[1]: x").tsMicros ==
      iso("2006-10-28T23:59:59.156Z"))
    assert(P("<7>2006-10-29T02:00:00.156+02:00 b o[1]: x").tsMicros ==
      iso("2006-10-29T00:00:00.156Z"))
    // RFC5424 nil timestamp → RECVD (:392)
    val pn = P("<7>1 - bzorp openvpn 2499 - - PTHREAD support initialized",
      strict = true)
    assert(pn.tsMicros == Long.MinValue && pn.host == "bzorp" &&
      pn.program == "openvpn" && pn.pid == "2499" && pn.msgid == null &&
      pn.message == "PTHREAD support initialized")
  }

  test("test_foreign_timezone: foreign offsets pass through (:406)") {
    assert(P("<7>2006-10-29T01:00:00.156+01:00 b o[1]: x").tsMicros ==
      iso("2006-10-29T00:00:00.156Z"))
    assert(P("<7>2006-10-29T01:59:59.156+01:00 b o[1]: x").tsMicros ==
      iso("2006-10-29T00:59:59.156Z"))
    assert(P("<7>2006-10-29T02:00:00.156+01:00 b o[1]: x").tsMicros ==
      iso("2006-10-29T01:00:00.156Z"))
  }

  test("test_hostname: check-hostname rejects invalid-charset hosts (:443)") {
    val p = P("<7>2006-10-29T02:00:00.156+01:00 %bzorp openvpn[2499]: " +
      "PTHREAD support initialized", check = true)
    assert(p.host == null && p.program == "%bzorp")
    assert(p.message == "openvpn[2499]: PTHREAD support initialized")
    val q = P("<7>2006-10-29T02:00:00.156+01:00 bzorp openvpn[2499]: " +
      "PTHREAD support initialized", check = true)
    assert(q.host == "bzorp" && q.program == "openvpn" && q.pid == "2499")
  }

  test("test_timestamp_others: flags=0 program, empty tails, Dell (:471)") {
    // flags=0 on an ISO-stamped line: first token is PROGRAM
    val p = P("<7>2006-10-29T02:00:00.156+01:00 bzorp openvpn[2499]: " +
      "PTHREAD support initialized", noHost = true)
    assert(p.host == null && p.program == "bzorp" &&
      p.message == "openvpn[2499]: PTHREAD support initialized")
    // timestamp-only lines: everything after degrades to empty
    val t1 = P("<7>2006-10-29T02:00:00.156+01:00 ")
    assert(t1.tsMicros == iso("2006-10-29T01:00:00.156Z") &&
      t1.host == null && t1.program == null && t1.message == "")
    val t2 = P("<7>2006-10-29T02:00:00.156+01:00")
    assert(t2.tsMicros == iso("2006-10-29T01:00:00.156Z") &&
      t2.host == null && t2.program == null && t2.message == "")
    // bad-hostname(^ctld) + fractional-seconds micros precision (:512-539)
    val b1 = P("<7> Aug 29 02:00:00.156 ctld snmpd[2499]: PTHREAD support initialized",
      bad = "^ctld")
    assert(b1.host == null && b1.program == "ctld" &&
      b1.message == "snmpd[2499]: PTHREAD support initialized")
    assert(b1.tsMicros % 1000000L == 156000L)
    val b2 = P("<7> Aug 29 02:00:00.156789 ctld snmpd[2499]: x", bad = "^ctld")
    assert(b2.tsMicros % 1000000L == 156789L)
    val b3 = P("<7> Aug 29 02:00:00. ctld snmpd[2499]: x", bad = "^ctld")
    assert(b3.program == "ctld" && b3.tsMicros % 1000000L == 0L)
    // Dell switch: dashed-IP host + bracketed pid (:566-575)
    val d = P("<190>NOV 22 00:00:33 192.168.33.8-1 CMDLOGGER[165319912]: " +
      "cmd_logger_api.c(83) 13518 %% CLI:192.168.32.100:root:User  logged in")
    // NB: the reference's month scan is case-sensitive "Nov"; "NOV"
    // fails its rfc3164 scan too — both engines fall to the no-date path
    assert(d.pri == 190)
  }

  test("test_expected_sd_pairs_0: Cisco '.'/'%' prefixes + AIX forward (:582)") {
    // leading '.' = clock-synced attribute → timeQuality.isSynced=1
    val p = P("<190>.Apr 15 2007 21:28:13: %PIX-6-302014: Teardown TCP " +
      "connection 1688438 for bloomberg-net:1.2.3.4/8294 to inside:5.6.7.8/3639 " +
      "duration 0:07:01 bytes 16975 TCP FINs", bad = "^%")
    assert(sd(p) == Map("timeQuality.isSynced" -> "1"))
    assert(p.tsMicros == iso("2007-04-15T21:28:13Z"))
    assert(p.host == null && p.program == "%PIX-6-302014")
    assert(p.message == "Teardown TCP connection 1688438 for " +
      "bloomberg-net:1.2.3.4/8294 to inside:5.6.7.8/3639 duration 0:07:01 " +
      "bytes 16975 TCP FINs")
    // Cisco ASA: year-before-time, no colon after the timestamp
    val a = P("<190>Apr 15 2007 21:28:13 %ASA: this is a Cisco ASA timestamp",
      bad = "^%")
    assert(a.tsMicros == iso("2007-04-15T21:28:13Z"))
    assert(a.host == null && a.program == "%ASA" &&
      a.message == "this is a Cisco ASA timestamp")
    // linksys year-after-time
    val l = P("<190>Apr 15 21:28:13 2007 linksys app: msg")
    assert(l.tsMicros == iso("2007-04-15T21:28:13Z") &&
      l.host == "linksys" && l.program == "app" && l.message == "msg")
    // AIX forwarded message: hostname up to ':' (:620)
    val x = P("<38>Sep 22 10:11:56 Message forwarded from cdaix66: " +
      "sshd[679960]: Accepted publickey for nagios from 1.9.1.1 port 42096 ssh2")
    assert(x.host == "cdaix66" && x.program == "sshd" && x.pid == "679960")
    assert(x.message == "Accepted publickey for nagios from 1.9.1.1 port 42096 ssh2")
  }

  test("test_expected_sd_pairs_1: full SDATA + BOM strip + errors (:634)") {
    val sdPart = "[exampleSDID@0 iut=\"3\" eventSource=\"Application\" " +
      "eventID=\"1011\"][examplePriority@0 class=\"high\"]"
    val expectPairs = Map("exampleSDID@0.iut" -> "3",
      "exampleSDID@0.eventSource" -> "Application",
      "exampleSDID@0.eventID" -> "1011", "examplePriority@0.class" -> "high")
    // BOM (EF BB BF → U+FEFF) before the message is stripped
    val p = P("<7>1 2006-10-29T01:59:59.156+01:00 mymachine.example.com " +
      "evntslog - ID47 " + sdPart + " ﻿An application event log entry...",
      strict = true)
    assert(p.host == "mymachine.example.com" && p.program == "evntslog")
    assert(p.pid == null && p.msgid == "ID47")
    assert(sd(p) == expectPairs)
    assert(p.message == "An application event log entry...")
    assert(p.tsMicros == iso("2006-10-29T00:59:59.156Z"))
    // Zulu with milli and micro fractions
    val z = P("<7>1 2006-10-29T01:59:59.156Z m e - ID47 " + sdPart + " x",
      strict = true)
    assert(z.tsMicros == iso("2006-10-29T01:59:59.156Z"))
    val u = P("<7>1 2006-10-29T01:59:59.156123Z m e - ID47 " + sdPart + " x",
      strict = true)
    assert(u.tsMicros == iso("2006-10-29T01:59:59.156123Z"))
    // space after '[' → error with the marker before the '['
    val bad = "<7>1 2006-10-29T01:59:59.156Z mymachine.example.com evntslog " +
      "- ID47 [ exampleSDID@0 iut=\"3\"] x"
    val e = P(bad, strict = true)
    assert(e.pri == 43 && e.program == "syslog-ng")
    assert(e.message == "Error processing log message: " +
      "<7>1 2006-10-29T01:59:59.156Z mymachine.example.com evntslog - ID47 " +
      ">@<[ exampleSDID@0 iut=\"3\"] x")
    // +00:20 offset (RFC5424 example 4: 1200-second zone)
    val q = P("<34>1 1987-01-01T12:00:27.000087+00:20 192.0.2.1 myproc 8710 " +
      "- - %% It's time to make the do-nuts.", strict = true)
    assert(q.pri == 34 && q.host == "192.0.2.1" && q.program == "myproc")
    assert(q.pid == "8710" && q.msgid == null)
    assert(q.tsMicros == 536499627L * 1000000L + 87L)
    assert(q.message == "%% It's time to make the do-nuts.")
  }

  test("test_expected_sd_pairs_2: SD ends at first unbracketed gap (:713)") {
    val p = P("<132>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - - " +
      "[exampleSDID@0 iut=\"3\"] [eventSource=\"Application\" eventID=\"1011\"]" +
      "[examplePriority@0 class=\"high\"] An application event log entry...",
      strict = true)
    assert(sd(p) == Map("exampleSDID@0.iut" -> "3"))
    assert(p.message == "[eventSource=\"Application\" eventID=\"1011\"]" +
      "[examplePriority@0 class=\"high\"] An application event log entry...")
    // legacy: tag with pid and EMPTY message
    val q = P("<7>Aug 29 02:00:00 bzorp ctld/snmpd[2499]:")
    assert(q.host == "bzorp" && q.program == "ctld/snmpd" && q.pid == "2499")
    assert(q.message == "")
  }

  test("test_expected_sd_pairs_3: escaped quotes inside a long value (:750)") {
    val wireVal = "MSEXCHANGEOWAAPPPOOL.CONFIG\\\" -W \\\"\\\" -M 1 -AP " +
      "\\\"MSEXCHANGEOWAAPPPOOL5244fileserver.macartney.esbjerg CDG 1 7 7 1 " +
      "0 1 1 7 1 mail.macartney.esbjerg CDG 1 7 7 1 0 1 1 7 1 " +
      "maindc.macartney.esbjerg CD- 1 6 6 0 0 1 1 6 1 "
    val p = P("<134>1 2009-10-16T11:51:56+02:00 exchange.macartney.esbjerg " +
      "MSExchange_ADAccess 20208 - [origin ip=\"exchange.macartney.esbjerg\"]" +
      "[meta sequenceId=\"191732\" sysUpTime=\"68807696\"]" +
      "[EventData@18372.4 Data=\"" + wireVal + "\"]" +
      "[Keywords@18372.4 Keyword=\"Classic\"] ApplicationMSExchangeADAccess: message",
      strict = true)
    assert(p.host == "exchange.macartney.esbjerg")
    assert(p.program == "MSExchange_ADAccess" && p.pid == "20208")
    val m = sd(p)
    assert(m("origin.ip") == "exchange.macartney.esbjerg")
    assert(m("meta.sequenceId") == "191732")
    assert(m("EventData@18372.4.Data") ==
      "MSEXCHANGEOWAAPPPOOL.CONFIG\" -W \"\" -M 1 -AP " +
      "\"MSEXCHANGEOWAAPPPOOL5244fileserver.macartney.esbjerg CDG 1 7 7 1 " +
      "0 1 1 7 1 mail.macartney.esbjerg CDG 1 7 7 1 0 1 1 7 1 " +
      "maindc.macartney.esbjerg CD- 1 6 6 0 0 1 1 6 1 ")
    assert(m("Keywords@18372.4.Keyword") == "Classic")
    assert(p.message == "ApplicationMSExchangeADAccess: message")
    assert(p.tsMicros == iso("2009-10-16T09:51:56Z"))
  }

  test("test_expected_sd_pairs_long: escapes, 33-char names, limits (:781)") {
    val head = "<132>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - - "
    // \] \" \\ unescape to ] " \
    val p1 = P(head + "[a i=\"\\]\\\"\\\\\"] An application event log entry...",
      strict = true)
    assert(sd(p1) == Map("a.i" -> "]\"\\"))
    assert(p1.message == "An application event log entry...")
    // 33-char SD-ID / param name / both — all accepted
    val a33 = "a" * 33
    assert(sd(P(head + s"[$a33 i=\"long_33\"] x", strict = true)) ==
      Map(s"$a33.i" -> "long_33"))
    assert(sd(P(head + s"[a $a33=\"long_33\"] x", strict = true)) ==
      Map(s"a.$a33" -> "long_33"))
    assert(sd(P(head + s"[$a33 $a33=\"long_33\"] x", strict = true)) ==
      Map(s"$a33.$a33" -> "long_33"))
    // 255-char SD-ID overflows the 248-char buffer → error, marker after
    // the 248th stored char (the reference's exact position)
    val id255 = "a" * 255
    val e = P(head + s"[$id255 i=\"long\"] An application event log entry...",
      strict = true)
    assert(e.pri == 43 && e.program == "syslog-ng")
    assert(e.message == "Error processing log message: " + head + "[" +
      "a" * 247 + ">@<" + "a" * 8 + " i=\"long\"] An application event log entry...")
    // 256-char value truncates at sdata-param-value-max (255)
    val v = P(head + "[a i=\"" + "a" * 256 + "\"] An application event log entry...",
      strict = true)
    assert(sd(v) == Map("a.i" -> "a" * 255))
    assert(v.message == "An application event log entry...")
  }

  test("test_unescaped_too_long_message_parts: field caps + SD errors (:904)") {
    // 256-char hostname → error with the marker right before it
    val hostErr = P("<132>1 2006-10-29T01:59:59.156+01:00 " + "a" * 256 +
      " evntslog - - [a i=\"ok\"] An application event log entry...",
      strict = true)
    assert(hostErr.pri == 43)
    assert(hostErr.message == "Error processing log message: " +
      "<132>1 2006-10-29T01:59:59.156+01:00 >@<" + "a" * 256 +
      " evntslog - - [a i=\"ok\"] An application event log entry...")
    // 49-char appname truncates to 48
    val app = P("<132>1 2006-10-29T01:59:59.156+01:00 mymachine " + "a" * 49 +
      " - - [a i=\"ok\"] x", strict = true)
    assert(app.program == "a" * 48 && sd(app) == Map("a.i" -> "ok"))
    // 129-char procid truncates to 128
    val pid = P("<132>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog " +
      "a" * 129 + " - [a i=\"ok\"] x", strict = true)
    assert(pid.pid == "a" * 128)
    // 33-char msgid truncates to 32
    val mid = P("<132>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - " +
      "a" * 33 + " [a i=\"ok\"] x", strict = true)
    assert(mid.msgid == "a" * 32)
    // unescaped ']' inside a value → error AFTER the consumed ']'
    val ub = P("<132>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - - " +
      "[a i=\"]ok\"] An application event log entry...", strict = true)
    assert(ub.pri == 43)
    assert(ub.message == "Error processing log message: " +
      "<132>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - - " +
      "[a i=\">@<]ok\"] An application event log entry...")
  }

  test("test_expected_sd_pairs_tz_known: zone-less RFC5424 timestamp (:1004)") {
    val p = P("<134>1 2009-10-16T11:51:56 exchange.macartney.esbjerg " +
      "MSExchange_ADAccess 20208 - - An application event log entry...",
      strict = true)
    // C: local-zone (MET DST, 7200) → our UTC wall-clock = sec + ofs
    assert(p.tsMicros == (1255686716L + 7200L) * 1000000L)
    assert(p.host == "exchange.macartney.esbjerg" && p.pid == "20208")
    assert(p.message == "An application event log entry...")
  }

  test("test_expected_sd_pairs_enterprise_id + paramless SD element (:1033)") {
    val p = P("<134>1 2009-10-16T11:51:56+02:00 exchange.macartney.esbjerg " +
      "MSExchange_ADAccess 20208 - [origin enterpriseId=\"1.3.6.1.4.1\"] " +
      "An application event log entry...", strict = true)
    assert(sd(p) == Map("origin.enterpriseId" -> "1.3.6.1.4.1"))
    // KNOWN-BUG 20459 case: [nosdnvpair] SD-ID with no SD-PARAM parses
    // and registers the bare id with an empty value (:1062)
    val q = P("<134>1 2009-10-16T11:51:56+02:00 exchange.macartney.esbjerg " +
      "MSExchange_ADAccess 20208 - [origin enterpriseId=\"1.3.6.1.4.1\"]" +
      "[nosdnvpair] An application event log entry...", strict = true)
    assert(sd(q) == Map("origin.enterpriseId" -> "1.3.6.1.4.1",
      "nosdnvpair" -> ""))
    assert(q.message == "An application event log entry...")
  }

  test("test_ip_in_host: IPv4/IPv6 heuristics + Cisco sequence id (:1093)") {
    val p1 = P("<0>Jan 10 01:00:00 1.2.3.4 prg0")
    assert(p1.host == "1.2.3.4" && p1.program == "prg0")
    assert(p1.tsMicros == iso("2019-01-10T01:00:00Z"))
    val p2 = P("<0>Jan 10 01:00:00 0000:BABA:BA00:DAB:BABA:BABA:BABA:BAB0 prg0")
    assert(p2.host == "0000:BABA:BA00:DAB:BABA:BABA:BABA:BAB0" &&
      p2.program == "prg0")
    val p3 = P("<0>Jan 10 01:00:00 0001:BABA:BA00:DAB::BAB0 prg0")
    assert(p3.host == "0001:BABA:BA00:DAB::BAB0" && p3.program == "prg0")
    val p4 = P("<0>Jan 10 01:00:00 0002:: prg0: msgtxt")
    assert(p4.host == "0002::" && p4.program == "prg0" && p4.message == "msgtxt")
    // a lone trailing token is NOT a hostname (the scan must stop at a
    // space) — it becomes the program
    val p5 = P("<0>Jan 10 01:00:00 prg0")
    assert(p5.host == null && p5.program == "prg0" && p5.message == "")
    // flags=0: program with message, no ip
    val p6 = P("<0>Jan 10 01:00:00 prg0: msgtxt", noHost = true)
    assert(p6.program == "prg0" && p6.message == "msgtxt")
    // Cisco sequence number + '*' unsynced-clock + trailing ':' (:1150)
    val c = P("<0>91: *Oct 07 03:10:04: mydevice.com %CRYPTO-4-RECVD_PKT_INV_SPI: " +
      "decaps: rec'd IPSEC packet has invalid spi for destaddr=150.1.1.1, " +
      "prot=50, spi=0x72662541(1919296833), srcaddr=150.3.1.3")
    assert(sd(c) == Map("meta.sequenceId" -> "91", "timeQuality.isSynced" -> "0"))
    assert(c.tsMicros == iso("2019-10-07T03:10:04Z"))
    assert(c.host == "mydevice.com")
    assert(c.program == "%CRYPTO-4-RECVD_PKT_INV_SPI")
    assert(c.message == "decaps: rec'd IPSEC packet has invalid spi for " +
      "destaddr=150.1.1.1, prot=50, spi=0x72662541(1919296833), srcaddr=150.3.1.3")
  }

  test("flags(no-parse-date) consumes Cisco clock-sync chars but sets NO isSynced SDATA (syslog-format.c:228-238 guard)") {
    val line = "<0>91: *Oct 07 03:10:04: mydevice.com %CRYPTO-4-RECVD_PKT_INV_SPI: boom"
    val p = SyslogLineParser.parse(line, 2019, noParse = false,
      expectHostname = true, noHostname = false, noParseDate = true)
    // the '*' is consumed (_process_any_char) but the SDATA set is
    // guarded by LP_NO_PARSE_DATE; the sequence id is NOT guarded
    assert(sd(p) == Map("meta.sequenceId" -> "91"), sd(p).toString)
    assert(p.tsMicros == Long.MinValue) // stamp left unset under the flag
    assert(p.host == "mydevice.com")
    assert(p.program == "%CRYPTO-4-RECVD_PKT_INV_SPI" && p.message == "boom")
    // without the flag the same line carries isSynced=0 (regression guard)
    val q = P(line)
    assert(sd(q) == Map("meta.sequenceId" -> "91", "timeQuality.isSynced" -> "0"))
  }

  test("test_simple_message: no-header-at-all still extracts a program (:1166)") {
    val p = P("some message")
    assert(p.pri == 13 && p.host == null && p.program == "some" &&
      p.message == "message")
  }

  test("test_no_header_flag: LP_NO_HEADER keeps everything after PRI (:1188)") {
    val p = P("<189>some message", noHeader = true)
    assert(p.pri == 189 && p.program == null && p.host == null &&
      p.message == "some message")
  }
}
