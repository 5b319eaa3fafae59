package graft

import graft.functions.SyslogLineParser
import org.scalatest.funsuite.AnyFunSuite

/** The reference's timestamp-scanner battery, ported from
  * `/root/reference/lib/timeutils/tests/test_scan-timestamp.c`. The C
  * tests render in the local receive zone (Europe/Budapest); this
  * engine's parse is zone-free (UTC wall-clock micros, the zone applies
  * at egress), so expectations compare the parsed WALL-CLOCK instant.
  * The DST-rendering cases are egress-zone behavior, covered by
  * date-parser()'s DST-aware timezone() tests (DateParserBatterySpec).
  */
class ScanTimestampBatterySpec extends AnyFunSuite {

  /** Parse `<13>TS host msg` and return the stamp as micros. */
  private def bsd(ts: String, refYear: Int = 2017, refMon: Int = -1): Long = {
    val p = SyslogLineParser.parse(s"<13>$ts host prog: msg", refYear, refMon)
    p.tsMicros
  }

  private def utcMicros(iso: String): Long =
    java.time.Instant.parse(iso).toEpochMilli * 1000L +
      // keep sub-milli fraction exact
      (java.time.Instant.parse(iso).getNano / 1000) % 1000

  test("standard_bsd_format") {
    assert(bsd("Oct  1 17:46:12") == utcMicros("2017-10-01T17:46:12Z"))
  }

  test("bsd_extensions: fractions of a second") {
    assert(bsd("Dec  3 09:10:12.987") == utcMicros("2017-12-03T09:10:12.987Z"))
  }

  test("bsd_extensions: linksys year at the end") {
    assert(bsd("Dec  3 09:10:12 2019 ") == utcMicros("2019-12-03T09:10:12Z"))
  }

  test("bsd_extensions: cisco year after mon/day") {
    assert(bsd("Dec  3 2019 09:10:12:") == utcMicros("2019-12-03T09:10:12Z"))
    assert(bsd("Dec  3 2019 09:10:12 ") == utcMicros("2019-12-03T09:10:12Z"))
  }

  test("standard_bsd_format_year_in_the_future: Jan seen in Dec is NEXT year") {
    // reference now = 2017-12-13 (fake_time in the C test)
    assert(bsd("Jan  3 17:46:12.000", refYear = 2017, refMon = 12) ==
      utcMicros("2018-01-03T17:46:12Z"))
  }

  test("standard_bsd_format_year_in_the_past: Dec seen in Jan is LAST year") {
    // reference now = Jan 03 2018 (fake_time 1514968341)
    assert(bsd("Dec 31 17:46:12", refYear = 2018, refMon = 1) ==
      utcMicros("2017-12-31T17:46:12Z"))
  }

  test("year heuristic leaves non-adjacent months on the reference year") {
    assert(bsd("Jun 14 11:57:27", refYear = 2017, refMon = 12) ==
      utcMicros("2017-06-14T11:57:27Z"))
    assert(bsd("Feb  1 00:00:00", refYear = 2018, refMon = 1) ==
      utcMicros("2018-02-01T00:00:00Z"))
  }

  test("cisco_timestamps") {
    assert(bsd("Apr 29 13:58:40") == utcMicros("2017-04-29T13:58:40Z"))
    assert(bsd("Apr 29 13:58:40:") == utcMicros("2017-04-29T13:58:40Z"))
    assert(bsd("Apr 29 13:58:40.411") == utcMicros("2017-04-29T13:58:40.411Z"))
    assert(bsd("Apr 29 13:58:40.411:") == utcMicros("2017-04-29T13:58:40.411Z"))
    assert(bsd("Apr 29 2016 13:58:40 ") == utcMicros("2016-04-29T13:58:40Z"))
    assert(bsd("Apr 29 2016 13:58:40:") == utcMicros("2016-04-29T13:58:40Z"))
    assert(bsd("Apr 29 13:58:40 2016 ") == utcMicros("2016-04-29T13:58:40Z"))
  }

  test("rfc5424_timestamps") {
    def p5424(ts: String): Long =
      SyslogLineParser.parse(s"<13>1 $ts host app 1 - - msg", 2017).tsMicros
    assert(p5424("2017-06-14T23:57:27+02:00") == utcMicros("2017-06-14T21:57:27Z"))
    assert(p5424("2017-06-14T23:57:27Z") == utcMicros("2017-06-14T23:57:27Z"))
  }

  test("explicit offsets survive the spring DST gap (wall clock kept)") {
    // 02:00-02:59+01:00 does not exist in CET->CEST, but with an
    // explicit offset the incoming zone and hour stay intact
    def iso(ts: String): Long =
      SyslogLineParser.parse(s"<13>$ts host prog: msg", 2018).tsMicros
    assert(iso("2018-03-25T02:00:00+01:00") == utcMicros("2018-03-25T01:00:00Z"))
    assert(iso("2018-03-25T02:00:00+02:00") == utcMicros("2018-03-25T00:00:00Z"))
    assert(iso("2018-03-25T02:59:59+01:00") == utcMicros("2018-03-25T01:59:59Z"))
  }

  test("bad-hostname(): a matching token is the program, not the host (test_msgparse.c:502-566)") {
    val bad = java.util.regex.Pattern.compile("^ctld")
    val p = SyslogLineParser.parse(
      "<7>2006-10-29T02:00:00.156+01:00 ctld snmpd[2499]: PTHREAD support initialized",
      2017, noParse = false, expectHostname = true, noHostname = false,
      noParseDate = false, badHostname = bad)
    assert(p.host == null || p.host == "")
    assert(p.program == "ctld")
    assert(p.message == "snmpd[2499]: PTHREAD support initialized")

    val pix = java.util.regex.Pattern.compile("^%")
    val q = SyslogLineParser.parse(
      "<190>Apr 15 2007 21:28:13: %PIX-6-302014: Teardown TCP connection 1688438",
      2017, noParse = false, expectHostname = true, noHostname = false,
      noParseDate = false, badHostname = pix)
    assert(q.host == null || q.host == "")
    assert(q.program == "%PIX-6-302014")
    assert(q.message == "Teardown TCP connection 1688438")

    // without bad-hostname, expect-hostname takes the token as HOST
    val r = SyslogLineParser.parse(
      "<7>2006-10-29T02:00:00.156+01:00 ctld snmpd[2499]: PTHREAD support initialized",
      2017, noParse = false, expectHostname = true, noHostname = false,
      noParseDate = false)
    assert(r.host == "ctld" && r.program == "snmpd")
  }

  test("scan_month_abbrev / scan_day_abbrev reject invalid names") {
    // an invalid month makes the whole BSD stamp unparsable -> the line
    // degrades to MESSAGE (reference returns FALSE and restores pos)
    assert(bsd("Mop  1 17:46:12") == Long.MinValue)
    assert(bsd("XXX  1 17:46:12") == Long.MinValue)
  }
}
