package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.unsafe.types.UTF8String

/** Syslog line parser: RFC3164 ("legacy"/BSD) and RFC5424 in one pass.
  *
  * Behavioral reference: `/root/reference/modules/syslogformat/
  * syslog-format.c` — PRI `<13>` split into facility*8+severity (:64-103),
  * BSD timestamp (:245-290), hostname heuristics (:440), `program[pid]:`
  * header (:319,732), RFC5424 VERSION (:292) and SDATA `[id a="b"]`
  * flattened to `id.a` keys (:518-).
  *
  * This is a clean-room implementation: a single left-to-right scan over
  * the line, no regexes, no intermediate splits, so it can sit inside
  * whole-stage codegen as one static call per row.
  *
  * Output row layout matches [[graft.model.LogSchema.parsedSchema]]:
  * (pri, facility, severity, version, ts_micros, host, program, pid,
  * msgid, sdata, message).
  */
object SyslogLineParser {
  final val DefaultPri = 13 // user.notice, reference syslog-format.c default

  private val months = Map(
    "Jan" -> 1, "Feb" -> 2, "Mar" -> 3, "Apr" -> 4, "May" -> 5, "Jun" -> 6,
    "Jul" -> 7, "Aug" -> 8, "Sep" -> 9, "Oct" -> 10, "Nov" -> 11, "Dec" -> 12)

  private val cumDays = Array(0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)

  private def isLeap(y: Int): Boolean =
    (y % 4 == 0 && y % 100 != 0) || y % 400 == 0

  /** Days since epoch for a civil date (proleptic Gregorian, public
    * Howard Hinnant algorithm shape). */
  private def daysFromCivil(y: Int, m: Int, d: Int): Long = {
    val yy = if (m <= 2) y - 1 else y
    val era = (if (yy >= 0) yy else yy - 399) / 400
    val yoe = yy - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    era * 146097L + doe - 719468L
  }

  /** Epoch micros from date-time parts + tz offset seconds. */
  private def toMicros(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int,
      micros: Int, tzOffSec: Int): Long = {
    val days = daysFromCivil(y, mo, d)
    (days * 86400L + h * 3600L + mi * 60L + s - tzOffSec) * 1000000L + micros
  }

  // ---- scanning state ----------------------------------------------------
  final class Cursor(val s: String) {
    var pos: Int = 0
    def len: Int = s.length
    def atEnd: Boolean = pos >= len
    def peek: Char = if (pos < len) s.charAt(pos) else '\u0000'
    def skipSpaces(): Unit = while (pos < len && s.charAt(pos) == ' ') pos += 1
  }

  private def parseIntUpTo(c: Cursor, maxDigits: Int): Int = {
    var v = 0; var n = 0
    while (n < maxDigits && !c.atEnd && c.peek >= '0' && c.peek <= '9') {
      v = v * 10 + (c.peek - '0'); c.pos += 1; n += 1
    }
    if (n == 0) -1 else v
  }

  /** ISO8601-ish timestamp: `YYYY-MM-DD[T ]HH:MM:SS[.frac][Z|±HH:MM|±HHMM]`.
    * Returns epoch micros or Long.MinValue on failure (cursor restored). */
  def parseIsoTimestamp(c: Cursor): Long = {
    val start = c.pos
    def fail(): Long = { c.pos = start; Long.MinValue }
    val y = parseIntUpTo(c, 4)
    if (y < 0 || c.peek != '-') return fail()
    c.pos += 1
    val mo = parseIntUpTo(c, 2)
    if (mo < 1 || mo > 12 || c.peek != '-') return fail()
    c.pos += 1
    val d = parseIntUpTo(c, 2)
    if (d < 1 || d > 31) return fail()
    if (c.peek != 'T' && c.peek != 't' && c.peek != ' ') return fail()
    c.pos += 1
    val h = parseIntUpTo(c, 2)
    if (h < 0 || h > 23 || c.peek != ':') return fail()
    c.pos += 1
    val mi = parseIntUpTo(c, 2)
    if (mi < 0 || mi > 59 || c.peek != ':') return fail()
    c.pos += 1
    val s = parseIntUpTo(c, 2)
    if (s < 0 || s > 60) return fail()
    var micros = 0
    if (c.peek == '.' || c.peek == ',') {
      c.pos += 1
      var scale = 100000
      var digits = 0
      while (!c.atEnd && c.peek >= '0' && c.peek <= '9') {
        if (digits < 6) { micros += (c.peek - '0') * scale; scale /= 10 }
        digits += 1; c.pos += 1
      }
      if (digits == 0) return fail()
    }
    var tzOff = 0
    c.peek match {
      case 'Z' | 'z' => c.pos += 1
      case '+' | '-' =>
        val sign = if (c.peek == '-') -1 else 1
        c.pos += 1
        val th = parseIntUpTo(c, 2)
        if (th < 0) return fail()
        var tm = 0
        if (c.peek == ':') { c.pos += 1; tm = math.max(parseIntUpTo(c, 2), 0) }
        else { val t = parseIntUpTo(c, 2); if (t > 0) tm = t }
        tzOff = sign * (th * 3600 + tm * 60)
      case _ => // no tz: treat as UTC (caller-level default zone)
    }
    toMicros(y, mo, d, h, mi, s, micros, tzOff)
  }

  /** Four digits followed by space/end → a year token (the reference's
    * Cisco/linksys year heuristics, `syslog-format.c:245-290`). Returns
    * -1 and restores the cursor otherwise. */
  private def tryYear(c: Cursor): Int = {
    val save = c.pos
    val y = parseIntUpTo(c, 4)
    if (y >= 1000 && c.pos - save == 4 && (c.atEnd || c.peek == ' ')) y
    else { c.pos = save; -1 }
  }

  /** BSD timestamp `MMM [ d|dd] HH:MM:SS` with the reference's extended
    * forms: Cisco year-before-time (`Apr 15 2007 21:28:13`), linksys
    * year-after-time (`Apr 15 21:28:13 2007`), fractional seconds
    * (`02:00:00.156789`). Year inferred from refYear when absent; with a
    * reference month (`refMon` 1-12), the December/January adjacency
    * heuristic of `wallclocktime.c determine_year_for_month` applies —
    * a Dec stamp parsed in Jan is LAST year, a Jan stamp parsed in Dec
    * is NEXT year (test_scan-timestamp.c year_in_the_past/future).
    * Returns epoch micros or Long.MinValue (cursor restored on failure). */
  def parseBsdTimestamp(c: Cursor, refYear: Int, refMon: Int = -1): Long = {
    val start = c.pos
    def fail(): Long = { c.pos = start; Long.MinValue }
    if (c.pos + 3 > c.len) return fail()
    val mon = months.getOrElse(c.s.substring(c.pos, c.pos + 3), -1)
    if (mon < 0) return fail()
    c.pos += 3
    if (c.peek != ' ') return fail()
    c.skipSpaces()
    val d = parseIntUpTo(c, 2)
    if (d < 1 || d > 31 || c.peek != ' ') return fail()
    c.pos += 1
    // Cisco: year between day and time
    var year = tryYear(c)
    if (year > 0 && c.peek == ' ') c.pos += 1
    val h = parseIntUpTo(c, 2)
    if (h < 0 || h > 23 || c.peek != ':') return fail()
    c.pos += 1
    val mi = parseIntUpTo(c, 2)
    if (mi < 0 || mi > 59 || c.peek != ':') return fail()
    c.pos += 1
    val s = parseIntUpTo(c, 2)
    if (s < 0 || s > 60) return fail()
    var micros = 0
    if (c.peek == '.') {
      c.pos += 1
      var scale = 100000
      while (!c.atEnd && c.peek >= '0' && c.peek <= '9') {
        if (scale > 0) { micros += (c.peek - '0') * scale; scale /= 10 }
        c.pos += 1
      }
    }
    // linksys: year after the time
    if (year < 0 && c.peek == ' ') {
      val save = c.pos
      c.pos += 1
      year = tryYear(c)
      if (year < 0) c.pos = save
    }
    if (year < 0)
      year =
        if (mon == 12 && refMon == 1) refYear - 1
        else if (mon == 1 && refMon == 12) refYear + 1
        else refYear
    toMicros(year, mon, d, h, mi, s, micros, 0)
  }

  // ---- RFC5424 -----------------------------------------------------------
  /** Reads a RFC5424 header token (up to space), NILVALUE `-` -> null. */
  private def token(c: Cursor): String = {
    val start = c.pos
    while (!c.atEnd && c.peek != ' ') c.pos += 1
    val t = c.s.substring(start, c.pos)
    if (!c.atEnd) c.pos += 1 // consume single separating space
    if (t == "-") null else t
  }

  /** Parses `[id k="v" ...]...` into flattened `id.k` pairs.
    * Reference flattens to `.SDATA.id.k` (`syslog-format.c:518-`); we keep
    * `id.k` and let the egress prefix. Returns null on malformed SD. */
  def parseSdata(c: Cursor, keys: java.util.ArrayList[String],
      vals: java.util.ArrayList[String]): Boolean = {
    while (c.peek == '[') {
      c.pos += 1
      val idStart = c.pos
      while (!c.atEnd && c.peek != ' ' && c.peek != ']') c.pos += 1
      val id = c.s.substring(idStart, c.pos)
      while (c.peek == ' ') {
        c.skipSpaces()
        if (c.peek == ']') return false
        val kStart = c.pos
        while (!c.atEnd && c.peek != '=') c.pos += 1
        if (c.atEnd) return false
        val k = c.s.substring(kStart, c.pos)
        c.pos += 1 // '='
        if (c.peek != '"') return false
        c.pos += 1
        val sb = new java.lang.StringBuilder()
        while (!c.atEnd && c.peek != '"') {
          if (c.peek == '\\' && c.pos + 1 < c.len) {
            val n = c.s.charAt(c.pos + 1)
            if (n == '"' || n == '\\' || n == ']') { sb.append(n); c.pos += 2 }
            else { sb.append('\\'); c.pos += 1 }
          } else { sb.append(c.peek); c.pos += 1 }
        }
        if (c.atEnd) return false
        c.pos += 1 // closing quote
        keys.add(id + "." + k)
        vals.add(sb.toString)
      }
      if (c.peek != ']') return false
      c.pos += 1
    }
    true
  }

  // ---- parsed result -----------------------------------------------------
  final case class Parsed(
      pri: Int, version: Int, tsMicros: Long, host: String, program: String,
      pid: String, msgid: String, sdataKeys: Array[String],
      sdataVals: Array[String], message: String)

  /** Main entry: parse one raw line. Never throws; unparsable parts
    * degrade exactly like the reference (whole line becomes MESSAGE,
    * pri defaults to 13). */
  def parse(line: String, refYear: Int): Parsed =
    parse(line, refYear, noParse = false, expectHostname = false,
      noHostname = false, noParseDate = false)

  def parse(line: String, refYear: Int, refMon: Int): Parsed =
    parse(line, refYear, noParse = false, expectHostname = false,
      noHostname = false, noParseDate = false, refMon = refMon)

  /** flags() form (`lib/msg-format.h:37-60`, dispatch `msg-format.c:113`):
    *  - no-parse (LP_NOPARSE): the entire line becomes MESSAGE, nothing
    *    else is extracted (pri stays the default);
    *  - expect-hostname / no-hostname (LP_EXPECT_HOSTNAME /
    *    LP_CHECK_HOSTNAME absence): force / suppress the RFC3164
    *    hostname heuristic;
    *  - no-parse-date (LP_NO_PARSE_DATE): header parses normally but the
    *    stamp is left unset (STAMP=RECVD downstream);
    *  - assume-utf8 / validate-utf8 / sanitize-utf8 are no-ops here: the
    *    engine's strings are already decoded/valid UTF-8 at ingest. */
  def parse(line: String, refYear: Int, noParse: Boolean,
      expectHostname: Boolean, noHostname: Boolean,
      noParseDate: Boolean, refMon: Int = -1,
      badHostname: java.util.regex.Pattern = null): Parsed = {
    if (noParse)
      return Parsed(DefaultPri, 0, Long.MinValue, null, null, null, null,
        null, null, line)
    val p = parseImpl(line, refYear, expectHostname, noHostname, refMon,
      badHostname)
    if (noParseDate && p.tsMicros != Long.MinValue) p.copy(tsMicros = Long.MinValue)
    else p
  }

  private def parseImpl(line: String, refYear: Int,
      expectHostname: Boolean, noHostname: Boolean,
      refMon: Int = -1,
      badHostname: java.util.regex.Pattern = null): Parsed = {
    val c = new Cursor(line)
    var pri = DefaultPri
    // <PRI>
    if (c.peek == '<') {
      val save = c.pos
      c.pos += 1
      val v = parseIntUpTo(c, 3)
      if (v >= 0 && c.peek == '>') { pri = v; c.pos += 1 }
      else c.pos = save
    }
    // RFC5424: VERSION SP
    if (c.peek == '1' && c.pos + 1 < c.len && c.s.charAt(c.pos + 1) == ' ') {
      val save = c.pos
      c.pos += 2
      val ts = if (c.peek == '-') { c.pos += 2; Long.MinValue }
               else { val t = parseIsoTimestamp(c); if (!c.atEnd) c.pos += 1; t }
      val nilTs = save + 2 < c.len && c.s.charAt(save + 2) == '-'
      if (ts != Long.MinValue || nilTs) {
        val host = token(c)
        val app = token(c)
        val procid = token(c)
        val msgid = token(c)
        var sdK: Array[String] = null
        var sdV: Array[String] = null
        if (c.peek == '-') { c.pos += 1 }
        else if (c.peek == '[') {
          val keys = new java.util.ArrayList[String]()
          val vals = new java.util.ArrayList[String]()
          if (parseSdata(c, keys, vals)) {
            sdK = keys.toArray(new Array[String](keys.size))
            sdV = vals.toArray(new Array[String](vals.size))
          }
        }
        if (c.peek == ' ') c.pos += 1
        var msg = if (c.atEnd) "" else c.s.substring(c.pos)
        if (msg.startsWith("﻿")) msg = msg.substring(1)
        return Parsed(pri, 1, ts, host, app, procid, msgid, sdK, sdV, msg)
      }
      c.pos = save
    }
    // RFC3164
    val afterPri = c.pos
    c.skipSpaces() // reference tolerates spaces between PRI and timestamp
    var ts = parseBsdTimestamp(c, refYear, refMon)
    if (ts == Long.MinValue) ts = parseIsoTimestamp(c)
    var host: String = null
    var program: String = null
    var pid: String = null
    var msg: String = line.substring(if (ts == Long.MinValue) afterPri else c.pos)
    val noTs = ts == Long.MinValue
    if (noTs) c.pos = afterPri
    else {
      // Cisco form carries a trailing ':' after the timestamp
      if (c.peek == ':') c.pos += 1
    }
    {
      c.skipSpaces()
      var progFromBad = false
      // hostname heuristic (syslog-format.c:440): next token is HOST unless
      // it looks like the tag (`prog[pid]:` / `prog:`). Without a
      // timestamp the header parse continues too (STAMP=RECVD,
      // syslog-format.c:732) but no hostname is expected.
      if (!noTs && !noHostname) {
        val t1Start = c.pos
        while (!c.atEnd && c.peek != ' ') c.pos += 1
        val t1 = c.s.substring(t1Start, c.pos)
        // expect-hostname forces the first token to be HOST even when it
        // looks like a tag (LP_EXPECT_HOSTNAME)
        val looksLikeTag = !expectHostname &&
          (t1.indexOf(':') >= 0 || t1.indexOf('[') >= 0)
        // bad-hostname(): a token matching the option regex is NEVER a
        // hostname — it becomes the program tag instead
        // (msg-format.h bad_hostname, test_msgparse.c "^ctld" cases)
        val isBad = badHostname != null && badHostname.matcher(t1).find()
        if (looksLikeTag || isBad) { c.pos = t1Start; progFromBad = isBad }
        else { host = t1; c.skipSpaces() }
      }
      // TAG: program[pid]: message   (syslog-format.c:319,732 — tag <=32 chars)
      val tagStart = c.pos
      var i = c.pos
      var brk = -1; var col = -1
      while (i < c.len && (i - tagStart) <= 32 && brk < 0 && col < 0) {
        val ch = c.s.charAt(i)
        if (ch == '[') brk = i
        else if (ch == ':') col = i
        else if (ch == ' ') i = c.len // tag cannot contain space
        i += 1
      }
      if (brk >= 0) {
        program = c.s.substring(tagStart, brk)
        val close = c.s.indexOf(']', brk)
        if (close > brk) {
          pid = c.s.substring(brk + 1, close)
          var m = close + 1
          if (m < c.len && c.s.charAt(m) == ':') m += 1
          if (m < c.len && c.s.charAt(m) == ' ') m += 1
          msg = c.s.substring(m)
        } else { program = null; msg = c.s.substring(tagStart) }
      } else if (col >= 0) {
        program = c.s.substring(tagStart, col)
        var m = col + 1
        if (m < c.len && c.s.charAt(m) == ' ') m += 1
        msg = c.s.substring(m)
      } else if (progFromBad) {
        // bad-hostname rejected the token: the reference program parse
        // (log_msg_parse_legacy_program_name) is space-terminated too,
        // so the token becomes PROGRAM and the rest the message
        var e = tagStart
        while (e < c.len && c.s.charAt(e) != ' ') e += 1
        program = c.s.substring(tagStart, e)
        var m = e
        if (m < c.len && c.s.charAt(m) == ' ') m += 1
        msg = c.s.substring(m)
      } else if (!noTs) {
        msg = c.s.substring(tagStart)
      }
    }
    Parsed(pri, 0, ts, host, program, pid, msgid = null,
      sdataKeys = null, sdataVals = null, message = msg)
  }

  /** Codegen entry point: returns the struct as an InternalRow. */
  def parseRow(line: UTF8String, refYear: Int): InternalRow =
    parseRow(line, refYear, noParse = false, expectHostname = false,
      noHostname = false, noParseDate = false)

  def parseRow(line: UTF8String, refYear: Int, noParse: Boolean,
      expectHostname: Boolean, noHostname: Boolean,
      noParseDate: Boolean): InternalRow =
    parseRow(line, refYear, noParse, expectHostname, noHostname,
      noParseDate, -1)

  def parseRow(line: UTF8String, refYear: Int, noParse: Boolean,
      expectHostname: Boolean, noHostname: Boolean,
      noParseDate: Boolean, refMon: Int): InternalRow =
    parseRow(line, refYear, noParse, expectHostname, noHostname,
      noParseDate, refMon, null)

  def parseRow(line: UTF8String, refYear: Int, noParse: Boolean,
      expectHostname: Boolean, noHostname: Boolean,
      noParseDate: Boolean, refMon: Int,
      badHostname: java.util.regex.Pattern): InternalRow = {
    val p = parse(line.toString, refYear, noParse, expectHostname,
      noHostname, noParseDate, refMon, badHostname)
    val r = new GenericInternalRow(11)
    r.setInt(0, p.pri)
    r.setInt(1, p.pri / 8)
    r.setInt(2, p.pri % 8)
    r.setInt(3, p.version)
    if (p.tsMicros == Long.MinValue) r.setNullAt(4) else r.setLong(4, p.tsMicros)
    r.update(5, UTF8String.fromString(p.host))
    r.update(6, UTF8String.fromString(p.program))
    r.update(7, UTF8String.fromString(p.pid))
    r.update(8, UTF8String.fromString(p.msgid))
    if (p.sdataKeys == null) r.setNullAt(9)
    else r.update(9, ArrayBasedMapData(p.sdataKeys.map(UTF8String.fromString),
      p.sdataVals.map(UTF8String.fromString)))
    r.update(10, UTF8String.fromString(p.message))
    r
  }
}
