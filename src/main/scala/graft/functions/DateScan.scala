package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `date_scan(text)` — the date-parser() engine
  * (`/root/reference/modules/timestamp/date-parser.c` +
  * `lib/timeutils/scan-timestamp.c` / `wallclocktime.c` strptime):
  *
  *   - a LIST of strftime formats tried in order (`format()` multi-arg,
  *     `test_date.c:229-264`); no format = the ISO8601 scanner
  *   - `%z`/`%Z` accept `+HH:MM`, `+HHMM`, `Z`, military single letters
  *     (A..M = -1..-12, N..Y = +1..+12) and common zone abbreviations
  *     (PDT, EDT, CET, GMT ... — `test_date.c:103-117,144-147`)
  *   - missing year → closest-year heuristic (Jan in Dec = next year,
  *     Dec in Jan = previous year, `test_date.c:132-137`); missing
  *     date fields default (month/day = 1, whole date = today,
  *     `test_date.c:173-180`)
  *   - `%s` epoch, `%f` fractional seconds (`,706` = 706000 µs)
  *   - input must be FULLY consumed (`test_date.c:210` trailing text
  *     fails)
  *   - timezone() names the wall-clock zone when the input carries no
  *     offset (DST-aware for named zones); guess-timezone reinterprets
  *     the wall clock in the receiver zone when that lands closer to
  *     "now" (`test_date.c:267-288`)
  *
  * Returns `struct<ok boolean, epoch bigint, usec int, gmtoff int>` —
  * gmtoff preserves the PARSED offset like the reference's
  * `ut_gmtoff`, so ISODATE can render in the sender's zone.
  */
case class DateScan(child: Expression, formats: Seq[String],
    timezone: Option[String], defaultZone: String, refEpochSec: Long,
    guessTimezone: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("epoch", LongType),
    StructField("usec", IntegerType),
    StructField("gmtoff", IntegerType)))

  override def prettyName: String = "date_scan"

  def scan(text: UTF8String): InternalRow =
    DateScan.run(text.toString, formats, timezone, defaultZone, refEpochSec,
      guessTimezone)

  override protected def nullSafeEval(v: Any): Any =
    scan(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("dateScan", this, classOf[DateScan].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.scan($v);")
  }

  override protected def withNewChildInternal(c: Expression): DateScan =
    copy(child = c)
}

object DateScan {

  private val Months = Seq("jan", "feb", "mar", "apr", "may", "jun", "jul",
    "aug", "sep", "oct", "nov", "dec")

  /** RFC822 North American zone tables (wallclocktime.c `nast`/`nadt`):
    * index i maps to offset (-5 - i) / (-4 - i) hours. */
  private val Nast = Seq("EST", "CST", "MST", "PST")
  private val Nadt = Seq("EDT", "CDT", "MDT", "PDT")

  /** Stand-in for the reference's `cached_get_system_tznames()` pair
    * (the local zone's std/dst names): the names its own tests and
    * common logs use, with their fixed offsets. Checked AFTER the
    * RFC822 tables, like the reference's lookup order. */
  private val LocalZones: Seq[(String, Int)] = Seq(
    "CEST" -> 2 * 3600, "CET" -> 3600, "METDST" -> 2 * 3600,
    "MET" -> 3600, "BST" -> 3600, "WEST" -> 3600, "WET" -> 0)

  private final class Wct {
    var year: Int = -1
    var mon: Int = -1 // 0-based
    var mday: Int = -1
    var hour: Int = -1
    var min: Int = -1
    var sec: Int = -1
    var usec: Int = 0
    var yday: Int = -1
    var gmtoff: Int = Int.MinValue
    var epoch: Long = Long.MinValue // %s
    var pm: Boolean = false
    var sawAmPm: Boolean = false
  }

  /** strptime-subset scan; returns chars consumed or -1. */
  private def scanFormat(text: String, fmt: String, w: Wct): Int = {
    var ti = 0
    var fi = 0
    def digits(min: Int, max: Int): Int = {
      var n = 0
      var cnt = 0
      while (cnt < max && ti < text.length && text.charAt(ti).isDigit) {
        n = n * 10 + (text.charAt(ti) - '0'); ti += 1; cnt += 1
      }
      if (cnt < min) -1 else n
    }
    // %z/%Z scanner — faithful port of the reference's strptime
    // timezone case (wallclocktime.c:609-746): the G/U/Z switch with
    // its fallthroughs (so "UTC" consumes just "UT" — the reference's
    // own quirk), [+-] offsets accepting EXACTLY 2 or 4 digits (':'
    // allowed after the first two, minutes < 60 — "+300"/"+3" are
    // invalid while bare "+30" means 30 hours), the RFC822 North
    // American tables as case-insensitive PREFIX matches, the local
    // tzname stand-ins, and military single letters with BOTH 'J' and
    // 'K' unused (:685-696 — L..M are -11/-12). %z skips leading
    // whitespace and is mandatory; %Z consumes nothing on a failed
    // match; a partial G/U match ABORTS the whole parse for both
    // (:636-641 return NULL).
    def zone(mandatory: Boolean): Int = { // 1 ok, 0 rollback-ok, -1 abort
      val save = ti
      def rollback(): Int = { ti = save; if (mandatory) -1 else 0 }
      if (mandatory)
        while (ti < text.length && text.charAt(ti) == ' ') ti += 1
      if (ti >= text.length) return rollback()
      val c = text.charAt(ti); ti += 1
      c match {
        case 'G' =>
          if (ti < text.length && text.charAt(ti) == 'M') {
            ti += 1
            if (ti < text.length && text.charAt(ti) == 'T') {
              ti += 1; w.gmtoff = 0; 1
            } else -1
          } else -1
        case 'U' =>
          if (ti < text.length && text.charAt(ti) == 'T') {
            ti += 1; w.gmtoff = 0; 1
          } else -1
        case 'Z' => w.gmtoff = 0; 1
        case '+' | '-' =>
          val sign = if (c == '-') -1 else 1
          var offs = 0
          var i = 0
          var brk = false
          while (i < 4 && !brk) {
            if (ti < text.length && text.charAt(ti).isDigit) {
              offs = offs * 10 + (text.charAt(ti) - '0'); ti += 1; i += 1
            } else if (i == 2 && ti < text.length && text.charAt(ti) == ':')
              ti += 1
            else brk = true
          }
          if (i == 2) { w.gmtoff = sign * offs * 3600; 1 }
          else if (i == 4 && offs % 100 < 60) {
            w.gmtoff = sign * ((offs / 100) * 3600 + (offs % 100) * 60); 1
          } else rollback()
        case _ =>
          ti -= 1
          val rest = text.substring(ti)
          def pfx(names: Seq[String]): Int =
            names.indexWhere(n => rest.regionMatches(true, 0, n, 0, n.length))
          val iN = pfx(Nast)
          val iD = if (iN >= 0) -1 else pfx(Nadt)
          val iL = if (iN >= 0 || iD >= 0) -1
            else LocalZones.indexWhere { case (n, _) =>
              rest.regionMatches(true, 0, n, 0, n.length) }
          if (iN >= 0) { w.gmtoff = (-5 - iN) * 3600; ti += 3; 1 }
          else if (iD >= 0) { w.gmtoff = (-4 - iD) * 3600; ti += 3; 1 }
          else if (iL >= 0) {
            w.gmtoff = LocalZones(iL)._2; ti += LocalZones(iL)._1.length; 1
          } else {
            val m = if (rest.nonEmpty) rest.charAt(0) else ' '
            if ((m >= 'A' && m <= 'I') || (m >= 'L' && m <= 'Y')) {
              w.gmtoff =
                if (m <= 'I') -(m - 'A' + 1) * 3600
                else if (m <= 'M') -(m - 'A') * 3600 // L = -11, M = -12
                else (m - 'M') * 3600 // N..Y = +1..+12
              ti += 1; 1
            } else rollback()
          }
      }
    }
    def dir(c: Char): Boolean = c match {
      case 'Y' => val v = digits(4, 4); if (v < 0) false else { w.year = v; true }
      case 'y' => val v = digits(2, 2); if (v < 0) false
        else { w.year = if (v < 70) 2000 + v else 1900 + v; true }
      case 'm' => val v = digits(1, 2); if (v < 1 || v > 12) false else { w.mon = v - 1; true }
      case 'd' | 'e' => val v = digits(1, 2); if (v < 1 || v > 31) false else { w.mday = v; true }
      case 'H' => val v = digits(1, 2); if (v < 0 || v > 23) false else { w.hour = v; true }
      case 'I' => val v = digits(1, 2); if (v < 1 || v > 12) false else { w.hour = v % 12; true }
      case 'M' => val v = digits(1, 2); if (v < 0 || v > 59) false else { w.min = v; true }
      case 'S' => val v = digits(1, 2); if (v < 0 || v > 60) false else { w.sec = v; true }
      case 'j' => val v = digits(1, 3); if (v < 1 || v > 366) false
        else { w.yday = v; true }
      case 'f' =>
        val start = ti
        var n = 0L
        while (ti < text.length && text.charAt(ti).isDigit && ti - start < 9) {
          n = n * 10 + (text.charAt(ti) - '0'); ti += 1
        }
        if (ti == start) false
        else {
          var usec = n
          var len = ti - start
          while (len < 6) { usec *= 10; len += 1 }
          while (len > 6) { usec /= 10; len -= 1 }
          w.usec = usec.toInt; true
        }
      case 's' =>
        val start = ti
        var n = 0L
        while (ti < text.length && text.charAt(ti).isDigit) {
          n = n * 10 + (text.charAt(ti) - '0'); ti += 1
        }
        if (ti == start) false else { w.epoch = n; true }
      case 'b' | 'h' =>
        if (ti + 3 > text.length) false
        else {
          val name = text.substring(ti, ti + 3).toLowerCase
          val idx = Months.indexOf(name)
          if (idx < 0) false else { w.mon = idx; ti += 3; true }
        }
      case 'B' =>
        var end = ti
        while (end < text.length && text.charAt(end).isLetter) end += 1
        val name = text.substring(ti, end).toLowerCase
        val idx = Months.indexWhere(m => name.startsWith(m))
        if (idx < 0) false else { w.mon = idx; ti = end; true }
      case 'a' | 'A' =>
        var end = ti
        while (end < text.length && text.charAt(end).isLetter) end += 1
        if (end == ti) false else { ti = end; true }
      case 'p' =>
        if (ti + 2 > text.length) false
        else {
          val v = text.substring(ti, ti + 2).toUpperCase
          if (v != "AM" && v != "PM") false
          else { w.pm = v == "PM"; w.sawAmPm = true; ti += 2; true }
        }
      // %Z allows the timezone to be entirely absent
      // (test_wallclocktime.c:175); %z requires one
      case 'z' => zone(mandatory = true) == 1
      case 'Z' => zone(mandatory = false) >= 0
      case 'T' =>
        dir('H') && { if (ti < text.length && text.charAt(ti) == ':') { ti += 1; true } else false } &&
          dir('M') && { if (ti < text.length && text.charAt(ti) == ':') { ti += 1; true } else false } &&
          dir('S')
      case 'F' =>
        dir('Y') && { if (ti < text.length && text.charAt(ti) == '-') { ti += 1; true } else false } &&
          dir('m') && { if (ti < text.length && text.charAt(ti) == '-') { ti += 1; true } else false } &&
          dir('d')
      case '%' =>
        if (ti < text.length && text.charAt(ti) == '%') { ti += 1; true } else false
      case _ => false
    }
    while (fi < fmt.length) {
      val c = fmt.charAt(fi)
      if (c == '%' && fi + 1 < fmt.length) {
        if (!dir(fmt.charAt(fi + 1))) return -1
        fi += 2
      } else if (c == ' ') {
        // format whitespace matches ZERO or more input whitespace
        // (wallclocktime.c:330-335 isspace loop — the %Z-optional
        // battery case "…%S %Z" on zone-less input relies on it)
        while (ti < text.length && text.charAt(ti) == ' ') ti += 1
        fi += 1
      } else {
        if (ti >= text.length || text.charAt(ti) != c) return -1
        ti += 1; fi += 1
      }
    }
    ti
  }

  /** The default (no-format) ISO8601 scanner: %FT%T with optional
    * fraction and zone suffix (scan-timestamp.c scan_iso_timestamp). */
  private def scanIso(text: String, w: Wct): Int = {
    val base = scanFormat(text, "%F", w)
    if (base < 0) return -1
    var ti = base
    if (ti >= text.length || (text.charAt(ti) != 'T' && text.charAt(ti) != ' ')) return -1
    ti += 1
    val rest = text.substring(ti)
    val t = scanFormat(rest, "%T", w)
    if (t < 0) return -1
    ti += t
    if (ti < text.length && (text.charAt(ti) == '.' || text.charAt(ti) == ',')) {
      ti += 1
      val f = scanFormat(text.substring(ti), "%f", w)
      if (f < 0) return -1
      ti += f
    }
    if (ti < text.length) {
      // optional zone, directly attached
      val sub = text.substring(ti)
      val w2 = new Wct
      val z = scanFormat(sub, "%z", w2)
      if (z > 0) { w.gmtoff = w2.gmtoff; ti += z }
    }
    ti
  }

  def run(text: String, formats: Seq[String], timezone: Option[String],
      defaultZone: String, refEpochSec: Long,
      guessTimezone: Boolean): InternalRow = {
    val fail = InternalRow(false, null, null, null)
    val candidates = if (formats.isEmpty) Seq(null) else formats
    var w: Wct = null
    var consumed = -1
    val it = candidates.iterator
    while (consumed < 0 && it.hasNext) {
      val f = it.next()
      val attempt = new Wct
      val n = if (f == null) scanIso(text, attempt)
        else scanFormat(text, f, attempt)
      if (n == text.length) { w = attempt; consumed = n }
    }
    if (consumed < 0) return fail

    import java.time._
    val refZone = ZoneId.of(defaultZone)
    val refNow = Instant.ofEpochSecond(refEpochSec).atZone(refZone)

    if (w.epoch != Long.MinValue) {
      // %s: epoch given directly; offset = parsed %z, else the
      // configured timezone's offset at that instant
      val off = if (w.gmtoff != Int.MinValue) w.gmtoff
        else {
          val z = timezone.map(ZoneId.of).getOrElse(refZone)
          z.getRules.getOffset(Instant.ofEpochSecond(w.epoch)).getTotalSeconds
        }
      return InternalRow(true, w.epoch, w.usec, off)
    }

    // missing-field defaults (date-parser.c: fields initialized from
    // the current time's date, time-of-day from zero)
    if (w.yday > 0) {
      val y = if (w.year >= 0) w.year else refNow.getYear
      try {
        val d = LocalDate.ofYearDay(y, w.yday)
        w.year = y; w.mon = d.getMonthValue - 1; w.mday = d.getDayOfMonth
      } catch { case _: DateTimeException => return fail }
    }
    val dateGiven = w.year >= 0 || w.mon >= 0 || w.mday >= 0
    var year = w.year
    var mon = w.mon
    var mday = w.mday
    if (!dateGiven) {
      year = refNow.getYear; mon = refNow.getMonthValue - 1; mday = refNow.getDayOfMonth
    } else {
      if (mon < 0) mon = 0
      if (mday < 0) mday = 1
      if (year < 0) {
        // closest-year heuristic (timeutils guess_missing_year)
        year = refNow.getYear
        val nowMon = refNow.getMonthValue - 1
        if (mon == 0 && nowMon == 11) year += 1
        else if (mon == 11 && nowMon == 0) year -= 1
      }
    }
    val hour0 = math.max(w.hour, 0)
    val hour = if (w.sawAmPm && w.pm) hour0 + 12 else hour0
    val ldt = try LocalDateTime.of(year, mon + 1, mday, hour,
      math.max(w.min, 0), math.min(math.max(w.sec, 0), 59), w.usec * 1000)
    catch { case _: DateTimeException => return fail }

    def epochWithOffset(offsetSec: Int): Long =
      ldt.toEpochSecond(ZoneOffset.ofTotalSeconds(offsetSec))

    val (epoch, off) =
      if (w.gmtoff != Int.MinValue) (epochWithOffset(w.gmtoff), w.gmtoff)
      else {
        val z = timezone.map(ZoneId.of).getOrElse(refZone)
        // glibc-mktime semantics (test_conv.c:72-91): a wall clock inside
        // the spring-forward GAP keeps its fields and anchors at the
        // POST-transition offset ("Mar 31 2019 02:11:00" CET → 02:11
        // CEST), where java.time's atZone would shift it to 03:11. In
        // the autumn overlap both pick the FIRST (DST) occurrence.
        val rules = z.getRules
        val valid = rules.getValidOffsets(ldt)
        val zoff =
          if (!valid.isEmpty) valid.get(0)
          else rules.getTransition(ldt).getOffsetAfter
        (ldt.toEpochSecond(zoff), zoff.getTotalSeconds)
      }

    if (guessTimezone && w.gmtoff != Int.MinValue) {
      // reinterpret the wall clock in the receiver zone when that is
      // closer to now (time_unix_time_fix_timezone semantics)
      val recvOff = refZone.getRules.getOffset(refNow.toInstant).getTotalSeconds
      val alt = epochWithOffset(recvOff)
      if (math.abs(alt - refEpochSec) < math.abs(epoch - refEpochSec))
        return InternalRow(true, alt, w.usec, recvOff)
    }
    InternalRow(true, epoch, w.usec, off)
  }

  def apply(text: Column, formats: Seq[String], timezone: Option[String],
      defaultZone: String, refEpochSec: Long,
      guessTimezone: Boolean): Column =
    ColumnBridge.column(new DateScan(ColumnBridge.expression(text), formats,
      timezone, defaultZone, refEpochSec, guessTimezone))
}
