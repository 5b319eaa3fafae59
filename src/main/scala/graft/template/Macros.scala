package graft.template

import graft.model.SyslogNames
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The macro library — derived virtual columns computed on reference
  * (`/root/reference/lib/template/macros.h:35-102`, expansion
  * `macros.c:423`). Catalyst prunes whatever a query doesn't use, so
  * "~80 virtual columns" cost nothing until referenced.
  *
  * Date-part macros exist unprefixed (event time STAMP) and with the
  * `R_` (received) / `P_` (processed) / `C_` (current) prefixes
  * (`macros.h:99-102`); `S_` is an alias of unprefixed.
  */
object Macros {

  private val engineStart: Long = System.nanoTime()

  /** The complete macro table in `macros.c:47-216` order — the
    * `all-macros` value-pairs scope iterates exactly this set. */
  val allNames: Seq[String] = {
    val unprefixedDate = Seq("DATE", "FULLDATE", "ISODATE", "STAMP", "YEAR",
      "YEAR_DAY", "MONTH", "MONTH_WEEK", "MONTH_ABBREV", "MONTH_NAME", "DAY",
      "HOUR", "HOUR12", "MIN", "SEC", "USEC", "MSEC", "AMPM", "WEEKDAY",
      "WEEK_DAY", "WEEK_DAY_ABBREV", "WEEK_DAY_NAME", "WEEK", "ISOWEEK",
      "TZOFFSET", "TZ", "SYSUPTIME", "UNIXTIME")
    val prefixedDate = Seq("DATE", "FULLDATE", "ISODATE", "STAMP", "YEAR",
      "YEAR_DAY", "MONTH", "MONTH_WEEK", "MONTH_ABBREV", "MONTH_NAME", "DAY",
      "HOUR", "HOUR12", "MIN", "SEC", "MSEC", "USEC", "AMPM", "WEEKDAY",
      "WEEK_DAY", "WEEK_DAY_ABBREV", "WEEK_DAY_NAME", "WEEK", "ISOWEEK",
      "TZOFFSET", "TZ", "UNIXTIME")
    Seq("FACILITY", "FACILITY_NUM", "SEVERITY", "SEVERITY_NUM", "PRIORITY",
      "LEVEL", "LEVEL_NUM", "TAG", "TAGS", "BSDTAG", "PRI") ++
      unprefixedDate ++
      Seq("R_", "S_", "C_", "P_").flatMap(p => prefixedDate.map(p + _)) ++
      Seq("SDATA", "MSGHDR", "SOURCEIP", "DESTIP", "DESTPORT", "PROTO",
        "SEQNUM", "CONTEXT_ID", "_", "RCPTID", "RUNID", "HOSTID", "UNIQID",
        "MSG", "MESSAGE", "HOST", "LOGHOST")
  }

  private def severityName(code: Column): Column =
    SyslogNames.severities.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (name, i)) => when(code === i, lit(name)).otherwise(acc)
    }

  private def facilityName(code: Column): Column =
    SyslogNames.facilities.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (name, i)) => when(code === i, lit(name)).otherwise(acc)
    }

  /** Date-part family over one timestamp column (`macros.h:69-94`).
    * `tz` is the template's `time-zone()` override
    * (`lib/template/templates.c` TemplateOptions time_zone[LTZ_SEND]):
    * wall-clock parts render in that zone instead of the session zone,
    * and the offset-bearing macros (ISODATE/TZOFFSET/TZ) print the
    * zone's offset at the instant. The engine's convention is a UTC
    * session zone (Bench/tests pin it), matching [[graft.operators
    * .Rewrites.toTimeZone]]'s use of from_utc_timestamp. */
  private def dateMacro(part: String, ts0: Column, tz: Option[String] = None,
      fracDigits: Int = 0): Option[Column] = {
    // $UNIXTIME is the epoch — zone-independent, so it must read the
    // UNSHIFTED instant (the wall-clock macros below shift into `tz`)
    if (part == "UNIXTIME") {
      val frac =
        if (fracDigits <= 0) lit("")
        else concat(lit("."),
          substring(date_format(ts0, "SSSSSS"), 1, math.min(fracDigits, 6)))
      return Some(concat(unix_timestamp(ts0).cast("string"), frac))
    }
    val ts = tz.fold(ts0)(z => from_utc_timestamp(ts0, z))
    // offset seconds of `tz` at the instant = shifted - original epoch
    def offsetStr: Column = tz match {
      case None => date_format(ts, "xxx")
      case Some(_) =>
        val secs = ts.cast("long") - ts0.cast("long")
        val sign = when(secs < 0, "-").otherwise("+")
        val mag = abs(secs)
        concat(sign, lpad((mag / 3600).cast("int").cast("string"), 2, "0"),
          lit(":"), lpad(((mag % 3600) / 60).cast("int").cast("string"), 2, "0"))
    }
    dateMacroIn(part, ts, offsetStr, fracDigits)
  }

  private def dateMacroIn(part: String, ts: Column, offsetStr: => Column,
      fracDigits: Int = 0): Option[Column] = {
    // frac-digits(N): composite date macros carry N fractional-second
    // digits (timeutils/format.c append_frac_digits; the reference's
    // global/per-template frac-digits() option)
    def frac: Column =
      if (fracDigits <= 0) lit("")
      else concat(lit("."),
        substring(date_format(ts, "SSSSSS"), 1, math.min(fracDigits, 6)))
    dateMacroIn0(part, ts, offsetStr, frac)
  }

  private def dateMacroIn0(part: String, ts: Column, offsetStr: => Column,
      frac: => Column): Option[Column] = part match {
    case "YEAR" => Some(date_format(ts, "yyyy"))
    case "MONTH" => Some(date_format(ts, "MM"))
    case "DAY" => Some(date_format(ts, "dd"))
    case "HOUR" => Some(date_format(ts, "HH"))
    case "HOUR12" =>
      // macros.c:369-378: 12-hour clock, 0 renders as 12, zero-padded
      Some(date_format(ts, "hh"))
    case "AMPM" => Some(date_format(ts, "a"))
    case "MIN" => Some(date_format(ts, "mm"))
    case "SEC" => Some(date_format(ts, "ss"))
    case "MSEC" => Some(date_format(ts, "SSS"))
    case "USEC" => Some(date_format(ts, "SSSSSS"))
    case "WEEK" =>
      // macros.c:338: Monday-started weeks counted from Jan 1; the week
      // holding Jan 1 is week 00 when partial. NOT ISO 8601 — that is
      // $ISOWEEK. The two differ every January (a $YEAR$WEEK-partitioned
      // path written with ISO weeks lands December data in week 52/53).
      val yday = dayofyear(ts) - 1
      val sinceMonday = (dayofweek(ts) + lit(5)) % 7
      Some(lpad(((yday - sinceMonday + 7) / 7).cast("int").cast("string"), 2, "0"))
    case "ISOWEEK" => Some(lpad(weekofyear(ts).cast("string"), 2, "0"))
    case "MONTH_WEEK" =>
      // macros.c:352-355: Sunday-started week-of-month, Jan 1 partial = 0
      val mday = dayofmonth(ts)
      val wday = dayofweek(ts) - 1
      Some(((mday / 7).cast("int") +
        when(wday > 0 && (mday % 7) >= wday, 1).otherwise(0)).cast("string"))
    case "YEAR_DAY" => Some(lpad(dayofyear(ts).cast("string"), 3, "0"))
    case "WEEK_DAY" => Some(dayofweek(ts).cast("string")) // 1=Sunday, like reference
    case "WEEK_DAY_NAME" => Some(date_format(ts, "EEEE"))
    case "WEEKDAY" | "WEEK_DAY_ABBREV" => Some(date_format(ts, "EEE"))
    case "MONTH_NAME" => Some(date_format(ts, "MMMM"))
    case "MONTH_ABBREV" => Some(date_format(ts, "MMM"))
    case "UNIXTIME" =>
      Some(concat(unix_timestamp(ts).cast("string"), frac))
    case "ISODATE" =>
      Some(concat(date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), frac, offsetStr))
    case "FULLDATE" =>
      // TS_FMT_FULL (timeutils/format.c:128-137): the day-of-month is
      // SPACE-padded to width 2 ("2005 Oct  9 ..."), like TS_FMT_BSD
      Some(concat(date_format(ts, "yyyy MMM "),
        lpad(date_format(ts, "d"), 2, " "),
        date_format(ts, " HH:mm:ss"), frac))
    case "DATE" | "STAMP" =>
      // TS_FMT_BSD (timeutils/format.c:99-110): month abbrev, then the
      // day SPACE-padded to width 2 — "Oct  9", never "Oct 09"
      Some(concat(date_format(ts, "MMM "),
        lpad(date_format(ts, "d"), 2, " "),
        date_format(ts, " HH:mm:ss"), frac))
    case "TZOFFSET" => Some(offsetStr)
    case "TZ" => Some(offsetStr)
    case _ => None
  }

  /** Resolver for template Refs over a LogRecord-shaped frame: builtin
    * macros first, then real columns, then the dynamic `values` map, then
    * `$1..$255` match groups. */
  def resolver(columns: Set[String]): String => Column = resolver(columns, None)

  def resolver(columns: Set[String], tz: Option[String]): String => Column =
    resolver(columns, tz, 0)

  def resolver(columns: Set[String], tz: Option[String],
      fracDigits: Int): String => Column = {
    // shadow the object-level helper so every date-macro call site in
    // this body picks up the caller's frac-digits option
    def dateMacro(part: String, ts0: Column,
        tz2: Option[String] = None): Option[Column] =
      Macros.dateMacro(part, ts0, tz2, fracDigits)
    val hasValues = columns.contains("values")
    val hasMatches = columns.contains("matches")

    name => name match {
      // pseudo-name for the per-message sequence of a sequenced stream
      // (the msg-generator's `seq`): backs the stateful template
      // functions' batch mapping ($(iterate) 2-arg form, $(slog)).
      // Null on unsequenced frames — consumers fall back or error.
      case "__MSG_SEQ__" =>
        if (columns.contains("seq")) col("seq").cast("long")
        else lit(null).cast("long")
      // pseudo-name for the scope machinery (VpCmdline): the whole
      // dynamic NV map of the frame
      case "__VALUES_MAP__" =>
        if (hasValues) col("values") else map().cast("map<string,string>")
      // a frame missing a builtin column renders the macro unset ("",
      // like the reference's unset values) instead of failing analysis
      // — value-pairs' `everything` scope resolves EVERY macro on
      // whatever frame it meets (e.g. the msg-generator's, which has
      // no host/facility columns)
      case "HOST" =>
        if (columns.contains("host")) col("host") else lit(null).cast("string")
      case "HOST_FROM" =>
        if (columns.contains("host_from")) col("host_from")
        else lit(null).cast("string")
      case "MESSAGE" | "MSG" =>
        if (columns.contains("message")) col("message")
        else lit(null).cast("string")
      case "MSGHDR" if columns.contains("program") =>
        concat(coalesce(col("program"), lit("")),
          when((if (columns.contains("pid")) col("pid")
            else lit(null).cast("string")).isNotNull,
            concat(lit("["), col("pid"), lit("]")))
            .otherwise(lit("")),
          lit(": "))
      case "MSGHDR" => lit(null).cast("string")
      case "PROGRAM" =>
        if (columns.contains("program")) col("program")
        else lit(null).cast("string")
      case "PID" =>
        if (columns.contains("pid")) col("pid") else lit(null).cast("string")
      case "MSGID" =>
        if (columns.contains("msgid")) col("msgid") else lit(null).cast("string")
      case "SOURCE" =>
        if (columns.contains("source")) col("source") else lit(null).cast("string")
      case "FACILITY" | "FACILITY_NUM" if !columns.contains("facility") =>
        lit(null).cast("string")
      case "SEVERITY" | "LEVEL" | "PRIORITY" | "SEVERITY_NUM" | "LEVEL_NUM"
          if !columns.contains("severity") =>
        lit(null).cast("string")
      case "PRI" | "TAG" | "BSDTAG"
          if !columns.contains("facility") || !columns.contains("severity") =>
        lit(null).cast("string")
      case "PRI" => (col("facility") * 8 + col("severity")).cast("string")
      case "FACILITY" => facilityName(col("facility"))
      case "FACILITY_NUM" => col("facility").cast("string")
      case "SEVERITY" | "LEVEL" | "PRIORITY" => severityName(col("severity"))
      case "SEVERITY_NUM" | "LEVEL_NUM" => col("severity").cast("string")
      case "TAG" => lpad(hex(col("facility") * 8 + col("severity")), 2, "0")
      case "BSDTAG" =>
        // macros.c:480-485: severity digit + ('A' + facility) letter
        val letter = (0 until 24).foldLeft(lit(null).cast("string")) {
          case (acc, i) =>
            when(col("facility") === i, lit(('A' + i).toChar.toString)).otherwise(acc)
        }
        concat(col("severity").cast("string"), letter)
      case "SDATA" =>
        // macros.c:520: the formatted RFC5424 SD blocks; empty (not "-")
        // when the message carries none
        if (hasValues)
          graft.operators.Scl.sdataBlocksOf(col("values"), emptyAs = "")
        else lit("")
      case "SOURCEIP" =>
        // macros.c:568-584: saddr when it is an IP, else 127.0.0.1
        if (columns.contains("sourceip")) coalesce(col("sourceip"), lit("127.0.0.1"))
        else lit("127.0.0.1")
      case "DESTIP" =>
        if (columns.contains("destip")) coalesce(col("destip"), lit("127.0.0.1"))
        else lit("127.0.0.1")
      case "DESTPORT" =>
        if (columns.contains("destport")) coalesce(col("destport").cast("string"), lit("0"))
        else lit("0")
      case "PROTO" =>
        if (columns.contains("proto")) coalesce(col("proto").cast("string"), lit("0"))
        else lit("0")
      case "SYSUPTIME" =>
        // macros.c:678-686: hundredths of a second since engine start;
        // snapshotted at plan time like LOGHOST (driver-side constant)
        if (columns.contains("sysuptime")) col("sysuptime").cast("string")
        else lit(((System.nanoTime() - engineStart) / 10000000L).toString)
      case "TAGS" =>
        // log_msg_print_tags str-repr-quotes tags containing commas
        // (the $(list-*) encoding, logmsg.c:1009)
        if (columns.contains("tags"))
          graft.functions.ListFunctions.list_encode(col("tags"))
        else lit(null).cast("string")
      case "FULLHOST" =>
        if (columns.contains("host")) col("host") else lit(null).cast("string")
      case "FULLHOST_FROM" =>
        if (columns.contains("host_from")) col("host_from")
        else lit(null).cast("string")
      // macros.c M_UNIQID: "%08x@%016llx" of (host_id, rcptid)
      case "UNIQID" if !columns.contains("uniqid") &&
          columns.contains("hostid") && columns.contains("rcptid") =>
        concat(lower(lpad(hex(col("hostid")), 8, "0")), lit("@"),
          lower(lpad(hex(col("rcptid")), 16, "0")))
      case "SEQNUM" | "RCPTID" | "HOSTID" | "RUNID" | "UNIQID" | "CONTEXT_ID" =>
        if (columns.contains(name.toLowerCase)) col(name.toLowerCase) else lit("")
      case "LOGHOST" =>
        // use-fqdn(no) default: the short local name (hostname.c,
        // macros.c M_LOGHOST)
        lit(Hostname.local.localShort)
      // R_/P_ fall back to the event stamp when the frame carries no
      // received/processed stamp column (the reference always stamps
      // both at ingest; batch frames often only have ts)
      case d if d.startsWith("R_") && dateMacro(d.drop(2),
          col(if (columns.contains("recvd_ts")) "recvd_ts" else "ts"), tz).isDefined =>
        if (columns.contains("recvd_ts") || columns.contains("ts"))
          dateMacro(d.drop(2),
            col(if (columns.contains("recvd_ts")) "recvd_ts" else "ts"), tz).get
        else lit(null).cast("string")
      case d if d.startsWith("P_") && dateMacro(d.drop(2),
          col(if (columns.contains("proc_ts")) "proc_ts" else "ts"), tz).isDefined =>
        if (columns.contains("proc_ts") || columns.contains("ts"))
          dateMacro(d.drop(2),
            col(if (columns.contains("proc_ts")) "proc_ts" else "ts"), tz).get
        else lit(null).cast("string")
      case d if d.startsWith("C_") && dateMacro(d.drop(2), current_timestamp(), tz).isDefined =>
        dateMacro(d.drop(2), current_timestamp(), tz).get
      case d if d.startsWith("S_") && dateMacro(d.drop(2), col("ts"), tz).isDefined =>
        if (columns.contains("ts")) dateMacro(d.drop(2), col("ts"), tz).get
        else lit(null).cast("string")
      case d if dateMacro(d, col("ts"), tz).isDefined =>
        if (columns.contains("ts")) dateMacro(d, col("ts"), tz).get
        else lit(null).cast("string")
      case m if m.nonEmpty && m.forall(_.isDigit) && hasMatches =>
        // $1..$255 regexp match groups -> matches array ($0 = whole match)
        // out-of-range registers render "" (an unset pcre register)
        try_element_at(col("matches"), lit(m.toInt + 1))
      case other if columns.contains(other) => col(other)
      case other if columns.contains(other.toLowerCase) => col(other.toLowerCase)
      case other if hasValues => element_at(col("values"), other)
      case _ => lit(null).cast("string")
    }
  }
}
