package graft

import graft.template.Template
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Writer-format battery, ported from
  * `/root/reference/tests/unit/test_logwriter.c`: the writer's default
  * line formats (LW_SYSLOG_PROTOCOL = RFC5424 wire, LW_FORMAT_PROTO =
  * BSD wire with PRI, LW_FORMAT_FILE = BSD-dated file line), custom
  * templates, and truncate-size() octet semantics. Documented
  * divergences from the reference's byte-for-byte expectations:
  * (a) SDATA blocks/params render in sorted-key order (deterministic
  * across distributed merges) where the reference preserves insertion
  * order; (b) $MSGHDR is reconstructed as `program[pid]: ` — the
  * LEGACY_MSGHDR verbatim-header byte copy (which keeps a missing
  * space after the colon) is not modeled; the parse-side
  * normalization is pinned by the msgparse goldens instead. */
class LogwriterBatterySpec extends GraftSuite {
  import spark.implicits._

  private val cols = Seq("host", "program", "pid", "msgid", "facility",
    "severity", "message", "ts", "values")

  /** MSG_SYSLOG_STR's fields: pri 132, 2006-10-29T01:59:59.156+01:00. */
  private lazy val syslogFrame: DataFrame =
    Seq(("mymachine", "evntslog", "3535", "ID47", 16, 4,
      "BOMAn application event log entry..."))
      .toDF("host", "program", "pid", "msgid", "facility", "severity",
        "message")
      .withColumn("ts", timestamp_micros(lit(1162083599156000L)))
      .withColumn("values", map(
        lit(".SDATA.exampleSDID@0.iut"), lit("3"),
        lit(".SDATA.exampleSDID@0.eventSource"), lit("Application"),
        lit(".SDATA.exampleSDID@0.eventID"), lit("1011"),
        lit(".SDATA.examplePriority@0.class"), lit("high")))

  /** MSG_BSD_STR's fields: pri 155, 2006-02-11T10:34:56+01:00. */
  private def bsdFrame(msg: String, fac: Int = 19, sev: Int = 3): DataFrame =
    Seq(("bzorp", "syslog-ng", "23323", null: String, fac, sev, msg))
      .toDF("host", "program", "pid", "msgid", "facility", "severity",
        "message")
      .withColumn("ts", timestamp_seconds(lit(
        java.time.Instant.parse("2006-02-11T09:34:56Z").getEpochSecond)))
      .withColumn("values", map().cast("map<string,string>"))

  private def t(df: DataFrame, tmpl: String): Column =
    Template.column(tmpl, cols, tz = Some("+01:00"))

  private def render(df: DataFrame, line: Column): String =
    df.select(line.cast("string")).head.getString(0)

  /** The syslog() destination's RFC5424 wire line (LW_SYSLOG_PROTOCOL). */
  private def wire5424(df: DataFrame): Column = concat(
    t(df, "<$PRI>1 $ISODATE $HOST ${PROGRAM:--} ${PID:--} ${MSGID:--} "),
    graft.operators.Scl.sdataBlocks(df), lit(" "), col("message"))

  test("RFC5424 wire format (EXPECTED_MSG_SYSLOG_STR, sorted-SDATA order)") {
    assert(render(syslogFrame, wire5424(syslogFrame)) ==
      "<132>1 2006-10-29T01:59:59+01:00 mymachine evntslog 3535 ID47 " +
      "[examplePriority@0 class=\"high\"]" +
      "[exampleSDID@0 eventID=\"1011\" eventSource=\"Application\" iut=\"3\"]" +
      " BOMAn application event log entry...")
  }

  test("RFC5424 wire with empty MSG keeps the trailing space (EXPECTED_MSG_SYSLOG_EMPTY_STR)") {
    val empty = syslogFrame.withColumn("message", lit(""))
    assert(render(empty, wire5424(empty)).endsWith("iut=\"3\"] "))
  }

  test("custom template on a 5424 message (EXPECTED_MSG_SYSLOG_STR_T)") {
    assert(render(syslogFrame, t(syslogFrame, "$MSGID $MSG")) ==
      "ID47 BOMAn application event log entry...")
  }

  test("5424 -> BSD proto and file formats (EXPECTED_MSG_SYSLOG_TO_BSD/FILE_STR)") {
    assert(render(syslogFrame, t(syslogFrame, "<$PRI>$DATE $HOST $MSGHDR$MSG")) ==
      "<132>Oct 29 01:59:59 mymachine evntslog[3535]: " +
      "BOMAn application event log entry...")
    assert(render(syslogFrame, t(syslogFrame, "$DATE $HOST $MSGHDR$MSG")) ==
      "Oct 29 01:59:59 mymachine evntslog[3535]: " +
      "BOMAn application event log entry...")
  }

  test("BSD -> RFC5424 fills msgid/sdata with '-' (EXPECTED_MSG_BSD_TO_SYSLOG_STR)") {
    val f = bsdFrame("árvíztűrőtükörfúrógép")
    assert(render(f, wire5424(f)) ==
      "<155>1 2006-02-11T10:34:56+01:00 bzorp syslog-ng 23323 - - " +
      "árvíztűrőtükörfúrógép")
  }

  test("BSD custom template + zero PRI (EXPECTED_MSG_BSD_STR_T, EXPECTED_MSG_ZERO_PRI_STR_T)") {
    val f = bsdFrame("árvíztűrőtükörfúrógép")
    assert(render(f, t(f, "$PRI $PID $MSG")) == "155 23323 árvíztűrőtükörfúrógép")
    val zero = bsdFrame("árvíztűrőtükörfúrógép", fac = 0, sev = 0)
    assert(render(zero, t(zero, "$PRI")) == "0")
    assert(render(zero, t(zero, "<$PRI>$DATE $HOST $MSGHDR$MSG")) ==
      "<0>Feb 11 10:34:56 bzorp syslog-ng[23323]: árvíztűrőtükörfúrógép")
  }

  test("BSD $DATE day-of-month is space-padded (timeutils/format.c TS_FMT_BSD)") {
    val f = bsdFrame("x").withColumn("ts", timestamp_seconds(lit(
      java.time.Instant.parse("2006-02-09T09:34:56Z").getEpochSecond)))
    assert(render(f, t(f, "$DATE")) == "Feb  9 10:34:56")
    assert(render(f, t(f, "$FULLDATE")) == "2006 Feb  9 10:34:56")
  }

  test("truncate-size cuts octets, not characters, and spares shorter lines (logwriter.c:1103)") {
    val f = bsdFrame("árvíztűrőtükörfúrógép")
    val line = t(f, "$PRI $PID $MSG")
    // "155 23323 árvíztűrő" is 19 chars but 23 BYTES — the reference
    // truncates the byte buffer (EXPECTED_MSG_BSD_STR_T_TRUNCATE)
    assert(render(f, Template.truncateOctets(line, 23)) == "155 23323 árvíztűrő")
    // truncate doesn't apply to messages at or under the limit
    val full = render(f, line)
    assert(render(f, Template.truncateOctets(line,
      full.getBytes("UTF-8").length)) == full)
    assert(render(f, Template.truncateOctets(line, 10000)) == full)
    // applied to a delimiter-carrying buffer the newline is eaten too
    assert(render(f, Template.truncateOctets(concat(line, lit("\n")), 23)) ==
      "155 23323 árvíztűrő")
  }
}
