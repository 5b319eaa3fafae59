package graft

import graft.operators.{Scl, ValuePairs}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The value-pairs scope/transform battery, ported case-for-case from
  * `/root/reference/lib/value-pairs/tests/test_value_pairs.c` — same
  * RFC5424 test message, same expected key lists (including the full
  * "everything" macro sweep), same transformer chains.
  */
class ValuePairsBatterySpec extends GraftSuite {
  import spark.implicits._

  // test_value_pairs.c:71 — create_message(): LP_SYSLOG_PROTOCOL parse
  // of the MSExchange sample, one tag, one set-then-unset NV (the unset
  // pair simply never lands in our values map)
  private val raw =
    """<134>1 2009-10-16T11:51:56+02:00 exchange.macartney.esbjerg MSExchange_ADAccess 20208 _MSGID_ [origin ip="exchange.macartney.esbjerg"][meta sequenceId="191732" sysUpTime="68807696"][EventData@18372.4 Data="MSEXCHANGEOWAAPPPOOL.CONFIG\" -W \"\" -M 1 -AP \"MSEXCHANGEOWAAPPPOOL5244fileserver.macartney.esbjerg CDG 1 7 7 1 0 1 1 7 1 mail.macartney.esbjerg CDG 1 7 7 1 0 1 1 7 1 maindc.macartney.esbjerg CD- 1 6 6 0 0 1 1 6 1 "][Keywords@18372.4 Keyword="Classic"] ApplicationMSExchangeADAccess: message"""

  private lazy val msg: DataFrame = {
    val parsed = Scl.parseSyslogMessage(Seq(raw).toDF("message"))
    parsed
      .withColumn("tags", array(lit("almafa")))
      // LogTemplateEvalOptions seq_num = 11 (test_value_pairs.c:132);
      // host-id is always rendered (host_id_append_formatted_id), the
      // R_/P_ stamps are set at parse time
      .withColumn("seqnum", lit(11))
      .withColumn("hostid", lit("cafebabe"))
      .withColumn("recvd_ts", col("ts"))
      .withColumn("proc_ts", col("ts"))
      .cache()
  }

  /** testcase(): scope + optional exclude + explicit pair("test.key"),
    * returning the sorted key list minus test.key (vp_keys_foreach
    * filters it and flags its presence). */
  private def scopeKeys(scope: String, exclude: Option[String]): String = {
    val selected = ValuePairs.select(
      ValuePairs.scopeMap(msg, Seq(scope)),
      exclude = exclude.toSeq)
    // explicit pairs bypass the exclude patterns (test_value_pairs.c:213)
    val withTest = ValuePairs.withPair(selected, "test.key", col("message"))
    val keys = msg.select(map_keys(withTest)).head.getSeq[String](0)
    assert(keys.contains("test.key"), s"test.key missing in scope $scope")
    keys.filterNot(_ == "test.key").sorted.mkString(",")
  }

  private def check(scope: String, exclude: Option[String], expected: String) =
    assert(scopeKeys(scope, exclude) == expected.split(",").sorted.mkString(","),
      s"scope=$scope")

  private val Rfc3164Keys = "DATE,FACILITY,HOST,MESSAGE,PID,PRIORITY,PROGRAM"
  private val SdataKeys =
    ".SDATA.EventData@18372.4.Data,.SDATA.Keywords@18372.4.Keyword," +
      ".SDATA.meta.sequenceId,.SDATA.meta.sysUpTime,.SDATA.origin.ip"

  test("rfc3164/core/base scopes (test_value_pairs.c:192-195)") {
    check("rfc3164", None, Rfc3164Keys)
    check("core", None, Rfc3164Keys)
    check("base", None, Rfc3164Keys)
  }

  test("rfc5424/syslog-proto scopes (test_value_pairs.c:197-198)") {
    val expected = SdataKeys + ",DATE,FACILITY,HOST,MESSAGE,MSGID,PID,PRIORITY,PROGRAM"
    check("rfc5424", None, expected)
    check("syslog-proto", None, expected)
  }

  test("selected-macros scope (test_value_pairs.c:200)") {
    check("selected-macros", None,
      "DATE,FACILITY,HOST,MESSAGE,PID,PRIORITY,PROGRAM,SEQNUM,SOURCEIP,TAGS")
  }

  test("nv-pairs scope (test_value_pairs.c:202)") {
    check("nv-pairs", None, "HOST,MESSAGE,MSGID,PID,PROGRAM")
  }

  test("dot-nv-pairs and sdata scopes (test_value_pairs.c:203-205)") {
    check("dot-nv-pairs", None, SdataKeys)
    check("sdata", None, SdataKeys)
  }

  test("all-nv-pairs scope (test_value_pairs.c:207)") {
    check("all-nv-pairs", None, SdataKeys + ",HOST,MESSAGE,MSGID,PID,PROGRAM")
  }

  // test_value_pairs.c:209 — the full macro sweep; empty-rendering
  // macros (RCPTID, RUNID, UNIQID, CONTEXT_ID, _) are omitted exactly
  // like vp_merge_builtins' sb->len == 0 skip
  private def prefixedDateKeys(p: String): String =
    Seq("AMPM", "DATE", "DAY", "FULLDATE", "HOUR", "HOUR12", "ISODATE",
      "ISOWEEK", "MIN", "MONTH", "MONTH_ABBREV", "MONTH_NAME", "MONTH_WEEK",
      "MSEC", "SEC", "STAMP", "TZ", "TZOFFSET", "UNIXTIME", "USEC", "WEEK",
      "WEEKDAY", "WEEK_DAY", "WEEK_DAY_ABBREV", "WEEK_DAY_NAME", "YEAR",
      "YEAR_DAY").map(p + _).mkString(",")

  private val EverythingKeys =
    SdataKeys + "," +
      "AMPM,BSDTAG," + prefixedDateKeys("C_") + "," +
      "DATE,DAY,DESTIP,DESTPORT,FACILITY,FACILITY_NUM,FULLDATE,HOST,HOSTID," +
      "HOUR,HOUR12,ISODATE,ISOWEEK,LEVEL,LEVEL_NUM,LOGHOST,MESSAGE,MIN," +
      "MONTH,MONTH_ABBREV,MONTH_NAME,MONTH_WEEK,MSEC,MSG,MSGHDR,MSGID," +
      "PID,PRI,PRIORITY,PROGRAM,PROTO," + prefixedDateKeys("P_") + "," +
      prefixedDateKeys("R_") + "," +
      "SDATA,SEC,SEQNUM,SEVERITY,SEVERITY_NUM,SOURCEIP,STAMP,SYSUPTIME," +
      prefixedDateKeys("S_") + "," +
      "TAG,TAGS,TZ,TZOFFSET,UNIXTIME,USEC,WEEK,WEEKDAY,WEEK_DAY," +
      "WEEK_DAY_ABBREV,WEEK_DAY_NAME,YEAR,YEAR_DAY"

  test("everything scope: the full macro sweep (test_value_pairs.c:209)") {
    check("everything", None, EverythingKeys)
  }

  test("excludes: non-default and in-default-set keys (test_value_pairs.c:211-221)") {
    check("nv-pairs", Some(".SDATA.*"), "HOST,MESSAGE,MSGID,PID,PROGRAM")
    // exclude patterns do not affect explicitly added keys — asserted
    // inside scopeKeys for every case, including this one
    check("rfc3164", Some("test.*"), Rfc3164Keys)
    // excluding works when the key IS in the default set
    check("nv-pairs", Some("MESSAGE"), "HOST,MSGID,PID,PROGRAM")
  }

  test("transformers: add-prefix + shift + replace-prefix chain (test_value_pairs.c:233)") {
    val transformed = ValuePairs.rekeySet(
      ValuePairs.scopeMap(msg, Seq("everything")), Seq("*"),
      Seq(ValuePairs.addPrefixKey("__"), ValuePairs.shiftKey(2),
        ValuePairs.replacePrefixKey("C_", "CC_")))
    val keys = msg.select(map_keys(transformed)).head.getSeq[String](0).sorted
    val expected = EverythingKeys.split(",")
      .map(k => if (k.startsWith("C_")) "C" + k else k).sorted.toSeq
    assert(keys == expected, keys.mkString(","))
  }

  test("transformer shift-levels restricted to a key glob (test_value_pairs.c:270)") {
    // shift-levels(1) strips the leading dot level, add-prefix pushes
    // .foo.bar.baz., shift-levels(4) pops it — net effect: only the
    // .SDATA.meta.* keys lose their leading dot
    val transformed = ValuePairs.rekeySet(
      ValuePairs.scopeMap(msg, Seq("sdata")), Seq(".SDATA.meta.*"),
      Seq(ValuePairs.shiftLevelsKey(1),
        ValuePairs.addPrefixKey(".foo.bar.baz."),
        ValuePairs.shiftLevelsKey(4)))
    val keys = msg.select(map_keys(transformed)).head.getSeq[String](0)
      .sorted.mkString(",")
    assert(keys ==
      ".SDATA.EventData@18372.4.Data,.SDATA.Keywords@18372.4.Keyword," +
        ".SDATA.origin.ip,SDATA.meta.sequenceId,SDATA.meta.sysUpTime", keys)
  }
}
