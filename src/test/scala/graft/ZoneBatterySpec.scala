package graft

import graft.template.Template
import org.apache.spark.sql.functions._

/** Timezone + timestamp-format battery, ported from the reference's
  * `/root/reference/tests/unit/test_zone.c`: DST-boundary offsets for
  * POSIX-style and named zones (the tz database the reference reads is
  * the same IANA data java.time ships), and the logstamp format table
  * (TS_FMT_BSD/ISO/FULL/UNIX with fractional digits and half-hour
  * zone offsets) through the template/macro layer. */
class ZoneBatterySpec extends GraftSuite {
  import spark.implicits._

  /** Render one macro at one epoch under one zone, frac digits 3. */
  private def render(macroT: String, epochUs: Long, tz: String,
      frac: Int = 3): String = {
    val df = Seq(1).toDF("one").drop("one")
      .withColumn("ts", timestamp_micros(lit(epochUs)))
    df.select(Template.column(macroT, df.columns, Some(tz), fracDigits = frac)
      .cast("string")).head.getString(0)
  }

  test("DST boundary offsets (test_zone.c:131-186)") {
    // (zone, epoch, expected ISODATE offset suffix)
    val cases = Seq(
      ("MET", 1129319257L, "+02:00"),             // CEST, dst enabled
      ("MET", 1131959400L, "+01:00"),             // CET, dst disabled
      ("GMT", 1129319257L, "+00:00"),
      ("GMT", 1131959400L, "+00:00"),
      ("EST5EDT", 1112509800L, "-05:00"),         // 01:30, pre-spring
      ("EST5EDT", 1112511599L, "-05:00"),         // 01:59:59
      ("EST5EDT", 1112511600L, "-04:00"),         // 03:00:00 EDT
      ("EST5EDT", 1130651999L, "-04:00"),         // fall, 01:59:59 EDT
      ("EST5EDT", 1130652000L, "-05:00"),         // 01:00:00 EST
      ("EST5EDT", 1173592800L, "-05:00"),         // 2007 rules changed
      ("EST5EDT", 1173596400L, "-04:00"),
      ("EST5EDT", 1194155999L, "-04:00"),
      ("EST5EDT", 1194156000L, "-05:00"),
      ("Australia/Victoria", 1099151999L, "+10:00"),
      ("Australia/Victoria", 1099152000L, "+11:00"),
      ("Australia/Victoria", 1111852799L, "+11:00"),
      ("Australia/Victoria", 1111852800L, "+10:00"),
      ("NZ", 1128175199L, "+12:00"),
      ("NZ", 1128175200L, "+13:00"),
      ("NZ", 1111240799L, "+13:00"),
      ("NZ", 1111240800L, "+12:00"))
    for ((zone, epoch, off) <- cases) {
      val iso = render("$ISODATE", epoch * 1000000L, zone)
      assert(iso.endsWith(off), s"$zone @ $epoch: $iso (want $off)")
    }
  }

  test("logstamp formats incl. half-hour offsets (test_zone.c:771-800)") {
    val us = 1129319257L * 1000000L + 123456L
    // TS_FMT_BSD at +01:00
    assert(render("$DATE", us, "+01:00") == "Oct 14 20:47:37.123")
    // TS_FMT_ISO
    assert(render("$ISODATE", us, "+01:00") == "2005-10-14T20:47:37.123+01:00")
    // TS_FMT_FULL
    assert(render("$FULLDATE", us, "+01:00") == "2005 Oct 14 20:47:37.123")
    // TS_FMT_UNIX
    assert(render("$UNIXTIME", us, "+01:00") == "1129319257.123")
    // half-hour zone offsets
    assert(render("$ISODATE", us, "+01:30") == "2005-10-14T21:17:37.123+01:30")
    assert(render("$ISODATE", us, "-01:00") == "2005-10-14T18:47:37.123-01:00")
    assert(render("$ISODATE", us, "-01:30") == "2005-10-14T18:17:37.123-01:30")
    // epoch boundary, frac 0
    assert(render("$ISODATE", 0L, "+00:00", frac = 0) ==
      "1970-01-01T00:00:00+00:00")
  }
}
