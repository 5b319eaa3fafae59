package graft

import graft.functions.DateScan
import org.apache.spark.sql.functions._

/** strptime battery, ported from
  * `/root/reference/lib/timeutils/tests/test_wallclocktime.c` through
  * the date-parser scanner surface: %f truncation/overflow, the full
  * %z RFC822/ISO8601 zone grammar (named zones, military letters with
  * the no-J-no-K quirk, exactly-2-or-4-digit offsets), %z whitespace
  * skipping, and %Z optionality. The scanner requires full consume
  * (date-parser semantics, test_date.c:205), so the reference's
  * "leftover text" expectations port as parse failures. */
class WallClockTimeBatterySpec extends GraftSuite {
  import spark.implicits._

  /** Returns (epochSec, usec, gmtoffSec) or None on parse failure;
    * unparsed zone resolves via the UTC default zone. */
  private def scan(msg: String, format: String): Option[(Long, Int, Int)] = {
    val row = Seq(msg).toDF("m")
      .select(DateScan(col("m"), Seq(format), None, "UTC",
        1547663400L, guessTimezone = false).as("d"))
      .select("d.ok", "d.epoch", "d.usec", "d.gmtoff").head
    if (!row.getBoolean(0)) None else
      Some((row.getLong(1), row.getInt(2), row.getInt(3)))
  }

  private val fmt = "%b %d %Y %H:%M:%S %z"
  private val base = 1547662992L // Jan 16 2019 18:23:12 UTC

  private def off(msg: String, format: String = fmt): Option[Int] =
    scan(msg, format).map(_._3)

  test("broken-down time with %f (test_strptime_parses_broken_down_time)") {
    val Some((e, us, _)) = scan("Jan 16 2019 18:23:12.012345",
      "%b %d %Y %H:%M:%S.%f")
    assert(e == base && us == 12345)
  }

  test("%f truncates short and overflowed fractions (:57-76)") {
    // ".012" -> 12000 us
    assert(scan("Jan 16 2019 18:23:12.012",
      "%b %d %Y %H:%M:%S.%f").get._2 == 12000)
    // 7+ digits divide down to microseconds
    assert(scan("Jan 16 2019 18:23:12.0123456",
      "%b %d %Y %H:%M:%S.%f").get._2 == 12345)
    // non-digit after the dot fails %f
    assert(scan("Jan 16 2019 18:23:12.boom",
      "%b %d %Y %H:%M:%S.%f").isEmpty)
  }

  test("%z named zones (test_strptime_percent_z_parses_rfc822_timezone)") {
    assert(off("Jan 16 2019 18:23:12 PST").contains(-8 * 3600))
    assert(off("Jan 16 2019 18:23:12 EDT").contains(-4 * 3600))
    assert(off("Jan 16 2019 18:23:12 GMT").contains(0))
    assert(off("Jan 16 2019 18:23:12 CET").contains(3600))
    assert(off("May 07 2021 09:29:12 CEST", fmt).contains(2 * 3600))
  }

  test("%z skips whitespace in front of the zone (:120-125)") {
    assert(off("Jan 16 2019 18:23:12 PST",
      "%b %d %Y %H:%M:%S%z").contains(-8 * 3600))
    assert(off("Jan 16 2019 18:23:12PST",
      "%b %d %Y %H:%M:%S%z").contains(-8 * 3600))
  }

  test("%z military letters: Z/M/Y valid, J invalid (:143-157)") {
    assert(off("Jan 16 2019 18:23:12 Z").contains(0))
    assert(off("Jan 16 2019 18:23:12 M").contains(-12 * 3600))
    assert(off("Jan 16 2019 18:23:12 Y").contains(12 * 3600))
    assert(off("Jan 16 2019 18:23:12 L").contains(-11 * 3600))
    assert(off("Jan 16 2019 18:23:12 J").isEmpty)
    // the reference's switch skips K too (wallclocktime.c:685-686)
    assert(off("Jan 16 2019 18:23:12 K").isEmpty)
  }

  test("%z numeric offsets: exactly 2 or 4 digits (:159-174)") {
    assert(off("Jan 16 2019 18:23:12 +05").contains(5 * 3600))
    assert(off("Jan 16 2019 18:23:12 +0500").contains(5 * 3600))
    assert(off("Jan 16 2019 18:23:12 +05:00").contains(5 * 3600))
    assert(off("Jan 16 2019 18:23:12 +05:30").contains(5 * 3600 + 1800))
    assert(off("Jan 16 2019 18:23:12 -0830").contains(-(8 * 3600 + 1800)))
    // 3 digits / 1 digit: invalid for %z (full-consume -> fail)
    assert(off("Jan 16 2019 18:23:12 +300").isEmpty)
    assert(off("Jan 16 2019 18:23:12 +3").isEmpty)
    // minutes must be < 60
    assert(off("Jan 16 2019 18:23:12 +0575").isEmpty)
  }

  test("%Z is optional but does not skip whitespace (:175-224)") {
    // directly-attached zone parses
    assert(off("Jan 16 2019 18:23:12PST",
      "%b %d %Y %H:%M:%S%Z").contains(-8 * 3600))
    // absent zone: %Z matches nothing, parse still succeeds
    val Some((e, _, g)) = scan("Jan 16 2019 18:23:12",
      "%b %d %Y %H:%M:%S %Z")
    assert(e == base && (g == Int.MinValue || g == 0), s"$e $g")
    // %Z does NOT skip the space itself -> " PST" is leftover ->
    // full-consume fails
    assert(scan("Jan 16 2019 18:23:12 PST",
      "%b %d %Y %H:%M:%S%Z").isEmpty)
    // invalid numeric forms are left unconsumed -> leftover -> fail
    assert(scan("Jan 16 2019 18:23:12 +300",
      "%b %d %Y %H:%M:%S %Z").isEmpty)
  }

  test("the G/U/Z switch quirk: 'UTC' consumes only 'UT' (wallclocktime.c:636-648)") {
    // "UT" parses clean; "UTC" leaves the 'C' -> full-consume fails
    assert(off("Jan 16 2019 18:23:12 UT").contains(0))
    assert(off("Jan 16 2019 18:23:12 UTC").isEmpty)
    // a partial G match aborts rather than falling through
    assert(off("Jan 16 2019 18:23:12 GX").isEmpty)
  }
}
