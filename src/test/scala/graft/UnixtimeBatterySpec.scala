package graft

import graft.operators.Rewrites
import org.apache.spark.sql.functions._

/** Timezone-fixup battery, ported from
  * `/root/reference/lib/timeutils/tests/test_unixtime.c`: the
  * fix-time-zone 3-step DST walk (spring/autumn × both directions),
  * set-time-zone, and the guess-time-zone real-time heuristic. The
  * stamps here are instants whose UTC rendering is the wall clock
  * (implied source offset 0), so the reference's `ut_sec` expectations
  * port directly. The autumn overlap cases are the ones where
  * java.time's local rules (first occurrence) would diverge from the
  * reference's instant-lookup walk (second occurrence). */
class UnixtimeBatterySpec extends GraftSuite {
  import spark.implicits._

  private def fix(wallEpoch: Long, zone: String, src: String = "UTC"): Long =
    Rewrites.fixTimeZone(
        Seq(wallEpoch).toDF("e").withColumn("ts", col("e").cast("timestamp")),
        "ts", zone, src)
      .select(col("ts").cast("long")).head.getLong(0)

  test("fix-time-zone keeps the wall clock across zones (unix_time_fix_timezone_adjusts...)") {
    // Jan 19 2019 18:58:48 CET -> fixed to a -5h zone: wall stays,
    // instant moves 6 hours forward
    val cetInstant = 1547920728L // Jan 19 2019 17:58:48Z == 18:58:48 CET
    assert(fix(cetInstant, "Etc/GMT+5", src = "CET") == cetInstant + 21600)
  }

  test("spring DST walk, backwards zone change CET->EST5EDT (test_unixtime.c:86-153)") {
    val base = 1552183200L // wall Mar 10 2019 02:00:00 (UTC-rendered)
    val dst = 1552201200L  // the EST5EDT spring transition instant
    assert(fix(base - 1, "EST5EDT") == dst - 1)     // short of the hour
    assert(fix(base, "EST5EDT") == dst)             // exactly 02:00 -> 03:00 EDT
    assert(fix(base + 1800, "EST5EDT") == dst + 1800) // 02:30 -> 03:30
    assert(fix(base + 3600, "EST5EDT") == dst)      // 03:00 collapses onto the hour
    assert(fix(base + 7200, "EST5EDT") == dst + 3600) // 04:00
  }

  test("spring DST walk, forwards zone change EST5EDT->CET (test_unixtime.c:155-212)") {
    val base = 1553997600L // wall Mar 31 2019 02:00:00
    val dst = 1553994000L  // the CET spring transition instant
    assert(fix(base - 1, "CET") == dst - 1)
    assert(fix(base, "CET") == dst)
    assert(fix(base + 1800, "CET") == dst + 1800)
    assert(fix(base + 3600, "CET") == dst)
    assert(fix(base + 7200, "CET") == dst + 3600)
  }

  test("autumn DST walk lands on the SECOND occurrence, CET->EST5EDT (test_unixtime.c:214-281)") {
    val base = 1572746400L // wall Nov 3 2019 02:00:00
    val end = 1572760800L  // the EST5EDT autumn transition instant
    assert(fix(base - 1, "EST5EDT") == end - 1) // still EDT
    // past the threshold the reference assumes the 2nd 02:00:00 (EST):
    // an hour is skipped — java.time local rules would pick the 1st
    assert(fix(base, "EST5EDT") == end + 3600)
    assert(fix(base + 1800, "EST5EDT") == end + 3600 + 1800)
    assert(fix(base + 3600, "EST5EDT") == end + 3600 + 3600)
    assert(fix(base + 7200, "EST5EDT") == end + 3600 + 7200)
  }

  test("autumn DST walk, forwards zone change EST5EDT->CET (test_unixtime.c:282-350)") {
    val base = 1572141600L // wall Oct 27 2019 02:00:00
    val end = 1572134400L  // the CET autumn transition instant
    assert(fix(base - 1, "CET") == end - 1)
    assert(fix(base, "CET") == end + 3600)
    assert(fix(base + 1800, "CET") == end + 3600 + 1800)
    assert(fix(base + 3600, "CET") == end + 3600 + 3600)
    assert(fix(base + 7200, "CET") == end + 3600 + 7200)
  }

  test("set-time-zone re-renders the same instant (unix_time_set_timezone_converts...)") {
    // instant Jan 19 2019 17:58:48Z; rendered in a -5h zone the wall is
    // 12:58:48 — the stored wall shifts, the information content is the
    // rendering
    val instant = 1547920728L
    val out = Rewrites.setTimeZone(
        Seq(instant).toDF("e").withColumn("ts", col("e").cast("timestamp")),
        "ts", "Etc/GMT+5")
      .select(date_format(col("ts"), "HH:mm:ss")).head.getString(0)
    assert(out == "12:58:48")
  }

  private val now = 1576790744L // Thu Dec 19 2019 21:25:44Z

  private def guess(tsEpoch: Long): Long =
    Rewrites.guessTimeZone(
        Seq(tsEpoch).toDF("e").withColumn("ts", col("e").cast("timestamp")),
        "ts", lit(now).cast("timestamp"))
      .select(col("ts").cast("long")).head.getLong(0)

  test("guess-time-zone fixes even-hour differences up to the zone extremes (test_unixtime.c:398-439)") {
    assert(guess(now - 3600) == now)       // one hour earlier
    assert(guess(now - 12 * 3600) == now)  // -12:00 extreme
    assert(guess(now + 14 * 3600) == now)  // +14:00 extreme
    assert(guess(now - 13 * 3600) == now - 13 * 3600) // beyond -12: untouched
    assert(guess(now + 15 * 3600) == now + 15 * 3600) // beyond +14: untouched
  }

  test("guess-time-zone quarter-hour sweep matches the tzdata whitelist (test_unixtime.c:440-470)") {
    var evens = 0
    var nonEvens = 0
    for (d <- -13 * 3600 to 14 * 3600 by 900) {
      val out = guess(now + d)
      if (out != now + d) {
        assert(out == now, s"d=$d")
        if (d % 3600 != 0) nonEvens += 1 else evens += 1
      }
    }
    // the curated 30/45-minute offsets (unixtime.c:98-117)
    assert(nonEvens == 17, s"non-even: $nonEvens")
    // -12:00 .. 00:00 .. +14:00 hourly — d == 0 is a fix onto itself
    // and invisible to the out != in probe, hence 26 observable
    assert(evens == 26, s"even: $evens")
  }

  test("guess-time-zone tolerates 30s drift, rejects 31s and >24h (unixtime.c:140-160)") {
    assert(guess(now - 3600 + 29) == now + 29)          // 29s inside a quarter
    assert(guess(now - 3600 + 31) == now - 3600 + 31)   // 31s: untouched
    assert(guess(now - 25 * 3600) == now - 25 * 3600)   // not real time
  }
}
