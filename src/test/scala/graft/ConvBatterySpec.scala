package graft

import graft.functions.DateScan
import org.apache.spark.sql.functions._

/** Verbatim port of the wall-clock↔unix-time conversion battery
  * (`/root/reference/lib/timeutils/tests/test_conv.c`, TZ=CET) through
  * the engine's DateScan surface — the same strptime formats, the same
  * expected epochs/offsets. The egress direction
  * (convert_unix_time_to_wall_clock_time*) is covered by the ported
  * test_unixtime.c battery (UnixtimeBatterySpec) and the zone-rendered
  * template macros; what this battery adds is the ingest-side
  * conversion contract: local-zone assumption, tz hints, and — the
  * real divergence it found — glibc-mktime normalization of a wall
  * clock inside the spring-forward gap (the reference KEEPS the wall
  * fields and anchors at the post-transition offset; java.time's
  * atZone would shift the clock forward an hour — DateScan now
  * implements the mktime behavior).
  */
class ConvBatterySpec extends GraftSuite {
  import spark.implicits._

  private val Fmt = "%b %d %Y %H:%M:%S"
  private val RefNow = 1547920728L

  private def scan(msg: String, format: String = Fmt,
      zone: String = "CET"): (Long, Int) = {
    val df = Seq(msg).toDF("m").select(
      DateScan(col("m"), Seq(format), None, zone, RefNow, false).as("d"))
    val row = df.select("d.ok", "d.epoch", "d.gmtoff").head
    assert(row.getBoolean(0), s"parse failed: $msg")
    (row.getLong(1), row.getInt(2))
  }

  test("convert_wall_clock_time_to_unix_time: local CET zone (:46-70)") {
    // "Jan 19 2019 18:58:48" in CET (+01) → 1547920728; the
    // no-explicit-zone case assumes the configured zone — both C cases
    // (explicit gmtoff 3600 and local-tz assumption) land here
    val (e, o) = scan("Jan 19 2019 18:58:48")
    assert(e == 1547920728L && o == 3600)
  }

  test("tz hint used when the stamp carries no zone (:167-185)") {
    // convert_wall_clock_time_to_unix_time_with_tz_hint(7200 / -5h)
    val (e1, o1) = scan("Jan 19 2019 18:58:48", zone = "+02:00")
    assert(e1 == 1547917128L && o1 == 7200)
    val (e2, o2) = scan("Jan 19 2019 18:58:48", zone = "-05:00")
    assert(e2 == 1547942328L && o2 == -18000)
  }

  test("spring-gap wall clock keeps its fields at the post-transition offset (:72-91)") {
    // "Mar 31 2019 02:11:00" CET: 02:00-03:00 does not exist; glibc
    // mktime yields 02:11 CEST (+0200) = 1553994660-3600 and the
    // normalized wct keeps hour 2 with gmtoff 7200
    val (e, o) = scan("Mar 31 2019 02:11:00")
    assert(e == 1553994660L - 3600L, s"got $e")
    assert(o == 7200)
    // java.time's atZone-in-gap behavior (03:11 CEST = 1553994660)
    // would be one hour later — pin that we do NOT do that
    assert(e != 1553994660L)
  }

  test("foreign-zone stamps inside the local transition hour (:93-165)") {
    // "Mar 31 2019 02:11:00 EDT": the wall clock sits in CET's spring
    // transition hour but EDT (-4h) anchors it absolutely
    val (e1, o1) = scan("Mar 31 2019 02:11:00 EDT", format = Fmt + " %Z")
    assert(e1 == 1554012660L && o1 == -4 * 3600)
    // "Oct 27 2019 02:11:00 EDT": CET's autumn overlap hour, same deal
    val (e2, o2) = scan("Oct 27 2019 02:11:00 EDT", format = Fmt + " %Z")
    assert(e2 == 1572156660L && o2 == -4 * 3600)
  }

  test("autumn-overlap wall clock picks the FIRST (DST) occurrence") {
    // "Oct 27 2019 02:30:00" CET: 02:30 happens twice; glibc mktime
    // with isdst=-1 resolves to the first pass (CEST, +0200) —
    // java.time's getValidOffsets lists that offset first, so the two
    // agree here (pinned so a library change can't silently flip it)
    val (e, o) = scan("Oct 27 2019 02:30:00")
    assert(o == 7200)
    assert(e == 1572136200L) // 2019-10-27T00:30:00Z
  }
}
