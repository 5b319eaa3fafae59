package graft

import graft.config.{ConfigCompiler, ConfigParser}
import graft.operators.Mmdb
import org.apache.spark.sql.functions._

/** The geoip2 battery, ported from
  * `/root/reference/modules/geoip2/tests/test_geoip_parser.c` and run
  * against the reference's OWN test.mmdb (the public MaxMind-DB
  * project's GeoIP2-Precision-Enterprise test database, checked into
  * `modules/geoip2/tests/`). Exercises the clean-room mmdb reader on a
  * real MaxMind-produced file — tree walk, data decode, %f double
  * rendering — plus the geoip2() config parser's prefix forms. */
class GeoipBatterySpec extends GraftSuite {
  import spark.implicits._

  private val DbPath = "/root/reference/modules/geoip2/tests/test.mmdb"

  test("direct lookup: 2.125.160.216 resolves GB with %f coordinates (test_geoip_parser.c:124-135)") {
    val db = Mmdb.open(DbPath)
    val ip = ((2L << 24) | (125L << 16) | (160L << 8) | 216L)
    val data = db.lookup(ip).getOrElse(fail("no record for 2.125.160.216"))
    assert(data.get("country.iso_code").contains("GB"))
    assert(data.get("location.latitude").contains("51.750000"))
    assert(data.get("location.longitude").contains("-1.250000"))
  }

  private def run(parserText: String): Map[String, String] = {
    val logs = Seq(("h", "2.125.160.216")).toDF("host", "message")
    val cfg = ConfigParser.parse(s"""
      source s { file("/x"); };
      parser p { $parserText };
      destination d { file("/out"); };
      log { source(s); parser(p); destination(d); };
    """)
    ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
      .select("values").head.getMap[String, String](0).toMap
  }

  test("geoip2() default prefix .geoip2 (test_geoip_parser.c:124-135)") {
    val v = run(s"""geoip2("$$MESSAGE" database("$DbPath"));""")
    assert(v.get(".geoip2.country.iso_code").contains("GB"))
    assert(v.get(".geoip2.location.latitude").contains("51.750000"))
    assert(v.get(".geoip2.location.longitude").contains("-1.250000"))
  }

  test("geoip2() custom prefix with trailing-dot compaction (test_geoip_parser.c:104-112)") {
    val v = run(s"""geoip2("$$MESSAGE" prefix(".prefix.") database("$DbPath"));""")
    assert(v.get(".prefix.country.iso_code").contains("GB"))
  }

  test("geoip2() empty prefix keeps the leading dot (test_geoip_parser.c:114-122)") {
    val v = run(s"""geoip2("$$MESSAGE" prefix("") database("$DbPath"));""")
    assert(v.get(".country.iso_code").contains("GB"))
  }

  test("unmatched addresses pass through without values") {
    val logs = Seq(("h", "198.51.100.1")).toDF("host", "message")
    val cfg = ConfigParser.parse(s"""
      source s { file("/x"); };
      parser p { geoip2("$$MESSAGE" database("$DbPath")); };
      destination d { file("/out"); };
      log { source(s); parser(p); destination(d); };
    """)
    val out = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
    assert(out.count() == 1)
    val v = out.select("values").head.getMap[String, String](0)
    assert(!v.keys.exists(_.toString.startsWith(".geoip2.country")))
  }
}
