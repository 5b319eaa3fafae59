package graft

import graft.operators.{Filters, Scl}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The filter batteries, ported from
  * `/root/reference/lib/filter/tests/` — facility, severity (bits +
  * ranges), netmask, netmask6 (including the full 48-prefix network
  * mask table) and in-list, all evaluated through the real syslog parse
  * like the reference's `testcase(msg, filter, expected)`.
  */
class FilterBatterySpec extends GraftSuite {
  import spark.implicits._

  private def parsed(msg: String): DataFrame =
    Scl.parseSyslogMessage(Seq(msg).toDF("message"))

  private def matches(msg: String, f: org.apache.spark.sql.Column): Boolean =
    parsed(msg).filter(f).count() == 1

  private val Pthread = " openvpn[2499]: PTHREAD support initialized"

  /** test_filters_fop.c: boolean or/not composition compiled from config
    * text (the grammar's precedence, not the Column API). The C message
    * is `<16>` → facility code 2. */
  private def fopMatches(snippet: String): Boolean = {
    val src = parsed(s"<16>$Pthread")
    val cfg = graft.config.ConfigParser.parse(s"""
      source s { network(); };
      filter f { $snippet; };
      destination d { file("/out"); };
      log { source(s); filter(f); destination(d); };
    """)
    graft.config.ConfigCompiler.compile(cfg, Map("s" -> src))
      .head.df.count() == 1
  }

  test("test_or_evaluation battery (test_filters_fop.c:57-95)") {
    val cases = Seq(
      "    facility(2) or     facility(2)" -> true,
      "    facility(2) or not facility(2)" -> true,
      "not facility(2) or     facility(2)" -> true,
      "not facility(2) or not facility(2)" -> false,
      "(not facility(2)) or (not facility(2))" -> false,
      "    facility(3) or     facility(3)" -> false,
      "    facility(3) or not facility(3)" -> true,
      "not facility(3) or     facility(3)" -> true,
      "not facility(3) or not facility(3)" -> true,
      "(not facility(3)) or (not facility(3))" -> true,
      "    facility(2) or     facility(3)" -> true,
      "    facility(2) or not facility(3)" -> true,
      "not facility(2) or     facility(3)" -> false,
      "not facility(2) or not facility(3)" -> true,
      "(not facility(2)) or (not facility(3))" -> true)
    for ((snippet, expected) <- cases)
      assert(fopMatches(snippet) == expected, snippet)
  }

  test("facility names over parsed PRI (test_filters_facility.c:45-66)") {
    assert(matches(s"<15>$Pthread", Filters.facility("user")))
    assert(!matches(s"<15>$Pthread", Filters.facility("daemon")))
    assert(matches(s"<2>$Pthread", Filters.facility("kern")))
    assert(matches(s"<128>$Pthread", Filters.facility("local0")))
    assert(!matches(s"<32>$Pthread", Filters.facility("local1")))
    assert(matches(s"<32>$Pthread", Filters.facility("auth")))
    assert(matches(s"<80>$Pthread", Filters.facility("authpriv")))
    // facility bit unions (test_filter_facility_bits)
    assert(matches(s"<15>$Pthread", Filters.facility("daemon", "user")))
    assert(!matches(s"<15>$Pthread", Filters.facility("uucp", "local4")))
  }

  test("severity names over parsed PRI (test_filters_level_new.c:86-104)") {
    assert(!matches(s"<15>$Pthread", Filters.severity("emerg")))
    assert(matches(s"<0>$Pthread", Filters.severity("emerg")))
    assert(matches(s"<1>$Pthread", Filters.severity("alert")))
    assert(matches(s"<2>$Pthread", Filters.severity("crit")))
    assert(matches(s"<3>$Pthread", Filters.severity("err")))
    assert(matches(s"<4>$Pthread", Filters.severity("warning")))
    assert(matches(s"<5>$Pthread", Filters.severity("notice")))
    assert(matches(s"<6>$Pthread", Filters.severity("info")))
    assert(matches(s"<7>$Pthread", Filters.severity("debug")))
  }

  test("severity ranges (test_filters_level_new.c:46-77)") {
    assert(matches(s"<15>$Pthread", Filters.severityRange("debug", "emerg")))
    for (pri <- 8 to 10)
      assert(matches(s"<$pri>$Pthread", Filters.severityRange("crit", "emerg")), pri)
    for (pri <- 11 to 15)
      assert(!matches(s"<$pri>$Pthread", Filters.severityRange("crit", "emerg")), pri)
    for (pri <- 8 to 12)
      assert(!matches(s"<$pri>$Pthread", Filters.severityRange("debug", "notice")), pri)
    for (pri <- 13 to 15)
      assert(matches(s"<$pri>$Pthread", Filters.severityRange("debug", "notice")), pri)
  }

  test("netmask ip4 (test_filters_netmask.c:52-84)") {
    val saddr = lit("10.10.0.1")
    assert(matches(s"<15>$Pthread", Filters.netmask("10.10.0.0/16", saddr)))
    assert(matches(s"<15>$Pthread", Filters.netmask("10.10.0.0/24", saddr)))
    assert(!matches(s"<15>$Pthread", Filters.netmask("10.10.10.0/24", saddr)))
    assert(!matches(s"<15>$Pthread", Filters.netmask("0.0.10.10/24", saddr)))
    // no socket: the filter sees the v4 loopback
    val loop = lit("127.0.0.1")
    assert(matches(s"<15>$Pthread", Filters.netmask("127.0.0.1/32", loop)))
    assert(!matches(s"<15>$Pthread", Filters.netmask("127.0.0.2/32", loop)))
  }

  test("netmask6 socket cases incl. malformed patterns (test_filters_netmask6.c:146-171)") {
    val a = lit("2001:db80:85a3:8d30:1319:8a2e:3700:7348")
    assert(matches(s"<15>$Pthread", Filters.netmask6("::/1", a)))
    assert(matches(s"<15>$Pthread",
      Filters.netmask6("2001:db80:85a3:8d30:1319:8a2e::/95", a)))
    assert(matches(s"<15>$Pthread",
      Filters.netmask6("2001:db80:85a3:8d30:1319:8a2e:3700:7348/60", a)))
    assert(!matches(s"<15>$Pthread",
      Filters.netmask6("2001:db80:85a3:8d30:1319:8a2e:3700::/114", a)))
    assert(!matches(s"<15>$Pthread",
      Filters.netmask6("::85a3:8d30:1319:8a2e:3700::/114", a)))
    // malformed patterns compile to never-match, not an error
    for (bad <- Seq("aaaaaa/32", "/8", "::", "", "::1/8", "::1/128", "::2/32"))
      assert(!matches(s"<15>$Pthread", Filters.netmask6(bad, a)), bad)
  }

  test("netmask6 loopback cases (test_filters_netmask6.c:175-190)") {
    val loop = lit("::1")
    for (bad <- Seq("aaaaaa/32", "/8", "", "::/599", "::/aaa"))
      assert(!matches(s"<15>$Pthread", Filters.netmask6(bad, loop)), bad)
    for (good <- Seq("::1", "::/32", "::1/8", "::1/128", "::/16"))
      assert(matches(s"<15>$Pthread", Filters.netmask6(good, loop)), good)
  }

  test("netmask6 network mask table, all 48 prefixes (test_filters_netmask6.c:96-124)") {
    val addr = "2001:db80:85a3:8d30:1319:8a2e:3700:7348"
    val table = Seq(
      1 -> "::", 3 -> "2000::", 16 -> "2001::", 17 -> "2001:8000::",
      18 -> "2001:c000::", 20 -> "2001:d000::", 21 -> "2001:d800::",
      23 -> "2001:da00::", 24 -> "2001:db00::", 25 -> "2001:db80::",
      33 -> "2001:db80:8000::", 38 -> "2001:db80:8400::",
      40 -> "2001:db80:8500::", 41 -> "2001:db80:8580::",
      43 -> "2001:db80:85a0::", 47 -> "2001:db80:85a2::",
      48 -> "2001:db80:85a3::", 49 -> "2001:db80:85a3:8000::",
      54 -> "2001:db80:85a3:8c00::", 56 -> "2001:db80:85a3:8d00::",
      59 -> "2001:db80:85a3:8d20::", 60 -> "2001:db80:85a3:8d30::",
      68 -> "2001:db80:85a3:8d30:1000::", 71 -> "2001:db80:85a3:8d30:1200::",
      72 -> "2001:db80:85a3:8d30:1300::", 76 -> "2001:db80:85a3:8d30:1310::",
      77 -> "2001:db80:85a3:8d30:1318::", 80 -> "2001:db80:85a3:8d30:1319::",
      81 -> "2001:db80:85a3:8d30:1319:8000::",
      87 -> "2001:db80:85a3:8d30:1319:8a00::",
      91 -> "2001:db80:85a3:8d30:1319:8a20::",
      93 -> "2001:db80:85a3:8d30:1319:8a28::",
      94 -> "2001:db80:85a3:8d30:1319:8a2c::",
      95 -> "2001:db80:85a3:8d30:1319:8a2e::",
      99 -> "2001:db80:85a3:8d30:1319:8a2e:2000::",
      100 -> "2001:db80:85a3:8d30:1319:8a2e:3000::",
      102 -> "2001:db80:85a3:8d30:1319:8a2e:3400::",
      103 -> "2001:db80:85a3:8d30:1319:8a2e:3600::",
      104 -> "2001:db80:85a3:8d30:1319:8a2e:3700::",
      114 -> "2001:db80:85a3:8d30:1319:8a2e:3700:4000",
      115 -> "2001:db80:85a3:8d30:1319:8a2e:3700:6000",
      116 -> "2001:db80:85a3:8d30:1319:8a2e:3700:7000",
      119 -> "2001:db80:85a3:8d30:1319:8a2e:3700:7200",
      120 -> "2001:db80:85a3:8d30:1319:8a2e:3700:7300",
      122 -> "2001:db80:85a3:8d30:1319:8a2e:3700:7340",
      125 -> "2001:db80:85a3:8d30:1319:8a2e:3700:7348")
    // one frame, every prefix as a column: network/prefix contains the
    // address; flipping the last in-prefix bit of the address breaks it
    val bi = BigInt(1, java.net.InetAddress.getByName(addr).getAddress)
    val checks = table.flatMap { case (prefix, network) =>
      val flipped = bi.flipBit(128 - prefix)
      val flippedBytes = flipped.toByteArray.reverse.padTo(16, 0.toByte).reverse.takeRight(16)
      val flippedAddr = java.net.InetAddress.getByAddress(flippedBytes).getHostAddress
      Seq(
        (s"$network/$prefix", addr, true),
        (s"$network/$prefix", flippedAddr, false))
    }
    checks.foreach { case (cidr, ip, expected) =>
      val r = Seq(1).toDF("x")
        .select(Filters.netmask6(cidr, lit(ip)).as("m")).head.getBoolean(0)
      assert(r == expected, s"$cidr vs $ip")
    }
  }

  test("in-list file form (test_filters_in_list.c:64-144)") {
    val dir = java.nio.file.Files.createTempDirectory("inlist").toFile
    def write(name: String, lines: Seq[String]): String = {
      val f = new java.io.File(dir, name)
      val w = new java.io.PrintWriter(f)
      lines.foreach(w.println); w.close(); f.getAbsolutePath
    }
    val empty = write("empty.list", Nil)
    val test = write("test.list", Seq("test-program"))
    val many = write("lot_of_lines.list", (1 to 500).map(i => s"prog$i") :+ "test-program")
    val ip = write("ip.list", Seq("192.168.1.1"))

    val msg1 = "<15>Sep  4 15:03:55 localhost test-program[3086]: some random message"
    val msg2 = "<15>Sep  4 15:03:55 localhost foo[3086]: some random message"
    val msg3 = "<15>Sep  4 15:03:55 192.168.1.1 foo[3086]: some random message"

    assert(!matches(msg1, Filters.inListFile(empty, col("program"))))
    assert(!matches(msg2, Filters.inListFile(test, col("program"))))
    assert(matches(msg1, Filters.inListFile(test, col("program"))))
    assert(matches(msg1, Filters.inListFile(many, col("program"))))
    assert(matches(msg3, Filters.inListFile(ip, col("host"))))
    intercept[Exception](Filters.inListFile(
      new java.io.File(dir, "notexisting.list").getAbsolutePath, col("program")))
  }
}
