package graft

import graft.operators.Parsers
import org.apache.spark.sql.functions._

/** snmptrapd-parser() goldens ported from the reference's own battery
  * (`/root/reference/modules/afsnmp/tests/test_snmptrapd_parser.c`) +
  * the snmptrap() scl source e2e
  * (`scl/snmptrap/snmptrapd-source.conf`). */
class SnmptrapSpec extends GraftSuite {
  import spark.implicits._

  private def parse(input: String, prefix: String = ".snmp.",
      setMsg: Boolean = true) =
    Parsers.snmptrapdParser(Seq(input).toDF("message"), prefix, setMsg)

  private def nv(input: String, prefix: String = ".snmp.")
      : Map[String, String] = {
    val rows = parse(input, prefix).select("values").collect()
    assert(rows.length == 1, s"expected 1 parsed row, got ${rows.length}")
    rows.head.getMap[String, String](0).toMap
  }

  test("general v2 message with oids") {
    val input =
      "2017-05-10 12:46:14 web2-kukorica.syslog_ng.balabit [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n" +
        "iso.3.6.1.2.1.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67\t" +
        "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.8072.2.3.0.1       " +
        "iso.3.6.1.4.1.8072.2.3.2.1 = INTEGER: 60        \t " +
        "iso.3.6.1.4.1.8072.2.1.3 = \"\""
    val m = nv(input)
    assert(m(".snmp.hostname") == "web2-kukorica.syslog_ng.balabit")
    assert(m(".snmp.transport_info") == "UDP: [127.0.0.1]:34257->[127.0.0.1]:162")
    assert(m(".snmp.iso.3.6.1.2.1.1.3.0") == "(875496867) 101 days, 7:56:08.67")
    assert(m(".snmp.iso.3.6.1.6.3.1.1.4.1.0") == "iso.3.6.1.4.1.8072.2.3.0.1")
    assert(m(".snmp.iso.3.6.1.4.1.8072.2.3.2.1") == "60")
    assert(m(".snmp.iso.3.6.1.4.1.8072.2.1.3") == "")
    // DATE golden "May 10 12:46:14" + program override
    val r = parse(input).select(
      date_format(col("ts"), "MMM d HH:mm:ss"), col("program")).head()
    assert(r.getString(0) == "May 10 12:46:14")
    assert(r.getString(1) == "snmptrapd")
  }

  test("general v1 message with oids") {
    val input =
      "2017-11-10 13:23:16 localhost [UDP: [127.0.0.1]:53831->[127.0.0.1]:162]: iso.3.6.1.4.1.8072.2.3.1\n" +
        "\t Enterprise Specific Trap (.17) Uptime: 18:41:07.83\n" +
        "iso.3.6.1.4.1.8072.2.1.1 = INTEGER: 123456"
    val m = nv(input)
    assert(m(".snmp.hostname") == "localhost")
    assert(m(".snmp.enterprise_oid") == "iso.3.6.1.4.1.8072.2.3.1")
    assert(m(".snmp.type") == "Enterprise Specific Trap")
    assert(m(".snmp.subtype") == ".17")
    assert(m(".snmp.uptime") == "18:41:07.83")
    assert(m(".snmp.iso.3.6.1.4.1.8072.2.1.1") == "123456")
  }

  test("v2 with symbolic names and various types") {
    val input =
      "2017-05-13 12:17:32 localhost [UDP: [127.0.0.1]:52407->[127.0.0.1]:162]:  \n " +
        "mib-2.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67 \t" +
        "snmpModules.1.1.4.1.0 = OID: netSnmpExampleHeartbeatNotification " +
        "netSnmpExampleHeartbeatRate = INTEGER: 60\t" +
        "netSnmpExampleString = STRING: \"string innerkey='innervalue'\"\t" +
        "org.2.2 = Gauge32: 22\t" +
        "org.1.1 = Counter32: 11123123   " +
        "org.5.3 = Hex-STRING: A0 BB CC DD EF \t" +
        "org.8.8 = NULL\t" +
        "dod.7 = IpAddress: 192.168.1.0\t  " +
        "org.5.9 = STRING: \"@\""
    val m = nv(input)
    assert(m(".snmp.snmpModules.1.1.4.1.0") == "netSnmpExampleHeartbeatNotification")
    assert(m(".snmp.netSnmpExampleHeartbeatRate") == "60")
    assert(m(".snmp.netSnmpExampleString") == "string innerkey='innervalue'")
    assert(m(".snmp.org.2.2") == "22")
    assert(m(".snmp.org.1.1") == "11123123")
    assert(m(".snmp.org.5.3") == "A0 BB CC DD EF")
    assert(m(".snmp.org.8.8") == "NULL")
    assert(m(".snmp.dod.7") == "192.168.1.0")
    assert(m(".snmp.org.5.9") == "@")
  }

  test("v1 with symbolic names") {
    val input =
      "2017-05-13 12:18:30  localhost  [UDP: [127.0.0.1]:58143->[127.0.0.1]:162] : netSnmpExampleNotification \n" +
        "\t Warm Start Trap (1) Uptime:  27 days, 2:39:02.34\n " +
        "netSnmpExampleInteger = INTEGER: 123456 \t netSnmpExampleString = STRING: random string"
    val m = nv(input)
    assert(m(".snmp.hostname") == "localhost")
    assert(m(".snmp.transport_info") == "UDP: [127.0.0.1]:58143->[127.0.0.1]:162")
    assert(m(".snmp.enterprise_oid") == "netSnmpExampleNotification")
    assert(m(".snmp.type") == "Warm Start Trap")
    assert(m(".snmp.subtype") == "1")
    assert(m(".snmp.uptime") == "27 days, 2:39:02.34")
    assert(m(".snmp.netSnmpExampleInteger") == "123456")
    assert(m(".snmp.netSnmpExampleString") == "random string")
  }

  test("v2 generated MESSAGE with escaping; set-message-macro(no) unsets") {
    val input =
      "2017-05-17 13:26:04 localhost [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n" +
        "iso.3.6.1.4.1.18372.3.2.1.1.1.6 = STRING: \"test 'escaped'\""
    val msg = parse(input).select("message").head().getString(0)
    assert(msg == "hostname='localhost', " +
      "transport_info='UDP: [127.0.0.1]:34257->[127.0.0.1]:162', " +
      "iso.3.6.1.4.1.18372.3.2.1.1.1.6='test \\'escaped\\''", msg)
    val unset = parse(input, setMsg = false).select("message").head()
    assert(unset.isNullAt(0))
  }

  test("v2 without prefix") {
    val input =
      "2017-05-17 13:26:04 localhost [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n" +
        "iso.3.6.1.4.1.18372.3.2.1.1.1.6 = test"
    val m = nv(input, prefix = "")
    assert(m("hostname") == "localhost")
    assert(m("iso.3.6.1.4.1.18372.3.2.1.1.1.6") == "test")
  }

  test("v2 key normalization: colon runs collapse to one underscore") {
    val input =
      "2017-05-13 12:17:32 localhost [UDP: [127.0.0.1]:52407->[127.0.0.1]:162]:  \n " +
        "mib-2.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67 \t" +
        "NET-SNMP-EXAMPLES-MIB:netSnmpExampleString = STRING: \"random fact\" \t" +
        "NET-SNMP-EXAMPLES-MIB::netSnmpColons = STRING: \"Colossus colons\" \t" +
        "NET-SNMP-EXAMPLES-MIB::::::::::::::::::::::::::Trail = STRING: \"Gary Indiana\" \t" +
        ":NET-SNMP-EXAMPLES::::::::::::::::::::::::::::::MIB: = INTEGER: 1234 \t"
    val m = nv(input)
    assert(m(".snmp.NET-SNMP-EXAMPLES-MIB_netSnmpExampleString") == "random fact")
    assert(m(".snmp.NET-SNMP-EXAMPLES-MIB_netSnmpColons") == "Colossus colons")
    assert(m(".snmp.NET-SNMP-EXAMPLES-MIB_Trail") == "Gary Indiana")
    assert(m(".snmp._NET-SNMP-EXAMPLES_MIB_") == "1234")
  }

  test("v1 message without varbindlist") {
    val input =
      "2017-05-10 13:23:16 localhost [UDP: [127.0.0.1]:53831->[127.0.0.1]:162]: iso.3.6.1.4.1.8072.2.3.1\n" +
        "\t Enterprise Specific Trap (.17) Uptime: 18:41:07.83"
    val m = nv(input)
    assert(m(".snmp.enterprise_oid") == "iso.3.6.1.4.1.8072.2.3.1")
    assert(m(".snmp.type") == "Enterprise Specific Trap")
    assert(m(".snmp.subtype") == ".17")
    assert(m(".snmp.uptime") == "18:41:07.83")
  }

  test("snmptrapd debug lines and tab-led varbind lists drop") {
    val dbg = "2017-05-19 10:00:00 NET-SNMP version 5.7.3 Stopped.\nStopping snmptrapd"
    assert(parse(dbg).count() == 0)
    val tabbed =
      "2017-05-19 13:37:00 localhost [UDP: [127.0.0.1]:36324->[127.0.0.1]:162]:\n" +
        "\tiso.3.6.1.2.1.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67 \t" +
        "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.8072.2.3.0.1 \t" +
        "iso.3.6.1.4.1.8072.2.3.2.1 = INTEGER: 60"
    assert(parse(tabbed).count() == 0)
  }

  test("v2 message with garbage after newline stops the varbind scan") {
    val input =
      "2017-05-10 12:46:14 localhost [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n" +
        "iso.3.6.1.2.1.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67\t" +
        "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.8072.2.3.0.1\n" +
        "garbage = stop here"
    val m = nv(input)
    assert(m(".snmp.iso.3.6.1.6.3.1.1.4.1.0") == "iso.3.6.1.4.1.8072.2.3.0.1")
    assert(!m.contains(".snmp.garbage"))
  }

  test("snmptrap() source: multiline assembly + parse, config e2e") {
    val inDir = java.nio.file.Files.createTempDirectory("graft-snmp-in").toString
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(inDir, "traps.log"),
      "2017-05-10 12:46:14 host1 [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n" +
        "iso.3.6.1.4.1.8072.2.1.1 = INTEGER: 1\n" +
        "2017-05-10 12:46:15 host2 [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n" +
        "iso.3.6.1.4.1.8072.2.1.1 = INTEGER: 2\n")
    val cfg = graft.config.ConfigParser.parse(s"""
      source s_tr { snmptrap(filename("$inDir/*.log")); };
      destination d { file("/out/tr.log"); };
      log { source(s_tr); destination(d); };
    """)
    val (routes, _) = graft.config.ConfigCompiler.compileStreamingPipeline(
      cfg, spark, java.nio.file.Files.createTempDirectory("graft-snmp-sp").toString)
    val cp = java.nio.file.Files.createTempDirectory("graft-snmp-cp").toString
    val q = routes.head.df.writeStream.format("memory").queryName("snmp_out")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    val rows = spark.table("snmp_out").select(
        element_at(col("values"), ".snmp.hostname"),
        element_at(col("values"), ".snmp.iso.3.6.1.4.1.8072.2.1.1"),
        col("program"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    assert(rows == Seq(("host1", "1", "snmptrapd"), ("host2", "2", "snmptrapd")))
  }
}
