package graft

import org.apache.spark.unsafe.types.UTF8String

/** Varbind-list scanner battery, ported from
  * `/root/reference/modules/afsnmp/tests/test_varbindlist_scanner.c`
  * through [[graft.functions.SnmpTrapdScan]] (the scanner's one
  * consumer — snmptrapd-parser.c drives it over the text after the
  * trap header). The reference test asserts (key, type, value)
  * triples; the parser surface stores normalized keys (`:`-runs → `_`)
  * with the TYPE annotation stripped from values, and renders the
  * ORIGINAL keys into the generated message — both sides are asserted
  * here. The one case not representable through the parser surface is
  * the list-initial "\t " of test_tabs_and_spaces_as_separator: a
  * TAB after the header newline is the reference's v1-info marker,
  * so the battery keeps the inter-pair tabs (the semantics under
  * test) without the leading one.
  */
class SnmpVarbindBatterySpec extends GraftSuite {

  private val Header = "2024-05-01 10:20:30 zorp [udp: [127.0.0.1]:63000->[0.0.0.0]]:\n"

  private def scan(varbinds: String): (Map[String, String], String) = {
    val row = graft.functions.SnmpTrapdScan.scan(
      UTF8String.fromString(Header + varbinds))
    assert(row.getBoolean(0), s"parse failed for: $varbinds")
    val m = row.getMap(8)
    val pairs = (0 until m.numElements()).map { i =>
      m.keyArray().getUTF8String(i).toString ->
        m.valueArray().getUTF8String(i).toString
    }.toMap
    (pairs, row.getUTF8String(9).toString)
  }

  test("spaces as pair separator (test_varbindlist_scanner.c:75-87)") {
    val (pairs, _) = scan(
      "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.18372.3.2.1.1.2.2       " +
        "iso.3.6.1.4.1.18372.3.2.1.1.1.6 = STRING: \"svc/w4joHeFNzpFNrC8u9umJhc/ssh_4eyes_user_subjects:3/ssh\"")
    assert(pairs("iso.3.6.1.6.3.1.1.4.1.0") == "iso.3.6.1.4.1.18372.3.2.1.1.2.2")
    assert(pairs("iso.3.6.1.4.1.18372.3.2.1.1.1.6") ==
      "svc/w4joHeFNzpFNrC8u9umJhc/ssh_4eyes_user_subjects:3/ssh")
  }

  test("tabs and spaces as separators, trailing space runs (test:89-109)") {
    val (pairs, _) = scan(
      "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.18372.3.2.1.1.2.2\t" +
        "iso.3.6.1.4.1.18372.3.2.1.1.1.6 = STRING: \"svc\"\t\t" +
        "iso.1.2 = INTEGER: 40 \t" +
        "iso.3.4 = INTEGER: 30\t " +
        "iso.5.6 = INTEGER: 20  \t\t " +
        "iso.7.8 = INTEGER: 10")
    assert(pairs("iso.1.2") == "40") // trailing space before tab drops
    assert(pairs("iso.3.4") == "30")
    assert(pairs("iso.5.6") == "20")
    assert(pairs("iso.7.8") == "10")
    assert(pairs("iso.3.6.1.6.3.1.1.4.1.0") == "iso.3.6.1.4.1.18372.3.2.1.1.2.2")
  }

  test("key representations incl. MIB names (test:111-127)") {
    val (pairs, msg) = scan(
      ".1.3.6.1.2.1.1.3.0 = STRING: \"\"\t" +
        "IP-MIB::ipForwarding.0 = INTEGER: 0\t" +
        "sysUpTime.0 = Timeticks: 1:15:09:27.63\t" +
        "SNMP-VIEW-BASED-ACM-MIB::vacmSecurityModel.0.3.119.101.115 = xxx")
    assert(pairs(".1.3.6.1.2.1.1.3.0") == "")
    // ':'-runs normalize to one '_' in stored keys (snmptrapd-parser.c)
    assert(pairs("IP-MIB_ipForwarding.0") == "0")
    // "Timeticks" is the type annotation; the colon-ful remainder is value
    assert(pairs("sysUpTime.0") == "1:15:09:27.63")
    // untyped varbind: value verbatim
    assert(pairs("SNMP-VIEW-BASED-ACM-MIB_vacmSecurityModel.0.3.119.101.115") == "xxx")
    // the generated message keeps the ORIGINAL key spelling
    assert(msg.contains("IP-MIB::ipForwarding.0='0'"), msg)
  }

  test("every varbind type (test:129-158)") {
    val (pairs, _) = scan(
      ".iso.org.dod.internet.mgmt.mib-2.system.sysUpTime.0 = Timeticks: (875496867) 101 days, 7:56:08.67\t" +
        "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.8072.2.3.0.1\t" +
        "iso.3.6.1.4.1.8072.2.3.2.1 = INTEGER: 60\t" +
        "SNMP-VIEW-BASED-ACM-MIB::vacmSecurityModel.0.3.119.101.115 = STRING: \"random string\"\t" +
        "iso.3.2.2 = Gauge32: 22\t" +
        "iso.3.1.1 = Counter32: 11123123 \t" +
        "iso.3.5.3 = Hex-STRING: A0 BB CC DD EF\t" +
        "iso.3.8.8 = NULL \t" +
        "iso.2.1.1 = Timeticks: (34234234) 3 days, 23:05:42.34\t" +
        "SNMP-VIEW-BASED-ACM-MIB::vacmSecurityModel.0.wes = IpAddress: 192.168.1.0")
    assert(pairs(".iso.org.dod.internet.mgmt.mib-2.system.sysUpTime.0") ==
      "(875496867) 101 days, 7:56:08.67")
    assert(pairs("iso.3.6.1.6.3.1.1.4.1.0") == "iso.3.6.1.4.1.8072.2.3.0.1")
    assert(pairs("iso.3.6.1.4.1.8072.2.3.2.1") == "60")
    assert(pairs("SNMP-VIEW-BASED-ACM-MIB_vacmSecurityModel.0.3.119.101.115") ==
      "random string")
    assert(pairs("iso.3.2.2") == "22")
    assert(pairs("iso.3.1.1") == "11123123")
    assert(pairs("iso.3.5.3") == "A0 BB CC DD EF") // hex value keeps spaces
    assert(pairs("iso.3.8.8") == "NULL") // untyped NULL is a value
    assert(pairs("iso.2.1.1") == "(34234234) 3 days, 23:05:42.34")
    assert(pairs("SNMP-VIEW-BASED-ACM-MIB_vacmSecurityModel.0.wes") == "192.168.1.0")
  }

  test("separators inside quoted values (test:160-188)") {
    val (pairs, _) = scan(
      "iso.1.2.3 = STRING: \"quoted = string \t innerkey='innervalue'\" \t" +
        "iso.3.8.8 = NULL\t")
    assert(pairs("iso.1.2.3") == "quoted = string \t innerkey='innervalue'")
    assert(pairs("iso.3.8.8") == "NULL")
    // multi-line quoted value survives the record-level stop character
    val (p2, _) = scan(
      "iso.3.6.1.4.1.18372.3.2.1.1.1.6 = STRING: \"multi \n line\r\nvalue\" \t" +
        "iso.3.8.8 = NULL")
    assert(p2("iso.3.6.1.4.1.18372.3.2.1.1.1.6") == "multi \n line\r\nvalue")
    assert(p2("iso.3.8.8") == "NULL")
  }
}
