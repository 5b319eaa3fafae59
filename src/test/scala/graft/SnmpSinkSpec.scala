package graft

import graft.streaming.SnmpSink

/** snmp() destination: BER-encoded SNMPv2c TRAP2 over UDP
  * (afsnmpdest semantics; BER/SMI is the public spec). */
class SnmpSinkSpec extends GraftSuite {

  test("BER vectors: oid, integer, sanitize") {
    assert(SnmpSink.berOid("1.3.6.1.4.1").map(_ & 0xff).toSeq ==
      Seq(0x06, 0x05, 0x2b, 0x06, 0x01, 0x04, 0x01))
    // multi-byte arc: 18372 = 1·128² + 15·128 + 68 → 0x81 0x8f 0x44
    assert(SnmpSink.berOid(".1.3.6.1.4.1.18372").map(_ & 0xff).toSeq
      .drop(2) == Seq(0x2b, 0x06, 0x01, 0x04, 0x01, 0x81, 0x8f, 0x44))
    assert(SnmpSink.berInt(0).map(_ & 0xff).toSeq == Seq(0x02, 0x01, 0x00))
    assert(SnmpSink.berInt(127).map(_ & 0xff).toSeq == Seq(0x02, 0x01, 0x7f))
    assert(SnmpSink.berInt(128).map(_ & 0xff).toSeq == Seq(0x02, 0x02, 0x00, 0x80.toByte & 0xff))
    assert(SnmpSink.sanitize("integer", "abc") == "0")
    assert(SnmpSink.sanitize("integer", "17") == "17")
    assert(SnmpSink.sanitize("counter32", "") == "0")
    assert(SnmpSink.sanitize("octetstring", "abc") == "abc")
    assert(SnmpSink.sanitize("objectid", ".1.2.x") == ".1.2.x")
  }

  // ---- test-side BER decode -------------------------------------------

  private case class Tlv(tag: Int, body: Array[Byte])

  private def decodeTlvs(b: Array[Byte], p0: Int, end: Int): Seq[Tlv] = {
    var p = p0
    val out = scala.collection.mutable.ArrayBuffer.empty[Tlv]
    while (p < end) {
      val tag = b(p) & 0xff; p += 1
      var len = b(p) & 0xff; p += 1
      if ((len & 0x80) != 0) {
        val n = len & 0x7f
        len = (0 until n).foldLeft(0)((acc, i) => (acc << 8) | (b(p + i) & 0xff))
        p += n
      }
      out += Tlv(tag, b.slice(p, p + len)); p += len
    }
    out.toSeq
  }

  private def asLong(t: Tlv): Long =
    t.body.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xff))

  private def oidString(t: Tlv): String = {
    val first = t.body(0) & 0xff
    val sb = new StringBuilder(s"${first / 40}.${first % 40}")
    var arc = 0L
    t.body.drop(1).foreach { x =>
      arc = (arc << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) { sb.append("." + arc); arc = 0 }
    }
    sb.toString
  }

  private def withTrapListener(f: Int => Unit): Seq[Array[Byte]] = {
    val sock = new java.net.DatagramSocket(0,
      java.net.InetAddress.getByName("127.0.0.1"))
    sock.setSoTimeout(30000)
    val pkts = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Array[Byte]]())
    val th = new Thread(() => {
      try {
        while (!sock.isClosed) {
          val buf = new Array[Byte](65535)
          val p = new java.net.DatagramPacket(buf, buf.length)
          sock.receive(p)
          pkts.add(java.util.Arrays.copyOf(p.getData, p.getLength))
        }
      } catch { case _: Throwable => () }
    })
    th.setDaemon(true); th.start()
    try {
      f(sock.getLocalPort)
      // UDP is async — give the listener a beat to drain
      val deadline = System.nanoTime + 5L * 1000 * 1000 * 1000
      while (pkts.isEmpty && System.nanoTime < deadline) Thread.sleep(50)
    } finally sock.close()
    th.join(2000)
    import scala.jdk.CollectionConverters._
    pkts.asScala.toSeq
  }

  private def runFileRoute(conf: String, dir: String): Unit = {
    val (routes, _) = graft.config.ConfigCompiler.compileStreamingPipeline(
      graft.config.ConfigParser.parse(conf), spark, s"$dir/unused")
    val q = graft.config.ConfigCompiler.startRoute(routes.head,
      s"$dir/out", s"$dir/cp")
    q.awaitTermination(60000)
  }

  test("config text: snmp() sends a v2c TRAP2 with ordered varbinds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snmp").toString
    val in = java.nio.file.Files.createTempDirectory("graft_snmp_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      "<38>1 2024-01-12T03:04:05Z h1 app 7 M1 - trap body\n".getBytes)
    val pkts = withTrapListener { port =>
      runFileRoute(s"""
        source s0 { file("${in.resolve("*.log")}"); };
        destination d { snmp(host("127.0.0.1") port($port)
          community("sec")
          snmp-obj(".1.3.6.1.2.1.1.3.0" "timeticks" "97")
          trap-obj(".1.3.6.1.6.3.1.1.4.1.0" "objectid" ".1.3.6.1.4.1.18372.3.1.1.1.2.1")
          snmp-obj(".1.3.6.1.4.1.18372.3.1.1.1.1.1.0" "octetstring" "$$MESSAGE")
          snmp-obj(".1.3.6.1.4.1.18372.3.1.1.1.1.2.0" "integer" "$$PROGRAM")
          snmp-obj(".1.3.6.1.4.1.18372.3.1.1.1.1.3.0" "ipaddress" "10.0.0.1")); };
        log { source(s0); destination(d); };
      """, dir)
    }
    assert(pkts.length == 1, s"expected one trap, got ${pkts.length}")
    val Seq(msg) = decodeTlvs(pkts.head, 0, pkts.head.length)
    assert(msg.tag == 0x30)
    val parts = decodeTlvs(msg.body, 0, msg.body.length)
    assert(parts(0).tag == 0x02 && asLong(parts(0)) == 1)        // version v2c
    assert(parts(1).tag == 0x04 && new String(parts(1).body) == "sec")
    assert(parts(2).tag == 0xa7)                                 // TRAP2
    val pdu = decodeTlvs(parts(2).body, 0, parts(2).body.length)
    assert(pdu(1).tag == 0x02 && asLong(pdu(1)) == 0)            // error-status
    assert(pdu(2).tag == 0x02 && asLong(pdu(2)) == 0)            // error-index
    val vbs = decodeTlvs(pdu(3).body, 0, pdu(3).body.length)
      .map(vb => decodeTlvs(vb.body, 0, vb.body.length))
    assert(vbs.length == 5, vbs)
    assert(oidString(vbs(0)(0)) == "1.3.6.1.2.1.1.3.0" &&
      vbs(0)(1).tag == 0x43 && asLong(vbs(0)(1)) == 97)          // sysUpTime
    assert(oidString(vbs(1)(0)) == "1.3.6.1.6.3.1.1.4.1.0" &&
      vbs(1)(1).tag == 0x06 &&
      oidString(vbs(1)(1)) == "1.3.6.1.4.1.18372.3.1.1.1.2.1")   // trap-obj
    assert(vbs(2)(1).tag == 0x04 &&
      new String(vbs(2)(1).body) == "trap body")                 // octetstring
    // integer rendered "app" — non-numeric → sanitized to 0
    assert(vbs(3)(1).tag == 0x02 && asLong(vbs(3)(1)) == 0)
    assert(vbs(4)(1).tag == 0x40 &&
      vbs(4)(1).body.map(_ & 0xff).toSeq == Seq(10, 0, 0, 1))    // ipaddress
  }

  test("snmp(): version(v3) is rejected loudly") {
    val ex = intercept[IllegalArgumentException] {
      runFileRoute(s"""
        source s0 { file("/nonexistent/*.log"); };
        destination d { snmp(version(v3) host("h")
          snmp-obj(".1.2.3" "integer" "1")); };
        log { source(s0); destination(d); };
      """, java.nio.file.Files.createTempDirectory("graft_snmp3").toString)
    }
    assert(ex.getMessage.contains("v2c"))
  }
}
