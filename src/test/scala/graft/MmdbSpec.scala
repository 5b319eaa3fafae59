package graft

import graft.operators.{Enrich, Mmdb}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** mmdb reader spec against a file built here byte-by-byte from the
  * public MaxMind DB File Format Specification 2.0 (ip_version 4,
  * record_size 24, nested maps + uint data). */
class MmdbSpec extends GraftSuite {
  import spark.implicits._

  // ---- tiny spec-conformant writer ----------------------------------------
  private def encStr(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    require(b.length < 29)
    ((2 << 5) | b.length).toByte +: b
  }
  private def encUint(v: Long): Array[Byte] = {
    var n = 1
    while ((v >>> (8 * n)) != 0) n += 1
    ((6 << 5) | n).toByte +: (0 until n).reverse.map(k => ((v >>> (8 * k)) & 0xFF).toByte).toArray
  }
  private def mapHdr(n: Int): Array[Byte] = Array(((7 << 5) | n).toByte)

  private sealed trait Slot
  private case object Empty extends Slot
  private case class Child(idx: Int) extends Slot
  private case class Data(off: Int) extends Slot

  private class TrieWriter {
    val nodes = ArrayBuffer[(Array[Slot])](Array[Slot](Empty, Empty))
    def insertBits(bits: Seq[Int], dataOff: Int): Unit = {
      var cur = 0
      for (i <- bits.indices) {
        val bit = bits(i)
        if (i == bits.length - 1) nodes(cur)(bit) = Data(dataOff)
        else nodes(cur)(bit) match {
          case Child(idx) => cur = idx
          case Empty =>
            nodes += Array[Slot](Empty, Empty)
            nodes(cur)(bit) = Child(nodes.length - 1)
            cur = nodes.length - 1
          case Data(_) => fail("prefix conflict")
        }
      }
    }
    def insert(net: Long, prefixLen: Int, dataOff: Int): Unit =
      insertBits((0 until prefixLen).map(i => ((net >>> (31 - i)) & 1L).toInt),
        dataOff)
    def serialize(): Array[Byte] = {
      val nc = nodes.length
      val out = new ArrayBuffer[Byte]()
      def rec24(s: Slot): Array[Byte] = {
        val v = s match {
          case Empty => nc
          case Child(i) => i
          case Data(off) => nc + 16 + off
        }
        Array(((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      }
      nodes.foreach { n => out ++= rec24(n(0)); out ++= rec24(n(1)) }
      out.toArray
    }
  }

  private def ip(s: String): Long =
    s.split("\\.").map(_.toLong).reduce((a, b) => (a << 8) | b)

  private def buildMmdb(): java.nio.file.Path = {
    val recA = mapHdr(2) ++ encStr("country") ++
      (mapHdr(1) ++ encStr("iso_code") ++ encStr("AA")) ++
      encStr("asn") ++ encUint(64512)
    val recB = mapHdr(1) ++ encStr("country") ++
      mapHdr(1) ++ encStr("iso_code") ++ encStr("BB")
    val offA = 0
    val offB = recA.length
    val trie = new TrieWriter
    trie.insert(ip("10.0.0.0"), 8, offA)
    trie.insert(ip("192.168.0.0"), 16, offB)
    val tree = trie.serialize()
    val marker = Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
      "MaxMind.com".getBytes("US-ASCII")
    val meta = mapHdr(5) ++
      encStr("node_count") ++ encUint(trie.nodes.length) ++
      encStr("record_size") ++ encUint(24) ++
      encStr("ip_version") ++ encUint(4) ++
      encStr("binary_format_major_version") ++ encUint(2) ++
      encStr("binary_format_minor_version") ++ encUint(0)
    val bytes = tree ++ Array.fill[Byte](16)(0) ++ recA ++ recB ++ marker ++ meta
    val f = java.nio.file.Files.createTempFile("test", ".mmdb")
    java.nio.file.Files.write(f, bytes)
    f
  }

  test("mmdb lookup decodes nested maps and uints") {
    val db = Mmdb.open(buildMmdb().toString)
    assert(db.ipVersion == 4 && db.recordSizeBits == 24)
    assert(db.lookup(ip("10.1.2.3")) ==
      Some(Map("country.iso_code" -> "AA", "asn" -> "64512")))
    assert(db.lookup(ip("192.168.77.1")) == Some(Map("country.iso_code" -> "BB")))
    assert(db.lookup(ip("8.8.8.8")).isEmpty)
  }

  test("ip_version 6 database: v4-mapped subtree descent") {
    // ::ffff:10.0.0.0/104 — 80 zero bits, 16 one bits, then 10/8
    val rec = mapHdr(1) ++ encStr("cc") ++ encStr("XX")
    val trie = new TrieWriter
    val mapped = Seq.fill(80)(0) ++ Seq.fill(16)(1) ++
      (0 until 8).map(i => ((ip("10.0.0.0") >>> (31 - i)) & 1L).toInt)
    trie.insertBits(mapped, 0)
    val tree = trie.serialize()
    val marker = Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
      "MaxMind.com".getBytes("US-ASCII")
    val meta = mapHdr(5) ++
      encStr("node_count") ++ encUint(trie.nodes.length) ++
      encStr("record_size") ++ encUint(24) ++
      encStr("ip_version") ++ encUint(6) ++
      encStr("binary_format_major_version") ++ encUint(2) ++
      encStr("binary_format_minor_version") ++ encUint(0)
    val f = java.nio.file.Files.createTempFile("test6", ".mmdb")
    java.nio.file.Files.write(f,
      tree ++ Array.fill[Byte](16)(0) ++ rec ++ marker ++ meta)
    val db = Mmdb.open(f.toString)
    assert(db.ipVersion == 6)
    assert(db.lookup(ip("10.9.9.9")) == Some(Map("cc" -> "XX")))
    assert(db.lookup(ip("11.0.0.1")).isEmpty)
    val nets = db.networks()
    assert(nets.map(n => (n._1, n._2)) == Seq((ip("10.0.0.0"), 8)))
  }

  private def v6bits(addr: String, prefixLen: Int): Seq[Int] = {
    // Java returns Inet4Address (4 bytes) for v4-mapped literals; lift
    val b0 = java.net.InetAddress.getByName(addr).getAddress
    val b = if (b0.length == 16) b0 else {
      val m = new Array[Byte](16)
      m(10) = -1; m(11) = -1
      System.arraycopy(b0, 0, m, 12, 4)
      m
    }
    (0 until prefixLen).map(i => (b(i >> 3) >> (7 - (i & 7))) & 1)
  }

  private def buildMmdbV6(): java.nio.file.Path = {
    val recA = mapHdr(1) ++ encStr("cc") ++ encStr("V6A")
    val recB = mapHdr(1) ++ encStr("cc") ++ encStr("V6B")
    val recM = mapHdr(1) ++ encStr("cc") ++ encStr("XX")
    val trie = new TrieWriter
    trie.insertBits(v6bits("2001:db8::", 32), 0)
    trie.insertBits(v6bits("2620:1::", 48), recA.length)
    trie.insertBits(v6bits("::ffff:10.0.0.0", 104), recA.length + recB.length)
    val marker = Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
      "MaxMind.com".getBytes("US-ASCII")
    val meta = mapHdr(5) ++
      encStr("node_count") ++ encUint(trie.nodes.length) ++
      encStr("record_size") ++ encUint(24) ++
      encStr("ip_version") ++ encUint(6) ++
      encStr("binary_format_major_version") ++ encUint(2) ++
      encStr("binary_format_minor_version") ++ encUint(0)
    val f = java.nio.file.Files.createTempFile("test6n", ".mmdb")
    java.nio.file.Files.write(f, trie.serialize() ++ Array.fill[Byte](16)(0) ++
      recA ++ recB ++ recM ++ marker ++ meta)
    f
  }

  test("native IPv6 networks: enumeration, lookup6, and full-width ranges") {
    val db = Mmdb.open(buildMmdbV6().toString)
    val nets = db.networksV6().map(n => (n._1, n._2, n._3, n._4("cc"))).toSet
    // 2001:db8::/32 -> hi = 0x20010db8_00000000
    assert(nets == Set(
      (0x20010db800000000L, 0L, 32, "V6A"),
      (0x2620000100000000L, 0L, 48, "V6B"),
      (0x0000000000000000L, 0x0000ffff0a000000L, 104, "XX")))
    assert(db.lookup6(java.net.InetAddress.getByName("2001:db8::1").getAddress)
      == Some(Map("cc" -> "V6A")))
    assert(db.lookup6(java.net.InetAddress.getByName("2620:1:0:5::9").getAddress)
      == Some(Map("cc" -> "V6B")))
    assert(db.lookup6(java.net.InetAddress.getByName("2620:2::1").getAddress).isEmpty)
    // the v4-mapped subtree answers both spellings
    assert(db.lookup6(java.net.InetAddress.getByName("::ffff:10.1.2.3").getAddress)
      == Some(Map("cc" -> "XX")))
    assert(db.lookup(ip("10.1.2.3")) == Some(Map("cc" -> "XX")))
  }

  test("ipv6 range table + prefix equi-join enrichment") {
    val path = buildMmdbV6().toString
    val ranges = Mmdb.toRangeTableV6(spark, path, Seq("cc"))
    assert(ranges.count() == 3)
    // 2001:db8::/32 upper bound: 2001:db8:ffff:...:ffff
    val r = ranges.filter(col("lo_hi") === 0x20010db800000000L).head
    assert(r.getLong(2) == 0x20010db8ffffffffL && r.getLong(3) == -1L)
    val df = Seq(
      "2001:db8::42",                // inside /32
      "2001:db9::1",                 // just outside
      "2620:1:0:1::2",               // inside /48
      "::ffff:10.0.0.7",             // v4-mapped spelled as v6
      "10.200.0.1",                  // v4 literal lifted to v4-mapped
      "not-an-ip"
    ).toDF("ipstr")
    val out = Enrich.ip6RangeLookup(df, ranges, col("ipstr"))
      .select("ipstr", "cc")
      .collect().map(row => row.getString(0) -> row.getString(1)).toMap
    assert(out == Map(
      "2001:db8::42" -> "V6A", "2001:db9::1" -> null,
      "2620:1:0:1::2" -> "V6B", "::ffff:10.0.0.7" -> "XX",
      "10.200.0.1" -> "XX", "not-an-ip" -> null))
    // plan shape: broadcast hash join, no nested-loop between-join
    val plan = Enrich.ip6RangeLookup(df, ranges, col("ipstr"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("mmdb networks export as a broadcast range table for geoip2()") {
    val path = buildMmdb().toString
    val ranges = Mmdb.toRangeTable(spark, path,
      Seq("country.iso_code", "asn"))
    assert(ranges.count() == 2)
    val df = Seq("10.9.9.9", "192.168.0.1", "1.1.1.1").toDF("ipstr")
    val out = Enrich.ipRangeLookup(df, ranges, col("ipstr"))
      .select("ipstr", "country_iso_code")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("10.9.9.9" -> "AA", "192.168.0.1" -> "BB", "1.1.1.1" -> null))
  }
}
