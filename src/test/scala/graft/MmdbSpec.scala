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
