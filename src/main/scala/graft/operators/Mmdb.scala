package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal MaxMind DB (.mmdb) reader, implemented from the public
  * "MaxMind DB File Format Specification 2.0" — the file format behind
  * geoip2() (`/root/reference/modules/geoip2/geoip-parser.c:56-70` uses
  * libmaxminddb; this is a clean-room reader of the same format).
  *
  * Scope: enough to turn a .mmdb into the engine's broadcast range
  * table — enumerate every network in the search tree, decode its data
  * record into flat string pairs, and hand the ranges to
  * [[Enrich.ipRangeLookup]] (the /16-prefix equi-join). Lookup of a
  * single IP is provided for tests/driver use. IPv4 databases (or the
  * IPv4-mapped subtree of IPv6 databases) export as uint32 ranges.
  */
object Mmdb {

  private val MetadataMarker: Array[Byte] =
    Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++ "MaxMind.com".getBytes("US-ASCII")

  final case class Database(bytes: Array[Byte], nodeCount: Int,
      recordSizeBits: Int, ipVersion: Int, dataSectionStart: Int) {

    private val nodeBytes = recordSizeBits * 2 / 8

    /** One record of node `n` (side 0 = left/bit 0, 1 = right/bit 1).
      * Returned as Long: with record_size 32 the spec allows values up
      * to 2^32-1, which would go negative as Int and silently corrupt
      * the node/nodeCount comparisons below. */
    def record(n: Long, side: Int): Long = {
      val base = (n * nodeBytes).toInt
      def b(o: Int): Long = bytes(o) & 0xFFL
      recordSizeBits match {
        case 24 =>
          val o = base + side * 3
          (b(o) << 16) | (b(o + 1) << 8) | b(o + 2)
        case 28 =>
          // middle byte holds the high nibbles of both records
          val mid = b(base + 3)
          if (side == 0)
            ((mid >> 4) << 24) | (b(base) << 16) | (b(base + 1) << 8) | b(base + 2)
          else
            ((mid & 0xF) << 24) | (b(base + 4) << 16) | (b(base + 5) << 8) | b(base + 6)
        case 32 =>
          val o = base + side * 4
          (b(o) << 24) | (b(o + 1) << 16) | (b(o + 2) << 8) | b(o + 3)
        case other => throw new IllegalArgumentException(s"record_size $other")
      }
    }

    /** Decode the data record a search-tree pointer refers to. */
    def dataAt(treePointer: Long): Any = {
      val off = (dataSectionStart + (treePointer - nodeCount - 16)).toInt
      new Decoder(bytes, dataSectionStart).decode(off)._1
    }

    /** Depth-first enumeration of every IPv4 network: (bitPrefix, depth,
      * decoded data). `bitPrefix` holds the prefix bits left-aligned in
      * the low 32 bits. The walk starts AFTER the v6 v4-mapped descent
      * (see [[startNode]]), so the remaining meaningful depth is always
      * 32 regardless of database ip_version. */
    def networks(): Seq[(Long, Int, Map[String, String])] = {
      val out = Seq.newBuilder[(Long, Int, Map[String, String])]
      val maxDepth = 32
      def walk(node: Long, prefix: Long, depth: Int): Unit = {
        if (node >= nodeCount) {
          if (node > nodeCount)
            out += ((prefix, depth, flatten(dataAt(node))))
          // node == nodeCount: empty branch
        } else if (depth >= maxDepth) ()
        else {
          walk(record(node, 0), prefix, depth + 1)
          walk(record(node, 1), prefix | (1L << (maxDepth - 1 - depth)), depth + 1)
        }
      }
      walk(startNode(), 0L, 0)
      out.result()
    }

    /** For IPv6 databases, descend to the ::ffff:0:0/96 IPv4-mapped
      * subtree start; v4 databases start at the root. */
    private def startNode(): Long = {
      var node = 0L
      if (ipVersion == 6) {
        var i = 0
        while (i < 96 && node < nodeCount) {
          // ::ffff:0:0/96 — bits 80..95 set, the rest zero
          val bit = if (i >= 80) 1 else 0
          node = record(node, bit)
          i += 1
        }
      }
      node
    }

    /** Single IPv4 lookup (tests / driver-side probes). */
    def lookup(ipv4: Long): Option[Map[String, String]] = {
      var node: Long = startNode()
      var depth = 0
      while (node < nodeCount && depth < 32) {
        val bit = ((ipv4 >> (31 - depth)) & 1L).toInt
        node = record(node, bit)
        depth += 1
      }
      if (node > nodeCount) Some(flatten(dataAt(node))) else None
    }

    /** Full-width enumeration of an IPv6 database: every network as
      * (prefixHi, prefixLo, depth, data), prefix bits left-aligned
      * across the two longs (bits 0..63 in `hi`, 64..127 in `lo` of the
      * 128-bit address). Covers the NATIVE v6 space the reference's
      * libmaxminddb path serves (geoip-parser.c:56-70) — including the
      * ::ffff:0:0/96 v4-mapped subtree, which [[networks]] exports
      * separately as uint32 ranges. */
    def networksV6(): Seq[(Long, Long, Int, Map[String, String])] = {
      require(ipVersion == 6, s"networksV6 on ip_version $ipVersion database")
      val out = Seq.newBuilder[(Long, Long, Int, Map[String, String])]
      def walk(node: Long, pHi: Long, pLo: Long, depth: Int): Unit = {
        if (node >= nodeCount) {
          if (node > nodeCount) out += ((pHi, pLo, depth, flatten(dataAt(node))))
        } else if (depth >= 128) ()
        else {
          val (oneHi, oneLo) =
            if (depth < 64) (pHi | (1L << (63 - depth)), pLo)
            else (pHi, pLo | (1L << (127 - depth)))
          walk(record(node, 0), pHi, pLo, depth + 1)
          walk(record(node, 1), oneHi, oneLo, depth + 1)
        }
      }
      walk(0L, 0L, 0L, 0)
      out.result()
    }

    /** Single IPv6 lookup from a 16-byte address (tests / driver-side
      * probes); 4-byte input is lifted to its ::ffff:0:0/96 v4-mapped
      * form, as libmaxminddb does for v4 probes of v6 databases. v4
      * databases cannot serve v6 probes (spec). */
    def lookup6(addr0: Array[Byte]): Option[Map[String, String]] = {
      require(addr0.length == 16 || addr0.length == 4,
        "lookup6 needs a 16- or 4-byte address")
      if (ipVersion != 6) return None
      val addr = if (addr0.length == 16) addr0 else {
        val m = new Array[Byte](16)
        m(10) = -1; m(11) = -1
        System.arraycopy(addr0, 0, m, 12, 4)
        m
      }
      var node = 0L
      var depth = 0
      while (node < nodeCount && depth < 128) {
        val bit = (addr(depth >> 3) >> (7 - (depth & 7))) & 1
        node = record(node, bit)
        depth += 1
      }
      if (node > nodeCount) Some(flatten(dataAt(node))) else None
    }
  }

  /** Decode one data field at `off`; returns (value, nextOffset). */
  private final class Decoder(bytes: Array[Byte], sectionStart: Int) {
    def decode(off: Int): (Any, Int) = {
      val ctrl = bytes(off) & 0xFF
      var tpe = ctrl >> 5
      var i = off + 1
      if (tpe == 0) { tpe = (bytes(i) & 0xFF) + 7; i += 1 } // extended type
      if (tpe == 1) {
        // pointer: size bits 3-4 select width, bits 0-2 join the payload
        val ss = (ctrl >> 3) & 0x3
        val v = ctrl & 0x7
        val (target, next) = ss match {
          case 0 => ((v << 8) | (bytes(i) & 0xFF), i + 1)
          case 1 => (((v << 16) | ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)) + 2048, i + 2)
          case 2 => (((v << 24) | ((bytes(i) & 0xFF) << 16) | ((bytes(i + 1) & 0xFF) << 8)
            | (bytes(i + 2) & 0xFF)) + 526336, i + 3)
          case _ => (((bytes(i) & 0xFF) << 24) | ((bytes(i + 1) & 0xFF) << 16)
            | ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF), i + 4)
        }
        return (decode(sectionStart + target)._1, next)
      }
      var size = ctrl & 0x1F
      if (size == 29) { size = 29 + (bytes(i) & 0xFF); i += 1 }
      else if (size == 30) {
        size = 285 + ((bytes(i) & 0xFF) << 8) + (bytes(i + 1) & 0xFF); i += 2
      } else if (size == 31) {
        size = 65821 + ((bytes(i) & 0xFF) << 16) + ((bytes(i + 1) & 0xFF) << 8) +
          (bytes(i + 2) & 0xFF); i += 3
      }
      tpe match {
        case 2 => (new String(bytes, i, size, "UTF-8"), i + size)
        case 3 =>
          (java.lang.Double.longBitsToDouble(beLong(i, 8)), i + 8)
        case 4 => (java.util.Arrays.copyOfRange(bytes, i, i + size), i + size)
        case 5 | 6 | 9 => (beLong(i, size), i + size)
        case 8 => // int32, size may be < 4
          (beLong(i, size).toInt, i + size)
        case 7 =>
          var m = Map.empty[String, Any]
          var o = i
          var k = 0
          while (k < size) {
            val (key, o2) = decode(o)
            val (v, o3) = decode(o2)
            m += key.asInstanceOf[String] -> v
            o = o3
            k += 1
          }
          (m, o)
        case 11 =>
          var xs = List.empty[Any]
          var o = i
          var k = 0
          while (k < size) {
            val (v, o2) = decode(o); xs ::= v; o = o2; k += 1
          }
          (xs.reverse, o)
        case 10 => (BigInt(1, java.util.Arrays.copyOfRange(bytes, i, i + size)), i + size)
        case 14 => (size != 0, i)
        case 15 => (java.lang.Float.intBitsToFloat(beLong(i, 4).toInt), i + 4)
        case other => throw new IllegalArgumentException(s"mmdb type $other")
      }
    }

    private def beLong(off: Int, n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 8) | (bytes(off + k) & 0xFF); k += 1 }
      v
    }
  }

  /** Flatten a decoded data record to string pairs with dotted paths
    * (`country.iso_code` → value), the shape geoip2()'s prefix()d NV
    * output takes. */
  private def flatten(v: Any, prefix: String = ""): Map[String, String] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].flatMap { case (k, x) =>
      flatten(x, if (prefix.isEmpty) k else s"$prefix.$k")
    }
    case xs: List[_] => xs.zipWithIndex.flatMap { case (x, idx) =>
      flatten(x, s"$prefix.$idx")
    }.toMap
    // numeric rendering follows maxminddb-helper.c:73-94: doubles and
    // floats print "%f" (6 decimals) — location.latitude is "51.750000"
    case d: Double => Map(prefix -> f"$d%f")
    case f: Float => Map(prefix -> f"${f.toDouble}%f")
    case other => Map(prefix -> other.toString)
  }

  def open(path: String): Database = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // metadata marker is searched from the END (spec: last occurrence)
    var mark = -1
    var i = bytes.length - MetadataMarker.length
    while (mark < 0 && i >= 0) {
      var j = 0
      while (j < MetadataMarker.length && bytes(i + j) == MetadataMarker(j)) j += 1
      if (j == MetadataMarker.length) mark = i else i -= 1
    }
    require(mark >= 0, s"$path: no MaxMind.com metadata marker")
    val meta = new Decoder(bytes, mark + MetadataMarker.length)
      .decode(mark + MetadataMarker.length)._1.asInstanceOf[Map[String, Any]]
    val nodeCount = meta("node_count").asInstanceOf[Long].toInt
    val recordSize = meta("record_size").asInstanceOf[Long].toInt
    val ipVersion = meta("ip_version").asInstanceOf[Long].toInt
    val treeSize = nodeCount * recordSize * 2 / 8
    Database(bytes, nodeCount, recordSize, ipVersion, treeSize + 16)
  }

  /** Export the database's IPv4 networks as the (lo, hi, field...) range
    * table [[Enrich.ipRangeLookup]] broadcasts (dotted field paths
    * become underscore column names). Database files are config-scale;
    * the exported table is broadcast, exactly like the CSV range form. */
  def toRangeTable(spark: SparkSession, path: String,
      fields: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val db = open(path)
    val rows = db.networks().map { case (prefix, depth, data) =>
      val lo = prefix & 0xFFFFFFFFL
      val hi = lo | (if (depth >= 32) 0L else (1L << (32 - depth)) - 1)
      Row.fromSeq(Seq(lo, hi) ++ fields.map(f => data.getOrElse(f, null)))
    }
    val schema = StructType(
      StructField("lo", LongType) :: StructField("hi", LongType) ::
        fields.map(f => StructField(f.replace('.', '_'), StringType)).toList)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), schema)
  }

  /** Export an IPv6 database's networks as the 128-bit range table
    * [[Enrich.ip6RangeLookup]] broadcasts: each network as an inclusive
    * [lo, hi] u128 range split into (lo_hi, lo_lo, hi_hi, hi_lo) longs
    * (unsigned bit patterns — the join biases them for ordering). */
  def toRangeTableV6(spark: SparkSession, path: String,
      fields: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val db = open(path)
    val rows = db.networksV6().map { case (pHi, pLo, depth, data) =>
      val (hiHi, hiLo) =
        if (depth <= 64)
          (pHi | (if (depth == 64) 0L else -1L >>> depth), -1L)
        else
          (pHi, pLo | (-1L >>> (depth - 64)))
      Row.fromSeq(Seq(pHi, pLo, hiHi, hiLo) ++ fields.map(f => data.getOrElse(f, null)))
    }
    val schema = StructType(
      StructField("lo_hi", LongType) :: StructField("lo_lo", LongType) ::
        StructField("hi_hi", LongType) :: StructField("hi_lo", LongType) ::
        fields.map(f => StructField(f.replace('.', '_'), StringType)).toList)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), schema)
  }
}
