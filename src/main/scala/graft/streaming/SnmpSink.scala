package graft.streaming

import java.io.ByteArrayOutputStream
import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Dev-mode snmp() destination — `/root/reference/modules/afsnmp/
  * afsnmpdest.c` re-expressed without net-snmp: an SNMPv2c TRAP2 is a
  * small BER/ASN.1 structure over UDP (public SMI/SNMP spec), so the
  * PDU is hand-encoded.
  *
  * Reference semantics kept:
  *  - defaults version v2c, port 162, community "public"
  *    (afsnmpdest.c:754-756); v3 (USM auth/priv) is out of scope for
  *    the dev sink and rejected loudly;
  *  - `snmp-obj(oid type template)` triplets become varbinds in
  *    configuration order; `trap-obj(...)` is the same list with the
  *    snmpTrapOID.0 object (snmpdest_dd_set_trap_obj);
  *  - type set integer/timeticks/octetstring/counter32/ipaddress/
  *    objectid (snmp_obj_types, afsnmpdest.c:60-86);
  *  - the reference's `sanitize_fs` quirk: for the NUMERIC types
  *    (integer, timeticks, counter32 — codes 0/1/3) a rendered value
  *    with any non-digit is replaced by "0" with a warning
  *    (afsnmpdest.c:369-391); ipaddress/objectid pass through;
  *  - traps are unacknowledged fire-and-forget (SNMP_MSG_TRAP2), so
  *    the sink only fails on socket errors (→ micro-batch replay).
  */
object SnmpSink {

  final case class Config(
      host: String,
      port: Int = 162,
      community: String = "public")

  /** (oid, typeName, renderedValue) → varbind. */
  type Obj = (String, String, String)

  private val NumericTypes = Set("integer", "timeticks", "counter32")
  val ObjTypes: Set[String] = NumericTypes ++
    Set("octetstring", "ipaddress", "objectid")

  /** afsnmpdest.c sanitize_fs: numeric types must be all-digit else "0". */
  private[graft] def sanitize(tpe: String, v: String): String =
    if (NumericTypes.contains(tpe.toLowerCase) &&
        (v.isEmpty || !v.forall(c => c >= '0' && c <= '9'))) "0"
    else v

  // ---- BER ------------------------------------------------------------

  private def tlv(tag: Int, body: Array[Byte]): Array[Byte] = {
    val len =
      if (body.length < 128) Array[Byte](body.length.toByte)
      else {
        var n = body.length
        val digits = new scala.collection.mutable.ArrayBuffer[Byte]
        while (n > 0) { digits.prepend((n & 0xff).toByte); n >>= 8 }
        (0x80 | digits.length).toByte +: digits.toArray
      }
    tag.toByte +: (len ++ body)
  }

  private[graft] def berInt(v: Long, tag: Int = 0x02): Array[Byte] = {
    var bytes = List.empty[Byte]
    var n = v
    do { bytes = (n & 0xff).toByte :: bytes; n >>= 8 }
    while (n != 0 && n != -1)
    // two's complement sign: pad when the sign bit disagrees
    val padded =
      if (v >= 0 && (bytes.head & 0x80) != 0) 0.toByte :: bytes
      else if (v < 0 && (bytes.head & 0x80) == 0) 0xff.toByte :: bytes
      else bytes
    tlv(tag, padded.toArray)
  }

  /** Unsigned (Counter32 0x41 / TimeTicks 0x43 / Gauge): no sign bit
    * semantics, but still minimal with a zero pad when the top bit set. */
  private def berUnsigned(v: Long, tag: Int): Array[Byte] = {
    var bytes = List.empty[Byte]
    var n = v & 0xffffffffL
    do { bytes = (n & 0xff).toByte :: bytes; n >>= 8 }
    while (n != 0)
    val padded = if ((bytes.head & 0x80) != 0) 0.toByte :: bytes else bytes
    tlv(tag, padded.toArray)
  }

  private def berStr(s: String): Array[Byte] =
    tlv(0x04, s.getBytes(StandardCharsets.UTF_8))

  private[graft] def berOid(oid: String): Array[Byte] = {
    val arcs = oid.stripPrefix(".").split('.').filter(_.nonEmpty)
      .map(t => t.toLongOption.getOrElse(0L)) // invalid token → 0, like parse_oid_tokens
    require(arcs.length >= 2, s"snmp: oid needs at least two arcs: $oid")
    val out = new ByteArrayOutputStream()
    out.write((40 * arcs(0) + arcs(1)).toInt)
    arcs.drop(2).foreach { arc =>
      var started = false
      var shift = 56
      while (shift >= 0) {
        val part = ((arc >> shift) & 0x7f).toInt
        if (part != 0 || started || shift == 0) {
          out.write(if (shift > 0) part | 0x80 else part)
          started = true
        }
        shift -= 7
      }
    }
    tlv(0x06, out.toByteArray)
  }

  private def berIp(s: String): Array[Byte] = {
    val parts = s.split('.')
    val bytes =
      if (parts.length == 4 && parts.forall(p => p.toIntOption.exists(v => v >= 0 && v <= 255)))
        parts.map(_.toInt.toByte)
      else Array[Byte](0, 0, 0, 0)
    tlv(0x40, bytes)
  }

  private[graft] def varbind(o: Obj): Array[Byte] = {
    val (oid, tpe, value0) = o
    val value = sanitize(tpe, value0)
    val v = tpe.toLowerCase match {
      case "integer" => berInt(value.toLong)
      case "timeticks" => berUnsigned(value.toLong, 0x43)
      case "counter32" => berUnsigned(value.toLong, 0x41)
      case "octetstring" => berStr(value)
      case "ipaddress" => berIp(value)
      case "objectid" => berOid(value)
      case t => throw new IllegalArgumentException(s"snmp: unknown type $t")
    }
    tlv(0x30, berOid(oid) ++ v)
  }

  /** SNMPv2c trap message: SEQUENCE{version 1, community, TRAP2-PDU
    * [7]{request-id, error-status 0, error-index 0, SEQUENCE OF varbind}}. */
  private[graft] def trapPacket(cfg: Config, requestId: Int,
      objs: Seq[Obj]): Array[Byte] = {
    val varbinds = tlv(0x30, objs.flatMap(varbind).toArray)
    val pdu = tlv(0xa7, berInt(requestId) ++ berInt(0) ++ berInt(0) ++ varbinds)
    tlv(0x30, berInt(1) ++ berStr(cfg.community) ++ pdu)
  }

  private[graft] def sendPartition(cfg: Config,
      msgs: Iterator[Seq[Obj]]): Unit = {
    if (!msgs.hasNext) return
    val sock = new DatagramSocket()
    try {
      val addr = InetAddress.getByName(cfg.host)
      var reqId = 1
      msgs.foreach { objs =>
        val pkt = trapPacket(cfg, reqId, objs)
        sock.send(new DatagramPacket(pkt, pkt.length, addr, cfg.port))
        reqId += 1
      }
    } finally sock.close()
  }

  /** The `syslog-ng-ctl query get` / `stats` counter set for a
    * destination (written/processed/dropped/queued —
    * test_snmp_destination_reload_statistics.py asserts all four).
    * Traps are fire-and-forget UDP, so written tracks processed on
    * send success and nothing queues; a socket failure replays the
    * micro-batch without having counted it. */
  final class Stats {
    val processed = new java.util.concurrent.atomic.AtomicLong(0)
    val written = new java.util.concurrent.atomic.AtomicLong(0)
    def dropped: Long = 0L
    def queued: Long = 0L
    def asMap: Map[String, Long] = Map("written" -> written.get,
      "processed" -> processed.get, "dropped" -> dropped,
      "queued" -> queued)
  }

  private val statsRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, Stats]()

  /** Per-destination-name counters, surviving config reloads (the
    * reference keeps stats across reload — the reload-statistics test
    * expects counters to ACCUMULATE over the second generation). */
  def statsFor(destination: String): Stats =
    statsRegistry.computeIfAbsent(destination, _ => new Stats)

  /** Row contract: `__objs array<struct<oid:string,tpe:string,v:string>>`
    * (rendered by the config compiler, configuration order). */
  def writeBatch(df: DataFrame, cfg: Config, stats: Option[Stats] = None): Unit = {
    val n = stats.map(_ => df.count()).getOrElse(0L)
    stats.foreach(_.processed.addAndGet(n))
    df.select("__objs").foreachPartition { (rows: Iterator[Row]) =>
      sendPartition(cfg, rows.map(_.getSeq[Row](0).map(o =>
        (o.getString(0), o.getString(1), o.getString(2)))))
    }
    stats.foreach(_.written.addAndGet(n))
  }

  def sink(ds: Dataset[Row], cfg: Config, checkpoint: String,
      stats: Stats = null)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        writeBatch(batch.toDF(), cfg, Option(stats))
      }
}
