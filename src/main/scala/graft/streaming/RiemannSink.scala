package graft.streaming

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Dev-mode riemann() destination — `/root/reference/modules/riemann/`
  * (`riemann.c`, `riemann-worker.c`) re-expressed without linking
  * riemann-client: the Riemann protocol is protobuf `Msg{events}` frames
  * over TCP with a 4-byte network-order length prefix, and the schema is
  * small enough to hand-encode (proto2 `Event`/`Attribute`/`Msg`, public
  * protocol — field numbers below).
  *
  * Reference semantics kept:
  *  - defaults server 127.0.0.1, port 5555 (riemann.c:262-264);
  *    field defaults host=`${HOST}`, service=`${PROGRAM}`,
  *    event-time=`${UNIXTIME}` in seconds (riemann.c:269-284);
  *  - `state/description/metric/ttl` only sent when configured
  *    (riemann-worker.c `_worker_insert_one`);
  *  - tags = configured `tags()` list, else the message's own tags
  *    (riemann-worker.c:293-298);
  *  - metric type follows the rendered value: integral → sint64
  *    (field 13), else double (field 14) — the type-hint switch of
  *    `riemann_add_metric_to_event`; an unparsable metric or ttl drops
  *    the event like the reference returning FALSE;
  *  - `flush-lines` events batch into ONE `Msg` frame
  *    (riemann-worker.c `_flush`), and the server's `Msg{ok}` reply is
  *    read and checked per frame — not-ok fails the micro-batch so
  *    Structured Streaming replays it (at-least-once, like the
  *    reference's LTR_ERROR path).
  */
object RiemannSink {

  final case class Config(
      server: String = "127.0.0.1",
      port: Int = 5555,
      flushLines: Int = 100,
      timeMicros: Boolean = false,   // event-time-unit(microseconds)
      connectTimeoutMs: Int = 10000)

  /** One event, template-rendered (null Option fields omitted). */
  final case class Event(
      time: Long,
      state: Option[String],
      service: String,
      host: String,
      description: Option[String],
      tags: Seq[String],
      ttl: Option[Float],
      attributes: Seq[(String, String)],
      metric: Option[Either[Long, Double]])

  // ---- proto2 primitives ----------------------------------------------

  private[graft] def varint(n0: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(10)
    var n = n0
    do {
      val b = (n & 0x7f).toInt
      n = n >>> 7
      out.write(if (n != 0) b | 0x80 else b)
    } while (n != 0)
    out.toByteArray
  }

  private[graft] def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)

  private def key(field: Int, wire: Int): Array[Byte] = varint((field << 3) | wire)

  private def str(field: Int, s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    key(field, 2) ++ varint(b.length) ++ b
  }

  private def vint(field: Int, n: Long): Array[Byte] = key(field, 0) ++ varint(n)

  private def fixed32(field: Int, bits: Int): Array[Byte] =
    key(field, 5) ++ Array[Byte](bits.toByte, (bits >> 8).toByte,
      (bits >> 16).toByte, (bits >> 24).toByte)

  private def fixed64(field: Int, bits: Long): Array[Byte] =
    key(field, 1) ++ (0 until 8).map(i => (bits >> (8 * i)).toByte).toArray

  // ---- riemann schema (Event fields; Attribute key=1 value=2; Msg
  //      ok=2 events=6; Event time=1 state=2 service=3 host=4
  //      description=5 tags=7 ttl=8 attributes=9 metric_sint64=13
  //      metric_d=14 time_micros=16) --------------------------------------

  private[graft] def encodeEvent(e: Event, timeMicros: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream(128)
    out.write(vint(if (timeMicros) 16 else 1, e.time))
    e.state.foreach(s => out.write(str(2, s)))
    out.write(str(3, e.service))
    out.write(str(4, e.host))
    e.description.foreach(d => out.write(str(5, d)))
    e.tags.foreach(t => out.write(str(7, t)))
    e.ttl.foreach(t => out.write(fixed32(8, java.lang.Float.floatToIntBits(t))))
    e.attributes.foreach { case (k, v) =>
      val attr = str(1, k) ++ str(2, v)
      out.write(key(9, 2) ++ varint(attr.length) ++ attr)
    }
    e.metric.foreach {
      case Left(i) => out.write(vint(13, zigzag(i)))
      case Right(d) => out.write(fixed64(14, java.lang.Double.doubleToLongBits(d)))
    }
    out.toByteArray
  }

  private[graft] def encodeMsg(events: Seq[Event], timeMicros: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    events.foreach { e =>
      val b = encodeEvent(e, timeMicros)
      out.write(key(6, 2) ++ varint(b.length) ++ b)
    }
    out.toByteArray
  }

  /** Reply `Msg.ok` (field 2, varint bool); absent ok counts as false. */
  private[graft] def decodeReplyOk(b: Array[Byte]): Boolean = {
    var pos = 0
    def rv(): Long = {
      var shift = 0; var v = 0L
      while ({ val x = b(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift; shift += 7; (x & 0x80) != 0 }) ()
      v
    }
    var ok = false
    while (pos < b.length) {
      val k = rv()
      val field = (k >> 3).toInt
      (k & 7) match {
        case 0 => val v = rv(); if (field == 2) ok = v != 0
        case 2 => val len = rv().toInt; pos += len
        case 5 => pos += 4
        case 1 => pos += 8
        case w => throw new java.io.IOException(s"riemann reply wire type $w")
      }
    }
    ok
  }

  private[graft] def sendPartition(cfg: Config, events: Iterator[Event]): Unit = {
    if (!events.hasNext) return
    val s = new Socket()
    s.connect(new InetSocketAddress(cfg.server, cfg.port), cfg.connectTimeoutMs)
    try {
      s.setSoTimeout(cfg.connectTimeoutMs)
      val out = new DataOutputStream(s.getOutputStream)
      val in = new DataInputStream(s.getInputStream)
      events.grouped(math.max(1, cfg.flushLines)).foreach { batch =>
        val msg = encodeMsg(batch, cfg.timeMicros)
        out.writeInt(msg.length)
        out.write(msg)
        out.flush()
        val replyLen = in.readInt()
        val reply = new Array[Byte](replyLen)
        in.readFully(reply)
        if (!decodeReplyOk(reply))
          throw new java.io.IOException("riemann server replied ok=false")
      }
    } finally s.close()
  }

  /** Row layout contract: `__time long, __state string?, __service string,
    * __host string, __desc string?, __tags array<string>, __ttl string?,
    * __attrs map<string,string>?, __metric string?` — rendered by the
    * config compiler. Unparsable metric/ttl drops the event
    * (riemann-worker.c returning FALSE on type_cast failure). */
  private def rowEvent(r: Row): Option[Event] = {
    def optStr(i: Int): Option[String] =
      if (r.isNullAt(i) || r.getString(i).isEmpty) None else Some(r.getString(i))
    val metric: Option[Either[Long, Double]] = optStr(8) match {
      case None => None
      case Some(m) =>
        m.toLongOption.map(l => Some(Left(l)))
          .getOrElse(m.toDoubleOption.map(Right(_))) match {
          case Some(e) => Some(e)
          case None => return None
        }
    }
    val ttl = optStr(6) match {
      case None => None
      case Some(t) => t.toFloatOption match {
        case Some(f) => Some(f)
        case None => return None
      }
    }
    Some(Event(
      time = if (r.isNullAt(0)) 0L else r.getLong(0),
      state = optStr(1),
      service = if (r.isNullAt(2)) "" else r.getString(2),
      host = if (r.isNullAt(3)) "" else r.getString(3),
      description = optStr(4),
      tags = if (r.isNullAt(5)) Nil else r.getSeq[String](5),
      ttl = ttl,
      attributes = if (r.isNullAt(7)) Nil
        else r.getMap[String, String](7).toSeq.sortBy(_._1),
      metric = metric))
  }

  def writeBatch(df: DataFrame, cfg: Config): Unit =
    df.select("__time", "__state", "__service", "__host", "__desc",
        "__tags", "__ttl", "__attrs", "__metric")
      .foreachPartition { (rows: Iterator[Row]) =>
        sendPartition(cfg, rows.flatMap(rowEvent))
      }

  def sink(ds: Dataset[Row], cfg: Config, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        writeBatch(batch.toDF(), cfg)
      }
}
