package graft.streaming

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Dev-mode amqp() destination — `/root/reference/modules/afamqp/
  * afamqp.c` re-expressed without librabbitmq: AMQP 0-9-1 is a public
  * wire spec and the publish path needs only a handful of methods
  * (Connection.Start/Tune/Open, Channel.Open, Basic.Publish + content
  * header/body frames).
  *
  * Reference semantics kept (afamqp_dd_new defaults, afamqp.c:779-822):
  * vhost `/`, host 127.0.0.1, port 5672, exchange `syslog`, type
  * `fanout`, `persistent(yes)` → delivery-mode 2, routing-key
  * template default empty, body template default empty, SASL PLAIN
  * auth (`auth-method(plain)`), and the value-pairs rendering lands in
  * the `headers` field table with `content-type: text/plain`
  * (`afamqp_worker_publish` props, afamqp.c:617-652). Like the
  * reference the publish is fire-and-forget on channel 1; socket
  * errors fail the micro-batch for replay (at-least-once).
  */
object AmqpSink {

  final case class Config(
      host: String = "127.0.0.1",
      port: Int = 5672,
      vhost: String = "/",
      exchange: String = "syslog",
      username: String = "guest",
      password: String = "guest",
      persistent: Boolean = true,
      connectTimeoutMs: Int = 10000)

  // ---- 0-9-1 primitives ----------------------------------------------

  private def u16(n: Int): Array[Byte] = Array[Byte]((n >> 8).toByte, n.toByte)
  private def u32(n: Long): Array[Byte] =
    Array[Byte]((n >> 24).toByte, (n >> 16).toByte, (n >> 8).toByte, n.toByte)
  private def u64(n: Long): Array[Byte] = u32(n >> 32) ++ u32(n & 0xffffffffL)

  private def shortstr(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    require(b.length < 256, s"amqp shortstr too long: ${b.length}")
    b.length.toByte +: b
  }

  private def longstr(b: Array[Byte]): Array[Byte] = u32(b.length) ++ b
  private def longstr(s: String): Array[Byte] =
    longstr(s.getBytes(StandardCharsets.UTF_8))

  /** Field table of string values ('S' longstr), the shape
    * `_amqp_vp_foreach` builds (afamqp.c:595-607). */
  private[graft] def fieldTable(entries: Seq[(String, String)]): Array[Byte] = {
    val body = entries.flatMap { case (k, v) =>
      shortstr(k) ++ Array[Byte]('S') ++ longstr(v)
    }.toArray
    u32(body.length) ++ body
  }

  private def frame(tpe: Int, channel: Int, payload: Array[Byte]): Array[Byte] =
    tpe.toByte +: (u16(channel) ++ u32(payload.length) ++ payload :+ 0xce.toByte)

  private def method(channel: Int, classId: Int, methodId: Int,
      args: Array[Byte]): Array[Byte] =
    frame(1, channel, u16(classId) ++ u16(methodId) ++ args)

  // ---- handshake -----------------------------------------------------

  private def readFrame(in: DataInputStream): (Int, Int, Array[Byte]) = {
    val tpe = in.readUnsignedByte()
    val channel = in.readUnsignedShort()
    val size = in.readInt()
    val payload = new Array[Byte](size)
    in.readFully(payload)
    require(in.readUnsignedByte() == 0xce, "amqp frame-end missing")
    (tpe, channel, payload)
  }

  private def expectMethod(in: DataInputStream, classId: Int, methodId: Int): Array[Byte] = {
    val (tpe, _, payload) = readFrame(in)
    require(tpe == 1, s"expected method frame, got type $tpe")
    val c = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
    val m = ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
    require(c == classId && m == methodId, s"expected $classId.$methodId, got $c.$m")
    payload.drop(4)
  }

  private def handshake(cfg: Config, in: DataInputStream, out: DataOutputStream): Unit = {
    out.write(Array[Byte]('A', 'M', 'Q', 'P', 0, 0, 9, 1))
    out.flush()
    expectMethod(in, 10, 10)                       // Connection.Start
    val plain = ("\u0000" + cfg.username + "\u0000" + cfg.password)
      .getBytes(StandardCharsets.UTF_8)
    out.write(method(0, 10, 11,                    // Connection.StartOk
      fieldTable(Seq("product" -> "graft")) ++ shortstr("PLAIN") ++
        longstr(plain) ++ shortstr("en_US")))
    out.flush()
    val tune = expectMethod(in, 10, 30)            // Connection.Tune
    out.write(method(0, 10, 31, tune))             // TuneOk echoes limits
    out.write(method(0, 10, 40,                    // Connection.Open
      shortstr(cfg.vhost) ++ shortstr("") ++ Array[Byte](0)))
    out.flush()
    expectMethod(in, 10, 41)                       // Connection.OpenOk
    out.write(method(1, 20, 10, shortstr("")))     // Channel.Open
    out.flush()
    expectMethod(in, 20, 11)                       // Channel.OpenOk
  }

  /** Basic.Publish + content header (content-type, headers table,
    * delivery-mode — property flags 0x8000|0x2000|0x1000) + one body
    * frame. */
  private[graft] def publishFrames(cfg: Config, routingKey: String,
      headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
    val pub = method(1, 60, 40, u16(0) ++ shortstr(cfg.exchange) ++
      shortstr(routingKey) ++ Array[Byte](0))
    val props = shortstr("text/plain") ++ fieldTable(headers) ++
      Array[Byte](if (cfg.persistent) 2 else 1)
    val header = frame(2, 1, u16(60) ++ u16(0) ++ u64(body.length) ++
      u16(0x8000 | 0x2000 | 0x1000) ++ props)
    pub ++ header ++ frame(3, 1, body)
  }

  private[graft] def sendPartition(cfg: Config,
      msgs: Iterator[(String, Seq[(String, String)], String)]): Unit = {
    if (!msgs.hasNext) return
    val s = new Socket()
    s.connect(new InetSocketAddress(cfg.host, cfg.port), cfg.connectTimeoutMs)
    try {
      s.setSoTimeout(cfg.connectTimeoutMs)
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      handshake(cfg, in, out)
      msgs.foreach { case (rk, headers, body) =>
        out.write(publishFrames(cfg, rk, headers,
          body.getBytes(StandardCharsets.UTF_8)))
      }
      out.flush()
    } finally s.close()
  }

  /** Row contract: `__rk string, __headers map<string,string>,
    * __body string` (rendered by the config compiler). */
  def writeBatch(df: DataFrame, cfg: Config): Unit =
    df.select("__rk", "__headers", "__body")
      .foreachPartition { (rows: Iterator[Row]) =>
        sendPartition(cfg, rows.map(r => (
          if (r.isNullAt(0)) "" else r.getString(0),
          if (r.isNullAt(1)) Nil
          else r.getMap[String, String](1).toSeq.sortBy(_._1),
          if (r.isNullAt(2)) "" else r.getString(2))))
      }

  def sink(ds: Dataset[Row], cfg: Config, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        writeBatch(batch.toDF(), cfg)
      }
}
