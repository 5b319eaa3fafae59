package graft.streaming

import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.col

/** Dev-mode MQTT 3.1.1 publisher — the `mqtt()` destination of
  * `/root/reference/modules/mqtt/destination/mqtt-destination.c`
  * (address `tcp://host:port` default localhost:1883, templated
  * `topic()`, `fallback-topic()`, `qos()`, keepalive) with the wire
  * format hand-rolled instead of linking a client library: CONNECT
  * (protocol "MQTT" level 4, clean-session) once per connection, one
  * QoS-0 PUBLISH per message. QoS 1/2 need the broker's acknowledgment
  * stream; like the other dev sinks this is the write side only, so
  * qos > 0 is rejected loudly rather than silently downgraded. */
object MqttSink {

  final case class Config(
      host: String = "localhost",
      port: Int = 1883,
      clientId: String = "graft",
      keepalive: Int = 60,
      qos: Int = 0,
      connectTimeoutMs: Int = 10000) {
    require(qos == 0, "mqtt(): only qos(0) is supported by the dev publisher")
  }

  /** `tcp://host:port` (mqtt-destination.c DEFAULT_ADDRESS). */
  def parseAddress(addr: String): (String, Int) = {
    val stripped = addr.stripPrefix("tcp://")
    stripped.split(":", 2) match {
      case Array(h, p) => (h, p.toInt)
      case Array(h) => (h, 1883)
    }
  }

  /** MQTT variable-length "remaining length" (7 bits per byte,
    * continuation MSB). */
  private[graft] def remainingLength(n: Int): Array[Byte] = {
    require(n >= 0 && n <= 268435455, s"mqtt remaining length out of range: $n")
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var x = n
    do {
      var d = x % 128
      x /= 128
      if (x > 0) d |= 0x80
      out += d.toByte
    } while (x > 0)
    out.toArray
  }

  private def utf(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    require(b.length <= 65535, "mqtt string too long")
    Array[Byte]((b.length >> 8).toByte, b.length.toByte) ++ b
  }

  /** CONNECT: fixed header 0x10, variable header "MQTT" level 4 +
    * clean-session flags + keepalive, payload = client id. */
  private[streaming] def connectPacket(cfg: Config): Array[Byte] = {
    val vh = utf("MQTT") ++ Array[Byte](0x04, 0x02,
      (cfg.keepalive >> 8).toByte, cfg.keepalive.toByte)
    val payload = utf(cfg.clientId)
    Array[Byte](0x10) ++ remainingLength(vh.length + payload.length) ++ vh ++ payload
  }

  /** QoS-0 PUBLISH: fixed header 0x30, topic, payload. */
  private[streaming] def publishPacket(topic: String, payload: Array[Byte]): Array[Byte] = {
    val t = utf(topic)
    Array[Byte](0x30) ++ remainingLength(t.length + payload.length) ++ t ++ payload
  }

  private[streaming] def sendPartition(cfg: Config,
      msgs: Iterator[(String, String)]): Unit = {
    if (!msgs.hasNext) return
    val s = new Socket()
    s.connect(new InetSocketAddress(cfg.host, cfg.port), cfg.connectTimeoutMs)
    try {
      val out = s.getOutputStream
      out.write(connectPacket(cfg))
      msgs.foreach { case (topic, body) =>
        out.write(publishPacket(topic, body.getBytes(StandardCharsets.UTF_8)))
      }
      out.flush()
    } finally s.close()
  }

  def writeBatch(df: DataFrame, topicCol: String, bodyCol: String,
      cfg: Config): Unit =
    df.select(col(topicCol).cast("string"), col(bodyCol).cast("string"))
      .foreachPartition { (rows: Iterator[Row]) =>
        sendPartition(cfg, rows.map(r => (r.getString(0), r.getString(1))))
      }

  def sink(ds: Dataset[Row], topicCol: String, bodyCol: String, cfg: Config,
      checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        writeBatch(batch.toDF(), topicCol, bodyCol, cfg)
      }
}
