package graft.streaming

import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** network()/syslog() DESTINATION — TCP egress
  * (`/root/reference/modules/afsocket/afinet-dest.c`): each rendered
  * message is written newline-delimited (network(), the reference's
  * `transport(tcp)` text protocol) or RFC6587 octet-counted
  * (syslog(), `lib/logproto/logproto-framed-client.c`: `LEN SP
  * payload`). `failover()` servers (`afinet-dest-failover.c`) are
  * tried in order: on connect/write failure the sender reconnects to
  * the NEXT address and re-sends the in-flight message — at-least-once
  * exactly like the reference's requeue-on-disconnect, with the
  * micro-batch checkpoint as the disk-buffer analog.
  *
  * One socket per partition per micro-batch; partitions send in
  * parallel. This is the relay pair of the EWMM formats: format-ewmm →
  * syslog() destination → [[TcpSource]] (octet-counted) → ewmm-parser
  * is a lossless hop (SclSpec/TcpSourceSpec e2e).
  */
object TcpSink {

  /** @param targets (host, port) list — head is the primary, the rest
    *                the failover() chain of afinet-dest-failover.c */
  final case class Config(
      targets: Seq[(String, Int)],
      octetCounted: Boolean = false,
      connectTimeoutMs: Int = 10000,
      retries: Int = 3,
      retryBackoffMs: Long = 100L)

  private def frame(cfg: Config, msg: String): Array[Byte] = {
    val payload = msg.getBytes(StandardCharsets.UTF_8)
    if (cfg.octetCounted) {
      val head = s"${payload.length} ".getBytes(StandardCharsets.UTF_8)
      val out = new Array[Byte](head.length + payload.length)
      System.arraycopy(head, 0, out, 0, head.length)
      System.arraycopy(payload, 0, out, head.length, payload.length)
      out
    } else {
      val out = new Array[Byte](payload.length + 1)
      System.arraycopy(payload, 0, out, 0, payload.length)
      out(payload.length) = '\n'
      out
    }
  }

  private def connect(cfg: Config, idx: Int): Socket = {
    val (host, port) = cfg.targets(idx % cfg.targets.size)
    val s = new Socket()
    s.connect(new InetSocketAddress(host, port), cfg.connectTimeoutMs)
    s
  }

  /** Send one partition's messages over one connection, failing over
    * across the target list; throws when every target refused
    * `retries`+1 times — failing the micro-batch for replay. */
  private[graft] def sendPartition(cfg: Config, msgs: Iterator[String]): Unit = {
    require(cfg.targets.nonEmpty, "tcp destination needs at least one target")
    var sock: Socket = null
    var idx = 0
    var attempt = 0
    try {
      msgs.foreach { m =>
        val bytes = frame(cfg, m)
        var sent = false
        while (!sent) {
          try {
            if (sock == null) sock = connect(cfg, idx)
            sock.getOutputStream.write(bytes)
            sent = true
          } catch {
            case e: java.io.IOException =>
              if (sock != null) { try sock.close() catch { case _: Throwable => () } }
              sock = null
              if (attempt >= cfg.retries * cfg.targets.size)
                throw new java.io.IOException(
                  s"tcp destination: all targets failed after $attempt attempts", e)
              attempt += 1
              idx += 1 // failover to the next server
              Thread.sleep(cfg.retryBackoffMs * (attempt / cfg.targets.size + 1))
          }
        }
      }
      if (sock != null) sock.getOutputStream.flush()
    } finally if (sock != null) {
      try sock.close() catch { case _: Throwable => () }
    }
  }

  /** Streaming form: render `bodyCol` per row, send per partition. */
  def tcpSink(ds: Dataset[Row], bodyCol: String, cfg: Config,
      checkpoint: String): DataStreamWriter[Row] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        writeBatch(batch.toDF(), bodyCol, cfg)
      }

  /** Batch form — also what each micro-batch runs. */
  def writeBatch(df: DataFrame, bodyCol: String, cfg: Config): Unit =
    df.select(col(bodyCol).cast("string")).foreachPartition {
      (rows: Iterator[Row]) => sendPartition(cfg, rows.map(_.getString(0)))
    }
}
