package graft.streaming

import java.io.{ByteArrayOutputStream, DataInputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Dev-mode mongodb() destination — `/root/reference/modules/afmongodb/
  * afmongodb.c` re-expressed without the mongo-c driver: documents go
  * over the public MongoDB wire protocol as OP_MSG (opcode 2013) insert
  * commands with hand-rolled BSON, and the `{ok: 1}` command reply is
  * checked per insert.
  *
  * Reference semantics kept:
  *  - defaults `uri("mongodb://127.0.0.1:27017/syslog")` and
  *    `collection("messages")` (afmongodb.c:40,324);
  *  - the document is the value-pairs rendering (strings), with the
  *    reference's leading-dot→underscore key transform
  *    (`_init_value_pairs_dot_to_underscore_transformation`,
  *    afmongodb.c:208-215 — MongoDB key names may not start with `.`);
  *  - `collection()` is templated per message
  *    (afmongodb_dd_set_collection); rows group by rendered collection
  *    per micro-batch partition;
  *  - a not-ok reply fails the micro-batch for replay (at-least-once,
  *    the WORKER_INSERT_RESULT_ERROR path of afmongodb-worker.c).
  */
object MongoSink {

  final case class Config(
      host: String = "127.0.0.1",
      port: Int = 27017,
      db: String = "syslog",
      flushLines: Int = 100,
      connectTimeoutMs: Int = 10000)

  /** `mongodb://host:port/db` (DEFAULT_URI afmongodb.c:40). Options
    * after `?` are connection tuning in the reference — ignored here. */
  def parseUri(uri: String): Config = {
    val rest = uri.stripPrefix("mongodb://")
    val (hostPort, db) = rest.split("/", 2) match {
      case Array(hp, d) => (hp, d.takeWhile(_ != '?'))
      case Array(hp) => (hp, "syslog")
    }
    val (h, p) = hostPort.split(":", 2) match {
      case Array(h0, p0) => (h0, p0.toInt)
      case Array(h0) => (h0, 27017)
    }
    Config(h, p, if (db.isEmpty) "syslog" else db)
  }

  // ---- BSON (strings, embedded docs, arrays — all the insert needs) ----

  private def cstring(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8) :+ 0.toByte

  private def int32(n: Int): Array[Byte] =
    Array[Byte](n.toByte, (n >> 8).toByte, (n >> 16).toByte, (n >> 24).toByte)

  private[graft] def bsonString(key: String, v: String): Array[Byte] = {
    val vb = v.getBytes(StandardCharsets.UTF_8)
    Array[Byte](0x02) ++ cstring(key) ++ int32(vb.length + 1) ++ vb :+ 0.toByte
  }

  private[graft] def bsonDoc(elements: Seq[Array[Byte]]): Array[Byte] = {
    val body = elements.flatten.toArray
    int32(body.length + 5) ++ body :+ 0.toByte
  }

  private def bsonEmbedded(tpe: Byte, key: String, doc: Array[Byte]): Array[Byte] =
    Array[Byte](tpe) ++ cstring(key) ++ doc

  /** One string-valued document, insertion-ordered. */
  private[graft] def document(pairs: Seq[(String, String)]): Array[Byte] =
    bsonDoc(pairs.map { case (k, v) => bsonString(k, v) })

  /** `{insert: coll, $db: db, documents: [...]}` command body. */
  private[graft] def insertCommand(cfg: Config, coll: String,
      docs: Seq[Array[Byte]]): Array[Byte] = {
    val arr = bsonDoc(docs.zipWithIndex.map { case (d, i) =>
      bsonEmbedded(0x03, i.toString, d) })
    bsonDoc(Seq(
      bsonString("insert", coll),
      bsonString("$db", cfg.db),
      bsonEmbedded(0x04, "documents", arr)))
  }

  /** OP_MSG framing: header + flagBits 0 + kind-0 body section. */
  private[graft] def opMsg(requestId: Int, body: Array[Byte]): Array[Byte] = {
    val len = 16 + 4 + 1 + body.length
    int32(len) ++ int32(requestId) ++ int32(0) ++ int32(2013) ++
      int32(0) ++ Array[Byte](0) ++ body
  }

  /** Find `ok` in the reply body doc (double 0x01 / int32 0x10 /
    * int64 0x12) and require 1. */
  private[graft] def replyOk(reply: Array[Byte]): Boolean = {
    // reply = OP_MSG after the 16-byte header: flags(4) kind(1) doc
    var pos = 5
    pos += 4 // doc length
    while (pos < reply.length - 1) {
      val tpe = reply(pos); pos += 1
      val keyStart = pos
      while (reply(pos) != 0) pos += 1
      val key = new String(reply, keyStart, pos - keyStart, StandardCharsets.UTF_8)
      pos += 1
      def i32 = (0 until 4).map(i => (reply(pos + i) & 0xffL) << (8 * i)).sum
      def i64 = (0 until 8).map(i => (reply(pos + i) & 0xffL) << (8 * i)).sum
      tpe match {
        case 0x01 =>
          if (key == "ok") return java.lang.Double.longBitsToDouble(i64) == 1.0
          pos += 8
        case 0x10 =>
          if (key == "ok") return i32 == 1L
          pos += 4
        case 0x12 =>
          if (key == "ok") return i64 == 1L
          pos += 8
        case 0x02 => pos += 4 + i32.toInt
        case 0x03 | 0x04 => pos += i32.toInt
        case 0x08 => pos += 1
        case 0x0a => ()
        case _ => return false // unknown element type: treat as failure
      }
    }
    false
  }

  private[graft] def sendPartition(cfg: Config,
      rows: Iterator[(String, Seq[(String, String)])]): Unit = {
    if (!rows.hasNext) return
    val s = new Socket()
    s.connect(new InetSocketAddress(cfg.host, cfg.port), cfg.connectTimeoutMs)
    try {
      s.setSoTimeout(cfg.connectTimeoutMs)
      val out = s.getOutputStream
      val in = new DataInputStream(s.getInputStream)
      var reqId = 1
      // group consecutive same-collection rows into one insert command
      val grouped = rows.grouped(math.max(1, cfg.flushLines))
      grouped.foreach { chunk =>
        chunk.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (coll, members) =>
          out.write(opMsg(reqId, insertCommand(cfg, coll,
            members.map(m => document(m._2)))))
          out.flush()
          reqId += 1
          val lenB = new Array[Byte](4)
          in.readFully(lenB)
          val total = (0 until 4).map(i => (lenB(i) & 0xff) << (8 * i)).sum
          val rest = new Array[Byte](total - 4)
          in.readFully(rest)
          if (!replyOk(rest.drop(12))) // skip reqId/respTo/opCode
            throw new java.io.IOException("mongodb insert reply not ok")
        }
      }
    } finally s.close()
  }

  /** Row contract: `__coll string, __doc map<string,string>` (rendered
    * by the config compiler); map entries sort by key for a
    * deterministic document order. */
  def writeBatch(df: DataFrame, cfg: Config): Unit =
    df.select("__coll", "__doc").foreachPartition { (rows: Iterator[Row]) =>
      sendPartition(cfg, rows.map(r => (
        r.getString(0),
        if (r.isNullAt(1)) Nil
        else r.getMap[String, String](1).toSeq.sortBy(_._1))))
    }

  def sink(ds: Dataset[Row], cfg: Config, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        writeBatch(batch.toDF(), cfg)
      }
}
