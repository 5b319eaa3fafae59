package graft

import graft.streaming.MongoSink

/** mongodb() destination: OP_MSG insert commands with hand-rolled BSON
  * (afmongodb semantics; the wire protocol is MongoDB's public spec). */
class MongoSpec extends GraftSuite {

  // ---- test-side BSON/OP_MSG decode -----------------------------------

  private def i32(b: Array[Byte], pos: Int): Int =
    (0 until 4).map(i => (b(pos + i) & 0xff) << (8 * i)).sum

  /** Decode a BSON doc at pos → (map of string/doc/array fields, endPos).
    * Arrays decode as Seq[Any]; embedded docs as Map[String, Any]. */
  private def decodeDoc(b: Array[Byte], pos0: Int): (Map[String, Any], Int) = {
    val len = i32(b, pos0)
    var pos = pos0 + 4
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    while (b(pos) != 0) {
      val tpe = b(pos); pos += 1
      val ks = pos
      while (b(pos) != 0) pos += 1
      val key = new String(b, ks, pos - ks, "UTF-8"); pos += 1
      tpe match {
        case 0x02 =>
          val slen = i32(b, pos); pos += 4
          out(key) = new String(b, pos, slen - 1, "UTF-8"); pos += slen
        case 0x03 =>
          val (m, e) = decodeDoc(b, pos); out(key) = m; pos = e
        case 0x04 =>
          val (m, e) = decodeDoc(b, pos); out(key) = m.values.toSeq; pos = e
        case 0x01 =>
          out(key) = java.lang.Double.longBitsToDouble(
            (0 until 8).map(i => (b(pos + i) & 0xffL) << (8 * i)).sum)
          pos += 8
        case t => fail(s"unexpected bson type $t for $key")
      }
    }
    (out.toMap, pos0 + len)
  }

  test("bson + op_msg encode round-trips through the decoder") {
    val doc = MongoSink.document(Seq("HOST" -> "h1", "MESSAGE" -> "m"))
    val (m, end) = decodeDoc(doc, 0)
    assert(m == Map("HOST" -> "h1", "MESSAGE" -> "m") && end == doc.length)
    val cmd = MongoSink.insertCommand(MongoSink.Config(db = "sys"), "messages",
      Seq(doc, MongoSink.document(Seq("k" -> "v"))))
    val (c, _) = decodeDoc(cmd, 0)
    assert(c("insert") == "messages" && c("$db") == "sys")
    val docs = c("documents").asInstanceOf[Seq[Any]]
    assert(docs.length == 2 &&
      docs(0) == Map("HOST" -> "h1", "MESSAGE" -> "m") &&
      docs(1) == Map("k" -> "v"))
  }

  test("parseUri: defaults and db extraction") {
    assert(MongoSink.parseUri("mongodb://127.0.0.1:27017/syslog") ==
      MongoSink.Config("127.0.0.1", 27017, "syslog"))
    assert(MongoSink.parseUri("mongodb://db.example.com/logs?w=1") ==
      MongoSink.Config("db.example.com", 27017, "logs"))
    assert(MongoSink.parseUri("mongodb://h:9999") ==
      MongoSink.Config("h", 9999, "syslog"))
  }

  /** Stub mongod: reads OP_MSG frames, stores the body doc, replies
    * {ok: 1.0}. */
  private def withMongoStub(f: Int => Unit): Seq[Map[String, Any]] = {
    val srv = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    val cmds = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Map[String, Any]]())
    val okDoc: Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(1.0)
      val el = Array[Byte](0x01) ++ "ok".getBytes :+ 0.toByte
      val body = el ++ (0 until 8).map(i => (bits >> (8 * i)).toByte)
      val withLen = Array[Byte](
        (body.length + 5).toByte, 0, 0, 0) ++ body :+ 0.toByte
      withLen
    }
    val th = new Thread(() => {
      try {
        while (!srv.isClosed) {
          val s = srv.accept()
          try {
            val in = new java.io.DataInputStream(s.getInputStream)
            val out = new java.io.DataOutputStream(s.getOutputStream)
            var open = true
            while (open) {
              try {
                val lenB = new Array[Byte](4)
                in.readFully(lenB)
                val total = i32(lenB, 0)
                val rest = new Array[Byte](total - 4)
                in.readFully(rest)
                val reqId = i32(rest, 0)
                // skip reqId respTo opCode flags(4) kind(1) → doc at 17
                cmds.add(decodeDoc(rest, 17)._1)
                val replyBody = Array[Byte](0, 0, 0, 0, 0) ++ okDoc // flags+kind
                val totalLen = 16 + replyBody.length
                val hdr = new java.io.ByteArrayOutputStream()
                def w32(n: Int) = (0 until 4).foreach(i => hdr.write((n >> (8 * i)) & 0xff))
                w32(totalLen); w32(99); w32(reqId); w32(2013)
                out.write(hdr.toByteArray); out.write(replyBody); out.flush()
              } catch { case _: java.io.IOException => open = false }
            }
          } finally s.close()
        }
      } catch { case _: Throwable => () }
    })
    th.setDaemon(true); th.start()
    try f(srv.getLocalPort) finally srv.close()
    th.join(5000)
    import scala.jdk.CollectionConverters._
    cmds.asScala.toSeq
  }

  private def runFileRoute(conf: String, dir: String): Unit = {
    val (routes, _) = graft.config.ConfigCompiler.compileStreamingPipeline(
      graft.config.ConfigParser.parse(conf), spark, s"$dir/unused")
    val q = graft.config.ConfigCompiler.startRoute(routes.head,
      s"$dir/out", s"$dir/cp")
    q.awaitTermination(60000)
  }

  test("config text: mongodb() inserts the value-pairs doc, dot keys renamed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mongo").toString
    val in = java.nio.file.Files.createTempDirectory("graft_mongo_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      "<38>1 2024-01-12T03:04:05Z h1 app 7 M1 [x@1 a=\"b\"] mongo hello\n".getBytes)
    val cmds = withMongoStub { port =>
      runFileRoute(s"""
        source s0 { file("${in.resolve("*.log")}"); };
        destination d { mongodb(uri("mongodb://127.0.0.1:$port/graftdb")
          collection("logs_$${HOST}")); };
        log { source(s0); destination(d); };
      """, dir)
    }
    assert(cmds.length == 1, cmds)
    val c = cmds.head
    assert(c("insert") == "logs_h1" && c("$db") == "graftdb")
    val docs = c("documents").asInstanceOf[Seq[Any]]
    assert(docs.length == 1)
    val d = docs.head.asInstanceOf[Map[String, Any]]
    assert(d("HOST") == "h1" && d("PROGRAM") == "app" &&
      d("MESSAGE") == "mongo hello" && d("PID") == "7" &&
      d("PRIORITY") == "info" && d("FACILITY") == "auth", d)
    // .SDATA.x@1.a → _SDATA.x@1.a (leading dot → underscore)
    assert(d.get("_SDATA.x@1.a").contains("b"), d)
    assert(!d.keys.exists(_.startsWith(".")), d)
  }
}
