package graft

/** amqp() destination: AMQP 0-9-1 handshake + Basic.Publish frames
  * against a stub broker (afamqp semantics; the framing is the public
  * 0-9-1 spec). */
class AmqpSpec extends GraftSuite {

  private case class Publish(exchange: String, routingKey: String,
      contentType: String, deliveryMode: Int,
      headers: Map[String, String], body: String)

  /** Stub broker: drives Start/Tune/OpenOk/Channel.OpenOk, then decodes
    * publish method + content header + body frames. */
  private def withBroker(f: Int => Unit): Seq[Publish] = {
    val srv = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    val pubs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Publish]())
    val auths = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val th = new Thread(() => {
      try {
        while (!srv.isClosed) {
          val sock = srv.accept()
          try { serve(sock, pubs, auths) } finally sock.close()
        }
      } catch { case _: Throwable => () }
    })
    th.setDaemon(true); th.start()
    try f(srv.getLocalPort) finally srv.close()
    th.join(5000)
    import scala.jdk.CollectionConverters._
    authsSeen = auths.asScala.toSeq
    pubs.asScala.toSeq
  }

  @volatile private var authsSeen: Seq[String] = Nil

  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def u32(b: Array[Byte], p: Int): Long =
    (0 until 4).map(i => (b(p + i) & 0xffL) << (8 * (3 - i))).sum

  private def shortstrAt(b: Array[Byte], p: Int): (String, Int) = {
    val len = b(p) & 0xff
    (new String(b, p + 1, len, "UTF-8"), p + 1 + len)
  }

  private def tableAt(b: Array[Byte], p0: Int): (Map[String, String], Int) = {
    val len = u32(b, p0).toInt
    var p = p0 + 4
    val end = p + len
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    while (p < end) {
      val (k, p1) = shortstrAt(b, p)
      assert(b(p1) == 'S', s"only longstr table values expected, got ${b(p1)}")
      val vlen = u32(b, p1 + 1).toInt
      out(k) = new String(b, p1 + 5, vlen, "UTF-8")
      p = p1 + 5 + vlen
    }
    (out.toMap, end)
  }

  private def serve(sock: java.net.Socket,
      pubs: java.util.List[Publish], auths: java.util.List[String]): Unit = {
    val in = new java.io.DataInputStream(sock.getInputStream)
    val out = new java.io.DataOutputStream(sock.getOutputStream)
    def frame(tpe: Int, ch: Int, payload: Array[Byte]): Unit = {
      out.writeByte(tpe); out.writeShort(ch); out.writeInt(payload.length)
      out.write(payload); out.writeByte(0xce); out.flush()
    }
    def method(ch: Int, cls: Int, mth: Int, args: Array[Byte]): Unit =
      frame(1, ch, Array[Byte]((cls >> 8).toByte, cls.toByte,
        (mth >> 8).toByte, mth.toByte) ++ args)
    def readFrame(): (Int, Int, Array[Byte]) = {
      val tpe = in.readUnsignedByte()
      val ch = in.readUnsignedShort()
      val size = in.readInt()
      val p = new Array[Byte](size)
      in.readFully(p)
      assert(in.readUnsignedByte() == 0xce)
      (tpe, ch, p)
    }
    val hdr = new Array[Byte](8)
    in.readFully(hdr)
    assert(new String(hdr.take(4), "UTF-8") == "AMQP" &&
      hdr(6) == 9 && hdr(7) == 1)
    // Connection.Start: ver 0.9, empty server-props, "PLAIN", "en_US"
    method(0, 10, 10, Array[Byte](0, 9) ++ Array[Byte](0, 0, 0, 0) ++
      Array[Byte](0, 0, 0, 5) ++ "PLAIN".getBytes ++
      Array[Byte](0, 0, 0, 5) ++ "en_US".getBytes)
    val (_, _, startOk) = readFrame()                    // StartOk
    // pull the SASL response longstr out: client-props table, mech, resp
    locally {
      var p = 4
      p += 4 + u32(startOk, p).toInt                     // client-properties
      val (_, p2) = shortstrAt(startOk, p)               // mechanism
      val rlen = u32(startOk, p2).toInt
      auths.add(new String(startOk, p2 + 4, rlen, "UTF-8"))
    }
    method(0, 10, 30, Array[Byte](0x07, 0xff.toByte) ++  // Tune
      Array[Byte](0, 2, 0, 0) ++ Array[Byte](0, 0))
    readFrame()                                          // TuneOk
    readFrame()                                          // Connection.Open
    method(0, 10, 41, Array[Byte](0))                    // OpenOk
    readFrame()                                          // Channel.Open
    method(1, 20, 11, Array[Byte](0, 0, 0, 0))           // Channel.OpenOk
    // publish loop
    try {
      while (true) {
        val (t1, _, pub) = readFrame()
        assert(t1 == 1 && u16(pub, 0) == 60 && u16(pub, 2) == 40)
        var p = 6                                        // skip class/method/reserved
        val (exchange, p1) = shortstrAt(pub, p)
        val (rk, _) = shortstrAt(pub, p1)
        val (t2, _, ch) = readFrame()
        assert(t2 == 2 && u16(ch, 0) == 60)
        val bodySize = (u32(ch, 4) << 32 | u32(ch, 8)).toInt
        val flags = u16(ch, 12)
        assert(flags == (0x8000 | 0x2000 | 0x1000), s"prop flags $flags")
        val (ctype, pc) = shortstrAt(ch, 14)
        val (headers, ph) = tableAt(ch, pc)
        val dmode = ch(ph) & 0xff
        val bodyBuf = new java.io.ByteArrayOutputStream()
        while (bodyBuf.size < bodySize) {
          val (t3, _, b) = readFrame()
          assert(t3 == 3)
          bodyBuf.write(b)
        }
        pubs.add(Publish(exchange, rk, ctype, dmode, headers,
          new String(bodyBuf.toByteArray, "UTF-8")))
      }
    } catch { case _: java.io.IOException => () }
  }

  private def runFileRoute(conf: String, dir: String): Unit = {
    val (routes, _) = graft.config.ConfigCompiler.compileStreamingPipeline(
      graft.config.ConfigParser.parse(conf), spark, s"$dir/unused")
    val q = graft.config.ConfigCompiler.startRoute(routes.head,
      s"$dir/out", s"$dir/cp")
    q.awaitTermination(60000)
  }

  test("config text: amqp() handshakes PLAIN and publishes with headers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_amqp").toString
    val in = java.nio.file.Files.createTempDirectory("graft_amqp_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      "<38>1 2024-01-12T03:04:05Z h1 app 7 M1 [x@1 a=\"b\"] amqp hello\n".getBytes)
    val pubs = withBroker { port =>
      runFileRoute(s"""
        source s0 { file("${in.resolve("*.log")}"); };
        destination d { amqp(host("127.0.0.1") port($port)
          exchange("logs") routing-key("$${HOST}.$${PROGRAM}")
          body("$$MESSAGE") username("u1") password("p1")); };
        log { source(s0); destination(d); };
      """, dir)
    }
    assert(pubs.length == 1, pubs)
    val p = pubs.head
    assert(p.exchange == "logs" && p.routingKey == "h1.app" &&
      p.contentType == "text/plain" && p.deliveryMode == 2 &&
      p.body == "amqp hello", p)
    assert(p.headers.get(".SDATA.x@1.a").contains("b"), p.headers)
    assert(authsSeen == Seq("\u0000u1\u0000p1"), authsSeen)
  }

  test("amqp(): persistent(no) sends delivery-mode 1 and empty defaults") {
    val dir = java.nio.file.Files.createTempDirectory("graft_amqp2").toString
    val in = java.nio.file.Files.createTempDirectory("graft_amqp2_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      "<38>1 2024-01-12T03:04:05Z h2 app2 7 M1 - x\n".getBytes)
    val pubs = withBroker { port =>
      runFileRoute(s"""
        source s0 { file("${in.resolve("*.log")}"); };
        destination d { amqp(host("127.0.0.1") port($port) persistent(no)); };
        log { source(s0); destination(d); };
      """, dir)
    }
    assert(pubs.length == 1)
    val p = pubs.head
    assert(p.exchange == "syslog" && p.routingKey == "" &&
      p.deliveryMode == 1 && p.body == "", p)
  }
}
