package graft

import graft.streaming.RiemannSink

/** riemann() destination: hand-rolled protobuf Msg frames
  * (modules/riemann/riemann-worker.c semantics; proto schema is the
  * public riemann protocol). */
class RiemannSpec extends GraftSuite {

  // ---- mini protobuf decoder (test-side oracle) -----------------------

  private case class Field(num: Int, wire: Int, vint: Long, bytes: Array[Byte])

  private def decodeFields(b: Array[Byte]): Seq[Field] = {
    var pos = 0
    def rv(): Long = {
      var shift = 0; var v = 0L
      while ({ val x = b(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift; shift += 7; (x & 0x80) != 0 }) ()
      v
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Field]
    while (pos < b.length) {
      val k = rv()
      val num = (k >> 3).toInt
      (k & 7).toInt match {
        case 0 => out += Field(num, 0, rv(), Array.empty)
        case 2 =>
          val len = rv().toInt
          out += Field(num, 2, 0, b.slice(pos, pos + len)); pos += len
        case 5 =>
          out += Field(num, 5,
            (0 until 4).map(i => (b(pos + i) & 0xffL) << (8 * i)).sum, Array.empty)
          pos += 4
        case 1 =>
          out += Field(num, 1,
            (0 until 8).map(i => (b(pos + i) & 0xffL) << (8 * i)).sum, Array.empty)
          pos += 8
        case w => fail(s"unexpected wire type $w")
      }
    }
    out.toSeq
  }

  private def str(f: Field): String = new String(f.bytes, "UTF-8")

  test("protobuf primitives: varint and zigzag vectors") {
    assert(RiemannSink.varint(300).map(_ & 0xff).toSeq == Seq(0xac, 0x02))
    assert(RiemannSink.varint(0).map(_ & 0xff).toSeq == Seq(0))
    assert(RiemannSink.varint(127).map(_ & 0xff).toSeq == Seq(127))
    assert(RiemannSink.varint(128).map(_ & 0xff).toSeq == Seq(0x80, 0x01))
    assert(RiemannSink.zigzag(0) == 0 && RiemannSink.zigzag(-1) == 1 &&
      RiemannSink.zigzag(1) == 2 && RiemannSink.zigzag(-2) == 3)
  }

  /** Stub riemann server: reads length-prefixed Msg frames, stores them,
    * replies Msg{ok=true} per frame (the reference client blocks on the
    * reply the same way). */
  private def withRiemannStub(f: Int => Unit): Seq[Array[Byte]] = {
    val srv = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    val frames = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Array[Byte]]())
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
                val len = in.readInt()
                val payload = new Array[Byte](len)
                in.readFully(payload)
                frames.add(payload)
                out.writeInt(2)
                out.write(Array[Byte](0x10, 0x01)) // Msg{ok=true}
                out.flush()
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
    frames.asScala.toSeq
  }

  private def runFileRoute(conf: String, dir: String): Unit = {
    val (routes, _) = graft.config.ConfigCompiler.compileStreamingPipeline(
      graft.config.ConfigParser.parse(conf), spark, s"$dir/unused")
    val q = graft.config.ConfigCompiler.startRoute(routes.head,
      s"$dir/out", s"$dir/cp")
    q.awaitTermination(60000)
  }

  test("config text: riemann() sends a protobuf event with all fields") {
    val dir = java.nio.file.Files.createTempDirectory("graft_riemann").toString
    val in = java.nio.file.Files.createTempDirectory("graft_riemann_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      "<38>1 2024-01-12T03:04:05Z h1 app 7 M1 - riemann hello\n".getBytes)
    val frames = withRiemannStub { port =>
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { riemann(server("127.0.0.1") port($port)
          state("ok") description("$$MESSAGE") metric("42") ttl("60")
          tags("t1" "t2") attributes("env" => "prod")); };
        log { source(s); destination(d); };
      """, dir)
    }
    assert(frames.length == 1, s"expected one Msg frame, got ${frames.length}")
    val events = decodeFields(frames.head).filter(_.num == 6)
    assert(events.length == 1)
    val fs = decodeFields(events.head.bytes)
    def one(num: Int): Field = {
      val m = fs.filter(_.num == num)
      assert(m.length == 1, s"field $num: $m"); m.head
    }
    val expTime = java.time.Instant.parse("2024-01-12T03:04:05Z").getEpochSecond
    assert(one(1).vint == expTime)                       // time (seconds)
    assert(str(one(2)) == "ok")                          // state
    assert(str(one(3)) == "app")                         // service = $PROGRAM
    assert(str(one(4)) == "h1")                          // host = $HOST
    assert(str(one(5)) == "riemann hello")               // description
    assert(fs.filter(_.num == 7).map(str) == Seq("t1", "t2")) // tags()
    assert(java.lang.Float.intBitsToFloat(one(8).vint.toInt) == 60.0f) // ttl
    val attr = decodeFields(one(9).bytes)
    assert(str(attr.find(_.num == 1).get) == "env" &&
      str(attr.find(_.num == 2).get) == "prod")
    assert(one(13).vint == RiemannSink.zigzag(42))       // metric_sint64
    assert(!fs.exists(_.num == 14))                      // no double metric
  }

  test("riemann(): double metric takes field 14, defaults minimal event") {
    val dir = java.nio.file.Files.createTempDirectory("graft_riemann2").toString
    val in = java.nio.file.Files.createTempDirectory("graft_riemann2_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      "<38>1 2024-01-12T03:04:05Z h2 svc 7 M1 - x\n".getBytes)
    val frames = withRiemannStub { port =>
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { riemann(server("127.0.0.1") port($port)
          metric("3.5")); };
        log { source(s); destination(d); };
      """, dir)
    }
    val fs = decodeFields(decodeFields(frames.head).filter(_.num == 6).head.bytes)
    assert(java.lang.Double.longBitsToDouble(
      fs.find(_.num == 14).get.vint) == 3.5)
    assert(!fs.exists(_.num == 13))
    assert(str(fs.find(_.num == 3).get) == "svc")
    // state/description/ttl/attributes absent when unconfigured
    assert(!fs.exists(f => Seq(2, 5, 8, 9).contains(f.num)))
  }

  test("riemann(): unparsable metric drops the event like the reference") {
    val dir = java.nio.file.Files.createTempDirectory("graft_riemann3").toString
    val in = java.nio.file.Files.createTempDirectory("graft_riemann3_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      ("<38>1 2024-01-12T03:04:05Z h3 bad 7 M1 - x\n" +
       "<38>1 2024-01-12T03:04:06Z h3 good 7 M1 - y\n").getBytes)
    val frames = withRiemannStub { port =>
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { riemann(server("127.0.0.1") port($port)
          metric("$${PROGRAM}_x")); };
        log { source(s); destination(d); };
      """, dir)
    }
    val got = frames.flatMap(f => decodeFields(f).filter(_.num == 6))
    assert(got.isEmpty, "both metrics unparsable -> no events on the wire")
  }
}
