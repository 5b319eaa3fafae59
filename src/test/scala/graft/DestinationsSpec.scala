package graft

import graft.operators.Scl
import graft.streaming.{TcpSink, TcpSource}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Network/syslog TCP destinations and the scl destination composites
  * (loggly, sumologic, slack, telegram, graylog2, logmatic, collectd)
  * — each driven end-to-end against in-process stubs: the TCP pair
  * against a live [[TcpSource]] listener, the http composites against
  * an HTTP stub, graylog2 against a raw byte stub (NUL framing),
  * collectd against a unix-domain ServerSocketChannel; semantics from
  * the reference's own block definitions
  * (`/root/reference/scl/loggly/loggly.conf`,
  * `scl/sumologic/sumologic.conf`, `scl/slack/slack.conf`,
  * `scl/telegram/telegram.conf`, `scl/graylog2/plugin.conf`,
  * `scl/logmatic/logmatic.conf`, `scl/collectd/plugin.conf`,
  * `modules/afsocket/afinet-dest.c`). */
class DestinationsSpec extends GraftSuite {
  import spark.implicits._

  private def awaitCount(l: graft.streaming.SocketListener, n: Long): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (l.receivedCount < n && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(l.receivedCount == n, s"listener got ${l.receivedCount}, want $n")
  }

  private def spoolLines(dir: String): Seq[String] =
    spark.read.textFile(s"$dir/spool-*.log").collect().toSeq

  test("EWMM relay loop: format-ewmm -> syslog() dest -> listener -> ewmm-parser") {
    // the full relay hop over a REAL socket: the sender formats EWMM,
    // the syslog() destination frames it RFC6587, the receiving
    // listener unfrmes it, and ewmm-parser recovers every NV pair —
    // including SDATA, which rides the RFC5424 SD field
    val dir = java.nio.file.Files.createTempDirectory("graft_relay").toString
    val (listener, _) = TcpSource.listen(spark, s"$dir/spool",
      octetCounted = true)
    try {
      val df = Seq(1).toDF("i")
        .withColumn("host", lit("web7"))
        .withColumn("program", lit("nginx"))
        .withColumn("pid", lit("4242"))
        .withColumn("message", lit("GET / 200 \"q\" and \\slash"))
        .withColumn("facility", lit(4))
        .withColumn("severity", lit(6))
        .withColumn("ts", to_timestamp(lit("2024-01-12 03:04:05")))
        .withColumn("tags", array(lit("prod"), lit("edge")))
        .withColumn("values", map(
          lit(".classifier.class"), lit("system"),
          lit("custom"), lit("v1"),
          lit(".SDATA.meta.seq"), lit("9"),
          lit(".SDATA.origin.ip"), lit("10.0.0.7")))
      val wire = df.select(Scl.formatEwmm(df).as("line"))
      TcpSink.writeBatch(wire, "line",
        TcpSink.Config(Seq("127.0.0.1" -> listener.boundPort),
          octetCounted = true))
      awaitCount(listener, 1)
      listener.stop()
      val back = Scl.ewmmParser(Scl.parseSyslogMessage(
        spark.read.textFile(s"$dir/spool/spool-*.log").toDF("message")))
      val r = back.select(col("host"), col("program"), col("pid"),
        col("message"), array_join(col("tags"), ",").as("tags"),
        element_at(col("values"), "custom").as("custom"),
        element_at(col("values"), ".classifier.class").as("cls"),
        element_at(col("values"), ".SDATA.meta.seq").as("sd"),
        element_at(col("values"), ".SDATA.origin.ip").as("sdip")).head()
      assert(r.getString(0) == "web7" && r.getString(1) == "nginx")
      assert(r.getString(2) == "4242")
      assert(r.getString(3) == "GET / 200 \"q\" and \\slash")
      assert(r.getString(4) == "prod,edge")
      assert(r.getString(5) == "v1" && r.getString(6) == "system")
      assert(r.getString(7) == "9" && r.getString(8) == "10.0.0.7")
    } finally listener.stop()
  }

  test("network() dest fails over to the next server when primary is down") {
    // afinet-dest-failover.c: primary refused -> reconnect to the
    // failover target, the in-flight message is re-sent there
    val dir = java.nio.file.Files.createTempDirectory("graft_fo").toString
    val (backup, _) = TcpSource.listen(spark, s"$dir/spool")
    try {
      // a port with nothing listening: bind + close to reserve a number
      val dead = new java.net.ServerSocket(0)
      val deadPort = dead.getLocalPort
      dead.close()
      TcpSink.writeBatch(
        Seq("m1", "m2", "m3").toDF("line"), "line",
        TcpSink.Config(
          Seq("127.0.0.1" -> deadPort, "127.0.0.1" -> backup.boundPort),
          retryBackoffMs = 10))
      awaitCount(backup, 3)
      backup.stop()
      assert(spoolLines(s"$dir/spool").sorted == Seq("m1", "m2", "m3"))
    } finally backup.stop()
  }

  test("config text: loggly() renders the token SD block over network()") {
    // scl/loggly/loggly.conf: <PRI>1 ISODATE HOST PROGRAM PID MSGID
    // [TOKEN@41058 tag="t"] MSG over network(tcp)
    val dir = java.nio.file.Files.createTempDirectory("graft_loggly").toString
    val (listener, _) = TcpSource.listen(spark, s"$dir/spool")
    try {
      val in = java.nio.file.Files.createTempDirectory("graft_loggly_in")
      java.nio.file.Files.write(in.resolve("in.log"),
        "<38>1 2024-01-12T03:04:05Z h1 app 7 M1 - hello loggly\n".getBytes)
      val conf = s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { loggly(token("TOK-123") tag("prod")
          host("127.0.0.1") port(${listener.boundPort})); };
        log { source(s); destination(d); };
      """
      val (routes, _) = graft.config.ConfigCompiler.compileStreamingPipeline(
        graft.config.ConfigParser.parse(conf), spark, s"$dir/unused")
      val q = graft.config.ConfigCompiler.startRoute(routes.head,
        s"$dir/out", s"$dir/cp")
      q.awaitTermination(60000)
      awaitCount(listener, 1)
      listener.stop()
      val line = spoolLines(s"$dir/spool").head
      assert(line == "<38>1 2024-01-12T03:04:05+00:00 h1 app 7 M1 " +
        "[TOK-123@41058 tag=\"prod\"] hello loggly", line)
    } finally listener.stop()
  }

  private def withHttpStub(f: (String, java.util.List[String]) => Unit): Unit = {
    val bodies = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      bodies.add(new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}", bodies)
    finally srv.stop(0)
  }

  private def runFileRoute(conf: String, dir: String): Unit = {
    val (routes, _) = graft.config.ConfigCompiler.compileStreamingPipeline(
      graft.config.ConfigParser.parse(conf), spark, s"$dir/unused")
    val q = graft.config.ConfigCompiler.startRoute(routes.head,
      s"$dir/out", s"$dir/cp")
    q.awaitTermination(60000)
  }

  test("config text: slack() posts the attachments JSON to the webhook") {
    withHttpStub { (url, bodies) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_slack").toString
      val in = java.nio.file.Files.createTempDirectory("graft_slack_in")
      java.nio.file.Files.write(in.resolve("in.log"),
        "<11>Jan 12 03:04:05 h1 app[7]: disk failing\n".getBytes)
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { slack(hook-url("$url/hook")); };
        log { source(s); destination(d); };
      """, dir)
      val body = bodies.toArray.toSeq.asInstanceOf[Seq[String]].head
      assert(body.startsWith("{\"attachments\":[{"), body)
      assert(body.endsWith("]}"), body)
      assert(body.contains("\"text\":\"disk failing\""), body)
      assert(body.contains(
        "\"author_name\":\"host: h1 | program: app(7) | severity: err\""), body)
      // severity err = level 3 -> 4th color of the default list
      assert(body.contains("\"color\":\"#F39C12\""), body)
    }
  }

  test("config text: telegram() sends the url-encoded form body") {
    withHttpStub { (url, bodies) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_tg").toString
      val in = java.nio.file.Files.createTempDirectory("graft_tg_in")
      java.nio.file.Files.write(in.resolve("in.log"),
        "<13>Jan 12 03:04:05 h1 app: hello & goodbye\n".getBytes)
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { telegram(bot-id("B1") chat-id("C9") url("$url/bot")); };
        log { source(s); destination(d); };
      """, dir)
      val body = bodies.toArray.toSeq.asInstanceOf[Seq[String]].head
      assert(body.startsWith(
        "disable_web_page_preview=true&disable_notification=false" +
          "&parse_mode=none&chat_id=C9&&text="), body)
      assert(body.contains("text=hello+%26+goodbye") ||
        body.contains("text=hello%20%26%20goodbye"), body)
    }
  }

  test("config text: discord() posts the format-json webhook body") {
    withHttpStub { (url, bodies) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_disc").toString
      val in = java.nio.file.Files.createTempDirectory("graft_disc_in")
      java.nio.file.Files.write(in.resolve("in.log"),
        "<13>Jan 12 03:04:05 h1 app: deploy done\n".getBytes)
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { discord(url("$url/wh") username("graft-bot")); };
        log { source(s); destination(d); };
      """, dir)
      val body = bodies.toArray.toSeq.asInstanceOf[Seq[String]].head
      assert(body == "{\"avatar_url\":\"\",\"content\":\"deploy done\"," +
        "\"tts\":\"false\",\"username\":\"graft-bot\"}", body)
    }
  }

  test("config text: discord() truncates content at max-msg-length") {
    withHttpStub { (url, bodies) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_disc2").toString
      val in = java.nio.file.Files.createTempDirectory("graft_disc2_in")
      java.nio.file.Files.write(in.resolve("in.log"),
        "<13>Jan 12 03:04:05 h1 app: abcdefghij\n".getBytes)
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { discord(url("$url/wh") max-msg-length(4)); };
        log { source(s); destination(d); };
      """, dir)
      val body = bodies.toArray.toSeq.asInstanceOf[Seq[String]].head
      assert(body.contains("\"content\":\"abcd\""), body)
    }
  }

  test("config text: graphite() sends plaintext metric lines per payload globs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_graph").toString
    val (listener, _) = TcpSource.listen(spark, s"$dir/spool")
    try {
      val in = java.nio.file.Files.createTempDirectory("graft_graph_in")
      java.nio.file.Files.write(in.resolve("in.log"),
        "<13>Jan 12 03:04:05 h1 vmstat: cpu=7 mem=42 skip=9\n".getBytes)
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        parser p { kv-parser(prefix("monitor.")); };
        destination d { graphite(host("127.0.0.1")
          port(${listener.boundPort})
          payload("--key monitor.cpu --key monitor.mem")); };
        log { source(s); parser(p); destination(d); };
      """, dir)
      awaitCount(listener, 2)
      listener.stop()
      val ts = java.time.Instant.parse("2024-01-12T03:04:05Z").getEpochSecond
      val lines = spoolLines(s"$dir/spool").sorted
      assert(lines == Seq(s"monitor.cpu 7 $ts", s"monitor.mem 42 $ts"), lines)
    } finally listener.stop()
  }

  test("config text: sumologic-http() posts the rendered line") {
    withHttpStub { (url, bodies) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_sumo").toString
      val in = java.nio.file.Files.createTempDirectory("graft_sumo_in")
      java.nio.file.Files.write(in.resolve("in.log"),
        "<13>Jan 12 03:04:05 h1 app[7]: sumo line\n".getBytes)
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { sumologic-http(url("$url/receiver")); };
        log { source(s); destination(d); };
      """, dir)
      val body = bodies.toArray.toSeq.asInstanceOf[Seq[String]].head
      assert(body == "2024-01-12T03:04:05+00:00 h1 app[7]: sumo line", body)
    }
  }

  test("config text: sumologic-syslog() renders the token block to the socket") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sumo2").toString
    val (listener, _) = TcpSource.listen(spark, s"$dir/spool")
    try {
      val in = java.nio.file.Files.createTempDirectory("graft_sumo2_in")
      java.nio.file.Files.write(in.resolve("in.log"),
        "<13>Jan 12 03:04:05 h1 app: sumo syslog\n".getBytes)
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { sumologic-syslog(token("ZONE-X") tag("edge")
          host("127.0.0.1") port(${listener.boundPort})); };
        log { source(s); destination(d); };
      """, dir)
      awaitCount(listener, 1)
      listener.stop()
      val line = spoolLines(s"$dir/spool").head
      assert(line == "<13>1 2024-01-12T03:04:05+00:00 h1 app - - " +
        "[ZONE-X tag=\"edge\"] sumo syslog", line)
    } finally listener.stop()
  }

  /** Raw byte-collecting TCP stub for non-newline framings (GELF's
    * NUL): accepts one connection, drains it to a buffer. */
  private def withRawTcpStub(f: Int => Unit): Array[Byte] = {
    val srv = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    val buf = new java.io.ByteArrayOutputStream()
    val th = new Thread(() => {
      try {
        val s = srv.accept()
        s.getInputStream.transferTo(buf)
        s.close()
      } catch { case _: Throwable => () }
    })
    th.setDaemon(true)
    th.start()
    try f(srv.getLocalPort) finally ()
    th.join(30000)
    srv.close()
    buf.toByteArray
  }

  test("config text: graylog2() sends NUL-framed GELF 1.1 JSON") {
    // scl/graylog2/plugin.conf: network(tcp) + $(format-gelf) whose
    // template ends in $(binary 0x00) — one NUL-terminated typed JSON
    // document per message
    val dir = java.nio.file.Files.createTempDirectory("graft_gelf").toString
    val in = java.nio.file.Files.createTempDirectory("graft_gelf_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      "<38>1 2024-01-12T03:04:05Z h1 app 7 M1 - gelf hello\n".getBytes)
    val bytes = withRawTcpStub { port =>
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { graylog2(host("127.0.0.1") port($port)); };
        log { source(s); destination(d); };
      """, dir)
    }
    assert(bytes.nonEmpty && bytes.last == 0, "expected NUL-terminated frame")
    val frames = new String(bytes, "UTF-8").split("\u0000").toSeq
    assert(frames.size == 1, frames)
    val doc = frames.head
    assert(doc == "{\"version\":\"1.1\",\"host\":\"h1\"," +
      "\"short_message\":\"gelf hello\",\"level\":6," +
      "\"timestamp\":1705028645,\"_program\":\"app\",\"_pid\":7," +
      "\"_facility\":\"auth\"}", doc)
  }

  test("config text: logmatic() prefixes the token to the RFC5424 line") {
    // scl/logmatic/logmatic.conf: `token` <PRI>1 ISODATE HOST PROGRAM
    // PID MSGID SDATA MSG over network(tcp); empty SDATA renders "-"
    val dir = java.nio.file.Files.createTempDirectory("graft_lgm").toString
    val (listener, _) = TcpSource.listen(spark, s"$dir/spool")
    try {
      val in = java.nio.file.Files.createTempDirectory("graft_lgm_in")
      java.nio.file.Files.write(in.resolve("in.log"),
        "<38>1 2024-01-12T03:04:05Z h1 app 7 M1 - hello logmatic\n".getBytes)
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { logmatic(token("TOK-9")
          host("127.0.0.1") port(${listener.boundPort})); };
        log { source(s); destination(d); };
      """, dir)
      awaitCount(listener, 1)
      listener.stop()
      val line = spoolLines(s"$dir/spool").head
      assert(line == "TOK-9 <38>1 2024-01-12T03:04:05+00:00 h1 app 7 M1 " +
        "- hello logmatic", line)
    } finally listener.stop()
  }

  test("network-load-balancer() spreads across targets and survives a death") {
    // scl/loadbalancer/: messages distribute across the target list
    // (message-keyed modulo standing in for the confgen R_MSEC
    // channels); a dead target's share fails over to the live ones
    val dir = java.nio.file.Files.createTempDirectory("graft_lb").toString
    val (a, _) = TcpSource.listen(spark, s"$dir/spoolA")
    val (b, _) = TcpSource.listen(spark, s"$dir/spoolB")
    try {
      val msgs = (1 to 40).map(i => s"msg $i")
      import spark.implicits._
      TcpSink.writeBatch(msgs.toDF("line").coalesce(1), "line",
        TcpSink.Config(
          Seq("127.0.0.1" -> a.boundPort, "127.0.0.1" -> b.boundPort),
          loadBalance = true))
      awaitCount2(a, b, 40)
      assert(a.receivedCount > 0 && b.receivedCount > 0,
        s"spread expected, got a=${a.receivedCount} b=${b.receivedCount}")
      // now kill B: everything lands on A
      b.stop()
      TcpSink.writeBatch(msgs.toDF("line").coalesce(1), "line",
        TcpSink.Config(
          Seq("127.0.0.1" -> a.boundPort, "127.0.0.1" -> b.boundPort),
          loadBalance = true, retryBackoffMs = 10))
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (a.receivedCount + b.receivedCount < 80 &&
        System.nanoTime() < deadline) Thread.sleep(20)
      assert(a.receivedCount + b.receivedCount == 80,
        s"a=${a.receivedCount} b=${b.receivedCount}")
      a.stop()
      val all = spoolLines(s"$dir/spoolA") ++ spoolLines(s"$dir/spoolB")
      assert(all.sorted == (msgs ++ msgs).sorted)
    } finally { a.stop(); b.stop() }
  }

  private def awaitCount2(a: graft.streaming.SocketListener,
      b: graft.streaming.SocketListener, n: Long): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (a.receivedCount + b.receivedCount < n && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(a.receivedCount + b.receivedCount == n,
      s"got ${a.receivedCount}+${b.receivedCount}, want $n")
  }

  test("config text: network-load-balancer() block resolves host:port targets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lb2").toString
    val (a, _) = TcpSource.listen(spark, s"$dir/spoolA")
    val (b, _) = TcpSource.listen(spark, s"$dir/spoolB")
    try {
      val in = java.nio.file.Files.createTempDirectory("graft_lb2_in")
      val lines = (1 to 20)
        .map(i => s"<13>Jan 12 03:04:05 h$i app: lb line $i").mkString("\n")
      java.nio.file.Files.write(in.resolve("in.log"), (lines + "\n").getBytes)
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { network-load-balancer(targets(
          "127.0.0.1:${a.boundPort}" "127.0.0.1:${b.boundPort}")
          template("$$MSG")); };
        log { source(s); destination(d); };
      """, dir)
      awaitCount2(a, b, 20)
      assert(a.receivedCount > 0 && b.receivedCount > 0,
        s"spread expected, got a=${a.receivedCount} b=${b.receivedCount}")
    } finally { a.stop(); b.stop() }
  }

  test("unix-stream() dest -> unix-stream() source round trip") {
    // afunix-dest.c -> afunix-source.c over a real unix domain
    // socket: the destination writes newline frames, the source
    // listener spools them for the file stream
    val dir = java.nio.file.Files.createTempDirectory("graft_ux").toString
    val sockPath = s"$dir/g.sock"
    val (listener, _) = graft.streaming.UnixSource.listen(
      spark, s"$dir/spool", sockPath)
    try {
      val in = java.nio.file.Files.createTempDirectory("graft_ux_in")
      java.nio.file.Files.write(in.resolve("in.log"),
        "<13>Jan 12 03:04:05 h1 app: over the socket\n".getBytes)
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { unix-stream("$sockPath" template("$$MSG")); };
        log { source(s); destination(d); };
      """, dir)
      awaitCount(listener, 1)
      listener.stop()
      assert(spoolLines(s"$dir/spool") == Seq("over the socket"))
    } finally listener.stop()
  }

  test("config text: collectd() writes PUTVAL lines to the unix socket") {
    // scl/collectd/plugin.conf: unix-stream() to the collectd
    // unixsock plugin — PUTVAL host/plugin-inst/type interval=N
    // UNIXTIME:values per message
    val dir = java.nio.file.Files.createTempDirectory("graft_cd").toString
    val sockPath = s"$dir/collectd.sock"
    val srv = java.nio.channels.ServerSocketChannel.open(
      java.net.StandardProtocolFamily.UNIX)
    srv.bind(java.net.UnixDomainSocketAddress.of(sockPath))
    val buf = new java.io.ByteArrayOutputStream()
    val th = new Thread(() => {
      try {
        val ch = srv.accept()
        val bb = java.nio.ByteBuffer.allocate(8192)
        while (ch.read(bb) >= 0) {
          bb.flip(); buf.write(bb.array(), 0, bb.limit()); bb.clear()
        }
        ch.close()
      } catch { case _: Throwable => () }
    })
    th.setDaemon(true)
    th.start()
    try {
      val in = java.nio.file.Files.createTempDirectory("graft_cd_in")
      java.nio.file.Files.write(in.resolve("in.log"),
        "<13>Jan 12 03:04:05 h1 app: cpu sample\n".getBytes)
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { collectd(plugin("cpu") plugin_instance("0")
          type("gauge") socket("$sockPath")); };
        log { source(s); destination(d); };
      """, dir)
      th.join(30000)
      val line = new String(buf.toByteArray, "UTF-8")
      assert(line == "PUTVAL h1/cpu-0/gauge interval=60 1705028645:U\n", line)
    } finally srv.close()
  }

  test("config text: redis() sends RESP multi-bulk with AUTH greeting") {
    // modules/redis: command() argv rendered per message, hiredis
    // multi-bulk wire format, AUTH once per connection
    val dir = java.nio.file.Files.createTempDirectory("graft_redis").toString
    val in = java.nio.file.Files.createTempDirectory("graft_redis_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      "<38>1 2024-01-12T03:04:05Z h1 app 7 M1 - store me\n".getBytes)
    val bytes = withRawTcpStub { port =>
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { redis(host("127.0.0.1") port($port) auth("sekret")
          command("LPUSH" "logs:$${HOST}" "$$MESSAGE")); };
        log { source(s); destination(d); };
      """, dir)
    }
    val got = new String(bytes, "UTF-8")
    assert(got ==
      "*2\r\n$4\r\nAUTH\r\n$6\r\nsekret\r\n" +
      "*3\r\n$5\r\nLPUSH\r\n$7\r\nlogs:h1\r\n$8\r\nstore me\r\n", got)
  }

  test("config text: stomp() sends CONNECT then a SEND frame with nv headers") {
    // modules/afstomp: CONNECT(login/passcode), SEND with destination +
    // persistent + value-pairs headers, NUL-terminated frames
    val dir = java.nio.file.Files.createTempDirectory("graft_stomp").toString
    val in = java.nio.file.Files.createTempDirectory("graft_stomp_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      "<38>1 2024-01-12T03:04:05Z h1 app 7 M1 [ev k=\"42\"] stomp body\n".getBytes)
    val bytes = withRawTcpStub { port =>
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { stomp(host("127.0.0.1") port($port)
          stomp-destination("/queue/logs") username("u1") password("p1")
          body("$$MESSAGE")); };
        log { source(s); destination(d); };
      """, dir)
    }
    val frames = new String(bytes, "UTF-8").split("\u0000").toSeq
    assert(frames.size == 2, frames.map(_.take(30)))
    assert(frames(0) == "CONNECT\nlogin:u1\npasscode:p1\n\n")
    val send = frames(1)
    assert(send.startsWith("SEND\n"))
    val Array(head, body) = send.split("\n\n", 2)
    val headers = head.linesIterator.drop(1).map { h =>
      val Array(k, v) = h.split(":", 2); k -> v
    }.toMap
    assert(headers("destination") == "/queue/logs")
    assert(headers("persistent") == "true")
    assert(headers(".SDATA.ev.k") == "42")
    assert(body == "stomp body")
  }

  test("config text: smtp() renders the pipelined transaction per message") {
    // modules/afsmtp: from/to/subject/body templates; EHLO once, then
    // MAIL FROM / RCPT TO / DATA ... dialogue per message
    val dir = java.nio.file.Files.createTempDirectory("graft_smtp").toString
    val in = java.nio.file.Files.createTempDirectory("graft_smtp_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      "<38>1 2024-01-12T03:04:05Z h1 app 7 M1 - disk failing\n".getBytes)
    val bytes = withRawTcpStub { port =>
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { smtp(host("127.0.0.1") port($port)
          from("logs@example.com") to("ops@example.com")
          subject("[ALERT] $$HOST") body("$$MESSAGE")); };
        log { source(s); destination(d); };
      """, dir)
    }
    val got = new String(bytes, "UTF-8")
    assert(got ==
      "EHLO graft\r\n" +
      "MAIL FROM:<logs@example.com>\r\nRCPT TO:<ops@example.com>\r\n" +
      "DATA\r\nFrom: <logs@example.com>\r\nTo: <ops@example.com>\r\n" +
      "Subject: [ALERT] h1\r\n\r\ndisk failing\r\n.\r\n", got)
  }

  test("config text: network(transport(tls)) encrypts to the TLS listener") {
    // afinet-dest.c + transport-tls.c client side: the destination
    // verifies the server against tls(ca-file()); full loop against
    // our own transport(tls) listener
    val certDir = java.nio.file.Files.createTempDirectory("graft_tlsd_pem")
    import scala.sys.process._
    val gen = Seq("openssl", "req", "-x509", "-newkey", "rsa:2048",
      "-nodes", "-keyout", s"$certDir/key.pem", "-out", s"$certDir/cert.pem",
      "-days", "1", "-subj", "/CN=127.0.0.1").!(ProcessLogger(_ => ()))
    assume(gen == 0, "openssl unavailable")
    val dir = java.nio.file.Files.createTempDirectory("graft_tlsd").toString
    val (listener, _) = TcpSource.listen(spark, s"$dir/spool",
      tls = Some(s"$certDir/cert.pem" -> s"$certDir/key.pem"))
    try {
      val in = java.nio.file.Files.createTempDirectory("graft_tlsd_in")
      java.nio.file.Files.write(in.resolve("in.log"),
        "<38>1 2024-01-12T03:04:05Z h1 app 7 M1 - over tls\n".getBytes)
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { network("127.0.0.1" port(${listener.boundPort})
          transport(tls) tls(ca-file("$certDir/cert.pem"))); };
        log { source(s); destination(d); };
      """, dir)
      awaitCount(listener, 1)
      listener.stop()
      val line = spoolLines(s"$dir/spool").head
      assert(line == "<38>Jan 12 03:04:05 h1 app[7]: over tls", line)
    } finally listener.stop()
  }

  test("config text: usertty() appends ts host message lines") {
    // afuser.c:130-136 wire format; dev-mode tty-dir override
    val dir = java.nio.file.Files.createTempDirectory("graft_utty").toString
    val tty = java.nio.file.Files.createTempDirectory("graft_utty_dev").toString
    val in = java.nio.file.Files.createTempDirectory("graft_utty_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      ("<13>Jan 12 03:04:05 h1 app: first alert\n" +
        "<13>Jan 12 03:04:06 h1 app: second alert\n").getBytes)
    runFileRoute(s"""
      source s { file("${in.resolve("*.log")}"); };
      destination d { usertty("root" tty-dir("$tty")); };
      log { source(s); destination(d); };
    """, dir)
    val got = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tty/root")), "UTF-8")
    assert(got.split("\n").toSet == Set(
      "2024 Jan 12 03:04:05 h1 first alert",
      "2024 Jan 12 03:04:06 h1 second alert"), got)
  }

  test("config text: mqtt() sends CONNECT then QoS-0 PUBLISH packets") {
    // modules/mqtt/destination: hand-rolled 3.1.1 wire — CONNECT
    // ("MQTT" level 4, clean session) then 0x30 PUBLISH frames;
    // topic template renders per message, '#'/'+' fall back
    val dir = java.nio.file.Files.createTempDirectory("graft_mqtt").toString
    val in = java.nio.file.Files.createTempDirectory("graft_mqtt_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      "<38>1 2024-01-12T03:04:05Z h1 app 7 M1 - mqtt hello\n".getBytes)
    val bytes = withRawTcpStub { port =>
      runFileRoute(s"""
        source s { file("${in.resolve("*.log")}"); };
        destination d { mqtt(address("tcp://127.0.0.1:$port")
          topic("logs/$${HOST}") template("$$MESSAGE")); };
        log { source(s); destination(d); };
      """, dir)
    }
    // CONNECT: 0x10, len, "MQTT", level 4, flags 0x02, keepalive 60, "graft"
    assert((bytes(0) & 0xff) == 0x10)
    var i = 2 // 1-byte remaining length here (small packet)
    val connLen = bytes(1) & 0xff
    val conn = bytes.slice(i, i + connLen)
    assert(new String(conn.slice(2, 6), "UTF-8") == "MQTT")
    assert(conn(6) == 4 && conn(7) == 2)
    assert(((conn(8) & 0xff) << 8 | (conn(9) & 0xff)) == 60)
    assert(new String(conn.slice(12, 12 + 5), "UTF-8") == "graft")
    i += connLen
    // PUBLISH: 0x30, len, topic "logs/h1", payload "mqtt hello"
    assert((bytes(i) & 0xff) == 0x30)
    val pubLen = bytes(i + 1) & 0xff
    val pub = bytes.slice(i + 2, i + 2 + pubLen)
    val tlen = ((pub(0) & 0xff) << 8) | (pub(1) & 0xff)
    assert(new String(pub.slice(2, 2 + tlen), "UTF-8") == "logs/h1")
    assert(new String(pub.drop(2 + tlen), "UTF-8") == "mqtt hello")
    assert(i + 2 + pubLen == bytes.length)
  }

  test("mqtt remaining-length varint encoding") {
    import graft.streaming.MqttSink
    def enc(n: Int) = MqttSink.remainingLength(n).map(_ & 0xff).toSeq
    assert(enc(0) == Seq(0))
    assert(enc(127) == Seq(127))
    assert(enc(128) == Seq(0x80, 1))
    assert(enc(16383) == Seq(0xff, 0x7f))
    assert(enc(16384) == Seq(0x80, 0x80, 1))
    assert(enc(268435455) == Seq(0xff, 0xff, 0xff, 0x7f))
    intercept[IllegalArgumentException](MqttSink.remainingLength(268435456))
  }

  test("config text: pseudofile() writes template bytes from offset 0") {
    // modules/pseudofile/pseudofile.c: one open+write per message, no
    // appended newline, no O_APPEND — on a regular file the last
    // message's bytes remain
    val dir = java.nio.file.Files.createTempDirectory("graft_pseudo").toString
    val target = s"$dir/device"
    val in = java.nio.file.Files.createTempDirectory("graft_pseudo_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      ("<13>Jan 12 03:04:05 h1 app: first\n" +
        "<13>Jan 12 03:04:06 h1 app: second one\n").getBytes)
    runFileRoute(s"""
      source s { file("${in.resolve("*.log")}"); };
      destination d { pseudofile("$target" template("$${PROGRAM}: $${MESSAGE}")); };
      log { source(s); destination(d); };
    """, dir)
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(target)), "UTF-8")
    // batch order within one file is the input order; the second,
    // longer write fully covers the first from offset 0
    assert(content == "app: second one", content)
  }

  test("config text: network(transport(udp)) sends one bare datagram per message") {
    // afinet-dest.c SOCK_DGRAM: one message = one datagram, no
    // newline/octet framing inside the payload
    val recv = new java.net.DatagramSocket(0,
      java.net.InetAddress.getLoopbackAddress)
    recv.setSoTimeout(15000)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reader = new Thread(() => {
      try {
        while (got.size < 2) {
          val p = new java.net.DatagramPacket(new Array[Byte](65536), 65536)
          recv.receive(p)
          got.add(new String(p.getData, 0, p.getLength, "UTF-8"))
        }
      } catch { case _: Throwable => () }
    })
    reader.setDaemon(true); reader.start()
    val dir = java.nio.file.Files.createTempDirectory("graft_udp_dest").toString
    val in = java.nio.file.Files.createTempDirectory("graft_udp_dest_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      ("<13>Jan 12 03:04:05 h1 app: alpha\n" +
        "<13>Jan 12 03:04:06 h2 app: beta\n").getBytes)
    runFileRoute(s"""
      source s { file("${in.resolve("*.log")}"); };
      destination d { network("127.0.0.1" port(${recv.getLocalPort})
        transport(udp) template("$${HOST} $${MESSAGE}")); };
      log { source(s); destination(d); };
    """, dir)
    reader.join(15000)
    recv.close()
    assert(got.asScala.toSet == Set("h1 alpha", "h2 beta"), got.asScala.toSeq)
  }

  test("config text: hdfs() writes template lines via the Hadoop FS API") {
    // scl/hdfs/plugin.conf: hdfs_uri + hdfs_file (macro refs become
    // partition dirs) + template(); file:// here exercises the same
    // FileSystem API an hdfs:// URI would on a cluster
    val dir = java.nio.file.Files.createTempDirectory("graft_hdfs").toString
    val in = java.nio.file.Files.createTempDirectory("graft_hdfs_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      ("<13>Jan 12 03:04:05 hostA app: alpha\n" +
        "<13>Jan 12 03:04:06 hostB app: beta\n").getBytes)
    runFileRoute(s"""
      source s { file("${in.resolve("*.log")}"); };
      destination d { hdfs(hdfs_uri("file://$dir") hdfs_file("/logs/$$HOST/messages.log")
        template("$${PROGRAM}: $${MESSAGE}")); };
      log { source(s); destination(d); };
    """, dir)
    def slurp(host: String): String = {
      val d = java.nio.file.Paths.get(s"$dir/logs/host=$host")
      val files = java.nio.file.Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".txt")).toSeq
      files.map(f => new String(java.nio.file.Files.readAllBytes(f), "UTF-8"))
        .mkString
    }
    assert(slurp("hostA").trim == "app: alpha")
    assert(slurp("hostB").trim == "app: beta")
  }
}
