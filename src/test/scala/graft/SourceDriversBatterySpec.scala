package graft

import graft.config.{ConfigCompiler, ConfigParser, ConfigRuntime}
import graft.template.Template
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Case-for-case port of the LAST unported python_functional source
  * batteries (r14 verdict Next #2):
  * `/root/reference/tests/python_functional/functional_tests/
  * source_drivers/{file_source/test_acceptance.py,
  * test_follow_freq_value.py, generator_source/, internal_source/,
  * network_source/proxyprotocol/}`.
  *
  * The python harness observes rendered file-destination LINES; the
  * equivalent observable here is the route's frame with the same
  * destination template applied (the file writer itself is pinned by
  * StreamingSpec/DestinationsSpec), so each case renders the python
  * test's template over the compiled route and compares strings
  * verbatim.
  */
class SourceDriversBatterySpec extends GraftSuite {

  private def tmpdir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def send(port: Int, payload: String): java.net.Socket = {
    val s = new java.net.Socket("127.0.0.1", port)
    val os = s.getOutputStream
    os.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    os.flush()
    s
  }

  private def awaitCount(l: graft.streaming.SocketListener, n: Long): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (l.receivedCount < n && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(l.receivedCount == n, s"listener got ${l.receivedCount}, want $n")
  }

  private def renderedRoute(df: DataFrame, template: String, dir: String,
      name: String, expectRows: Long): Seq[String] = {
    val out = df.withColumn("__line", Template.column(template, df.columns))
    val q = out.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$dir/cp-$name")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    if (expectRows > 0) {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table(name).count() < expectRows &&
          System.nanoTime() < deadline) Thread.sleep(100)
    }
    spark.table(name).select("__line").collect().map(_.getString(0)).toSeq
  }

  // ---- file_source/test_acceptance.py --------------------------------

  private val inputLog =
    "<38>Feb 11 21:27:22 testhost testprogram[9999]: test message"
  private val expectedLog =
    "Feb 11 21:27:22 testhost testprogram[9999]: test message"

  for ((counter, id) <- Seq(1 -> "with_one_log", 10 -> "with_ten_logs"))
    test(s"file_source test_acceptance[$id]: file source -> file " +
        "destination default template") {
      // file_source.write_log(input_log, counter) + keep_hostname(yes);
      // expected: the default file template ($DATE $HOST $MSGHDR$MSG)
      // repeated `counter` times
      val dir = tmpdir("graft-fsacc")
      val in = java.nio.file.Paths.get(dir, "in")
      java.nio.file.Files.createDirectories(in)
      java.nio.file.Files.write(in.resolve("input.log"),
        (inputLog + "\n").repeat(counter).getBytes("UTF-8"))
      val (routes, _) = ConfigCompiler.compileStreamingPipeline(
        ConfigParser.parse(s"""
          options { keep_hostname(yes); };
          source s_file { file("$in/*.log"); };
          destination d_file { file("/out/output.log"); };
          log { source(s_file); destination(d_file); };
        """), spark, s"$dir/spool")
      val lines = renderedRoute(routes.head.df,
        "$DATE $HOST $MSGHDR$MESSAGE", dir, s"fsacc_$id", counter)
      assert(lines == Seq.fill(counter)(expectedLog), lines.take(3))
    }

  // ---- file_source/test_follow_freq_value.py -------------------------

  test("file_source test_follow_freq_value: nonnegative floats accepted, " +
      "negatives refused at config time") {
    // affile-grammar.ym:178 binds follow-freq() to nonnegative_float —
    // the daemon refuses to start on a negative value
    def compile(freq: String): Unit = {
      val dir = tmpdir("graft-ffreq")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "input.log"), Array[Byte]())
      ConfigCompiler.compileStreamingPipeline(ConfigParser.parse(s"""
        source s_file { file("$dir/*.log" follow-freq($freq)); };
        destination d { file("/out/o.log"); };
        log { source(s_file); destination(d); };
      """), spark, s"$dir/spool")
    }
    for (ok <- Seq("1", "1.0", "0.1", "0", "0.0")) compile(ok)
    for (bad <- Seq("-1", "-1.0", "-0.1")) {
      val ex = intercept[IllegalArgumentException](compile(bad))
      assert(ex.getMessage.contains("follow-freq"), ex.getMessage)
    }
  }

  // ---- generator_source/test_generator_source.py ---------------------

  test("generator_source: example-msg-generator(num(1)) renders the " +
      "default message through the destination template") {
    val dir = tmpdir("graft-gensrc")
    val (routes, _) = ConfigCompiler.compileStreamingPipeline(
      ConfigParser.parse(s"""
        source s_gen { example-msg-generator(num(1) freq(0.01)); };
        destination d { file("/out/output.log" template("$$MSG")); };
        log { source(s_gen); destination(d); };
      """), spark, s"$dir/spool")
    // rate-source backed: not AvailableNow — poll the memory table
    val df = routes.head.df
    val out = df.withColumn("__line", Template.column("$MSG", df.columns))
    val q = out.writeStream.format("memory").queryName("gensrc_out")
      .option("checkpointLocation", s"$dir/cp").start()
    try {
      val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
      while (spark.table("gensrc_out").count() < 1 &&
          System.nanoTime < deadline) Thread.sleep(100)
    } finally q.stop()
    val lines = spark.table("gensrc_out").select("__line").collect()
      .map(_.getString(0)).toSeq
    assert(lines == Seq("-- Generated message. --"), lines)
  }

  // ---- internal_source/test_internal_acceptance.py -------------------

  test("internal_source: start / 5x reload / stop lifecycle notices " +
      "flow through internal()") {
    // mainloop.c:658 / mainloop-worker.c:385 / mainloop.c:460 — the
    // python test reads them through an example_destination; the
    // destination writer is pinned in DestinationDriversBatterySpec,
    // so this case asserts the internal() record stream itself
    val dir = tmpdir("graft-internal")
    val l = graft.streaming.Internal.attach(spark)
    try {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir, "in"))
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in/i.log"),
        "<38>Feb 11 21:27:22 h app: x\n".getBytes("UTF-8"))
      // the reference routes internal() like any source; our internal()
      // is the SparkListener surface (streaming/Internal.scala), so the
      // lifecycle notices are observed on its buffer while a normal
      // config starts/reloads/stops around it
      val conf = s"""
        source s_f { file("$dir/in/*.log"); };
        destination d { file("/out/i.log"); };
        log { source(s_f); destination(d); };
      """
      ConfigRuntime.start(conf, spark, s"$dir/spool")
      def messages: Seq[String] =
        graft.streaming.Internal.snapshot(spark, l)
          .filter(col("severity") === 5).select("message")
          .collect().map(_.getString(0)).toSeq
      assert(messages.count(_ == "syslog-ng starting up") == 1, messages)
      for (i <- 1 to 5) {
        ConfigRuntime.reload(conf, spark, s"$dir/spool-r$i")
        assert(messages.count(_ == "Configuration reload finished") == i,
          messages)
      }
      ConfigRuntime.stop()
      assert(messages.count(_ == "syslog-ng shutting down") == 1, messages)
      // the stream is a well-formed internal() record set: program
      // "spark", facility 5 (syslogd-internal), notice severity
      val rec = graft.streaming.Internal.snapshot(spark, l)
        .filter(col("message") === "syslog-ng starting up").head()
      assert(rec.getAs[String]("program") == "spark" &&
        rec.getAs[Int]("facility") == 5)
    } finally graft.streaming.Internal.detach(spark, l)
  }

  // ---- network_source/proxyprotocol ----------------------------------

  private val ppTemplate = "${PROXIED_SRCIP} ${PROXIED_DSTIP} " +
    "${PROXIED_SRCPORT} ${PROXIED_DSTPORT} ${PROXIED_IP_VERSION} ${MESSAGE}"

  private def ppConfig(dir: String, transport: String,
      tlsBlock: String = ""): (ConfigCompiler.Route,
      graft.streaming.SocketListener) = {
    val (routes, ls) = ConfigCompiler.compileStreamingPipeline(
      ConfigParser.parse(s"""
        source s_net { network(ip("localhost") port(0)
          transport("$transport") flags(no-parse) $tlsBlock); };
        destination d { file("/out/output.log" template("$ppTemplate")); };
        log { source(s_net); destination(d); };
      """), spark, s"$dir/spool")
    (routes.head, ls("s_net"))
  }

  test("test_pp_acceptance: PROXIED_* macros render for every message " +
      "of a proxied connection") {
    val dir = tmpdir("graft-ppacc")
    val (route, l) = ppConfig(dir, "proxied-tcp")
    try {
      send(l.boundPort,
        "PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444\r\nmessage 0\n").close()
      awaitCount(l, 1)
      l.stop()
      val lines = renderedRoute(route.df, ppTemplate, dir, "ppacc", 1)
      assert(lines == Seq("1.1.1.1 2.2.2.2 3333 4444 4 message 0"), lines)
    } finally l.stop()
  }

  test("test_pp_with_multiple_clients: two concurrent proxied " +
      "connections keep their own headers") {
    val dir = tmpdir("graft-ppmulti")
    val (route, l) = ppConfig(dir, "proxied-tcp")
    try {
      val a = send(l.boundPort,
        "PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444\r\nmessage A 0\n")
      val b = send(l.boundPort,
        "PROXY TCP4 5.5.5.5 6.6.6.6 7777 8888\r\nmessage B 0\n")
      a.getOutputStream.write("message A 1\n".getBytes); a.getOutputStream.flush()
      b.getOutputStream.write("message B 1\n".getBytes); b.getOutputStream.flush()
      a.close(); b.close()
      awaitCount(l, 4)
      l.stop()
      val lines = renderedRoute(route.df, ppTemplate, dir, "ppmulti", 4)
      assert(lines.sorted == Seq(
        "1.1.1.1 2.2.2.2 3333 4444 4 message A 0",
        "1.1.1.1 2.2.2.2 3333 4444 4 message A 1",
        "5.5.5.5 6.6.6.6 7777 8888 4 message B 0",
        "5.5.5.5 6.6.6.6 7777 8888 4 message B 1"), lines.sorted)
    } finally l.stop()
  }

  test("test_pp_reload: the connection's header survives a config " +
      "reload (messages after the reload keep PROXIED_*)") {
    val dir = tmpdir("graft-pprel")
    val (route, l) = ppConfig(dir, "proxied-tcp")
    try {
      val sock = send(l.boundPort,
        "PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444\r\nmessage 0\n")
      awaitCount(l, 1)
      Thread.sleep(600) // spool flusher cadence (stop() would flush, but
                        // the connection must stay open across the reload)
      val first = renderedRoute(route.df, ppTemplate, dir, "pprel1", 1)
      assert(first == Seq("1.1.1.1 2.2.2.2 3333 4444 4 message 0"), first)
      // reload: recompile the same text; the live connection and its
      // durable spool survive (the header rides each spooled record)
      val (routes2, ls2) = ConfigRuntime.reload(s"""
        source s_net { network(ip("localhost") port(0)
          transport("proxied-tcp") flags(no-parse)); };
        destination d { file("/out/output.log" template("$ppTemplate")); };
        log { source(s_net); destination(d); };
      """, spark, s"$dir/spool2")
      ls2.values.foreach(_.stop())
      sock.getOutputStream.write("message 1\nmessage 2\n".getBytes)
      sock.getOutputStream.flush()
      sock.close()
      awaitCount(l, 3)
      l.stop() // flushes the spool
      // the original route (same spool + fresh read) sees all three
      // with the SAME header-derived values
      val all = renderedRoute(route.df, ppTemplate, dir, "pprel2", 3)
      assert(all.sorted == Seq(
        "1.1.1.1 2.2.2.2 3333 4444 4 message 0",
        "1.1.1.1 2.2.2.2 3333 4444 4 message 1",
        "1.1.1.1 2.2.2.2 3333 4444 4 message 2"), all.sorted)
      routes2.foreach(_ => ()) // reload compiled clean
    } finally l.stop()
  }

  test("test_pp_with_syslog_proto: proxy handshake then RFC3164 parse " +
      "(keep_hostname) — PRI stripped by the default template") {
    val dir = tmpdir("graft-ppsys")
    val (routes, ls) = ConfigCompiler.compileStreamingPipeline(
      ConfigParser.parse(s"""
        options { keep_hostname(yes); };
        source s_net { network(ip("localhost") port(0)
          transport("proxied-tcp")); };
        destination d { file("/out/output.log"); };
        log { source(s_net); destination(d); };
      """), spark, s"$dir/spool")
    val l = ls("s_net")
    try {
      send(l.boundPort, "PROXY TCP4 192.168.1.1 192.168.1.2 20000 20001\r\n" +
        "<34>Oct 11 22:14:15 mymachine su: 'su root' failed for lonvick " +
        "on /dev/pts/8\n").close()
      awaitCount(l, 1)
      l.stop()
      val lines = renderedRoute(routes.head.df, "$DATE $HOST $MSGHDR$MESSAGE",
        dir, "ppsys", 1)
      assert(lines == Seq("Oct 11 22:14:15 mymachine su: 'su root' " +
        "failed for lonvick on /dev/pts/8"), lines)
      // and the proxy aux values ride the PARSED row too (the
      // handshake composes with the syslog parser, not just no-parse)
      val src = renderedRoute(routes.head.df, "${PROXIED_SRCIP}", dir,
        "ppsys_vals", 1)
      assert(src == Seq("192.168.1.1"), src)
    } finally l.stop()
  }

  test("test_pp_with_simple_tcp_connection: a non-proxied client on a " +
      "proxied-tcp source is dropped — nothing reaches the destination") {
    val dir = tmpdir("graft-ppplain")
    val (route, l) = ppConfig(dir, "proxied-tcp")
    try {
      // loggen without proxy headers: plain syslog lines
      send(l.boundPort, (1 to 10).map(i =>
        s"<38>Feb 11 21:27:22 h app[1]: msg $i").mkString("", "\n", "\n"))
        .close()
      Thread.sleep(500)
      assert(l.receivedCount == 0,
        s"non-proxied frames accepted: ${l.receivedCount}")
      l.stop()
      val lines = renderedRoute(route.df, ppTemplate, dir, "ppplain", 0)
      assert(lines.isEmpty, lines)
    } finally l.stop()
  }

  private def genCert(dir: String, encrypted: Boolean): (String, String) = {
    import scala.sys.process._
    val key = s"$dir/server.key"
    val cert = s"$dir/server.crt"
    if (!encrypted) {
      val rc = Seq("openssl", "req", "-x509", "-newkey", "rsa:2048",
        "-nodes", "-keyout", key, "-out", cert, "-days", "1",
        "-subj", "/CN=127.0.0.1").!(ProcessLogger(_ => ()))
      assert(rc == 0, "openssl cert generation failed")
    } else {
      // the reference's shared server-protected-asdfg.key shape:
      // legacy PEM encryption (Proc-Type: 4,ENCRYPTED / DEK-Info:
      // AES-128-CBC) with passphrase "asdfg"
      val rc1 = Seq("openssl", "genrsa", "-aes128", "-passout",
        "pass:asdfg", "-traditional", "-out", key, "2048")
        .!(ProcessLogger(_ => ()))
      assert(rc1 == 0, "openssl encrypted key generation failed")
      val rc2 = Seq("openssl", "req", "-x509", "-key", key, "-passin",
        "pass:asdfg", "-out", cert, "-days", "1",
        "-subj", "/CN=127.0.0.1").!(ProcessLogger(_ => ()))
      assert(rc2 == 0, "openssl cert for encrypted key failed")
    }
    (cert, key)
  }

  private def tlsPpRoundtrip(dir: String, cert: String, key: String): Unit = {
    val (route, l) = ppConfig(dir, "proxied-tls",
      s"""tls(cert-file("$cert") key-file("$key") peer-verify("optional-untrusted"))""")
    try {
      val ctx = graft.streaming.PemTls.clientContext(cert)
      val sock = ctx.getSocketFactory.createSocket("127.0.0.1", l.boundPort)
      try {
        val os = sock.getOutputStream
        os.write("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444\r\nmessage 0\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        os.flush()
      } finally sock.close()
      awaitCount(l, 1)
      l.stop()
      val lines = renderedRoute(route.df, ppTemplate, dir,
        "pptls" + dir.hashCode.abs, 1)
      assert(lines == Seq("1.1.1.1 2.2.2.2 3333 4444 4 message 0"), lines)
    } finally l.stop()
  }

  test("test_pp_tls: proxy handshake inside the TLS stream") {
    val dir = tmpdir("graft-pptls")
    val (cert, key) = genCert(dir, encrypted = false)
    tlsPpRoundtrip(dir, cert, key)
  }

  test("test_pp_tls_with_passphrase: encrypted legacy PEM key unlocked " +
      "via the credentials store (syslog-ng-ctl credentials add)") {
    val dir = tmpdir("graft-pptlspw")
    val (cert, key) = genCert(dir, encrypted = true)
    // without the credential the key is unreadable — loud error, like
    // the reference's listener waiting on secret-storage
    val ex = intercept[Exception] {
      graft.streaming.PemTls.serverContext(cert, key)
    }
    assert(ex.getMessage.contains("credential"), ex.getMessage)
    graft.streaming.PemTls.Credentials.add(key, "asdfg")
    try tlsPpRoundtrip(dir, cert, key)
    finally graft.streaming.PemTls.Credentials.clear()
  }

  test("encrypted key with the WRONG passphrase fails loudly") {
    val dir = tmpdir("graft-pptlsbad")
    val (_, key) = genCert(dir, encrypted = true)
    graft.streaming.PemTls.Credentials.add(key, "not-the-passphrase")
    try {
      val ex = intercept[Exception] {
        graft.streaming.PemTls.serverContext(
          genCert(tmpdir("graft-cert2"), encrypted = false)._1, key)
      }
      assert(ex.getMessage.toLowerCase.contains("passphrase") ||
        ex.getMessage.toLowerCase.contains("padding"), ex.getMessage)
    } finally graft.streaming.PemTls.Credentials.clear()
  }
}
