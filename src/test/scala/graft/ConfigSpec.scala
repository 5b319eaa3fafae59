package graft

import graft.config.{ConfigCompiler, ConfigParser}
import org.apache.spark.sql.functions._

class ConfigSpec extends GraftSuite {
  import spark.implicits._

  private lazy val logs = Seq(
    ("web1", "nginx", "GET /index k=1", 3, 4),
    ("web1", "nginx", "GET /admin k=2", 3, 3),
    ("db1", "postgres", "commit ok", 3, 6),
    ("db1", "kernel", "oom killer invoked", 0, 2))
    .toDF("host", "program", "message", "facility", "severity")
    .withColumn("tags", array().cast("array<string>"))

  private val conf = """
    @version: 3.33
    # a config exercising filters, parsers, rewrites, routing
    options { keep_hostname(yes); };

    source s_logs { file("/var/log/app.log"); };

    filter f_warn { severity(emerg..warning) and not program("postgres"); };
    filter f_web { program("nginx") or host("web.*"); };

    parser p_kv { kv-parser(prefix(".kv.")); };

    rewrite r_tag { set-tag("checked"); };
    rewrite r_host { set("$HOST-edge", value("HOST"), condition(program("nginx"))); };

    destination d_all { file("/out/all.log"); };
    destination d_err { file("/out/err-$HOST.log"); };

    log {
      source(s_logs);
      filter(f_warn);
      parser(p_kv);
      rewrite(r_tag);
      rewrite(r_host);
      destination(d_err);
      destination(d_all);
    };
  """

  test("parse: blocks, filters, log paths") {
    val cfg = ConfigParser.parse(conf)
    assert(cfg.sources.keySet == Set("s_logs"))
    assert(cfg.filters.keySet == Set("f_warn", "f_web"))
    assert(cfg.parsers.keySet == Set("p_kv"))
    assert(cfg.rewrites.keySet == Set("r_tag", "r_host"))
    assert(cfg.destinations.keySet == Set("d_all", "d_err"))
    assert(cfg.logs.size == 1)
  }

  test("named templates and template-functions expand statically") {
    // lib/cfg-grammar.y template_stmt + tf-template.c static binding +
    // user-function.c zero-arg functions: all resolve at config-read
    // time, including template-referencing-template chains
    val cfg = ConfigParser.parse("""
      template t_line { template("${HOST}/${PROGRAM}"); };
      template t_alias "$(template t_line)!";
      template-function fmt_prog "[${PROGRAM}]";
      source s { file("/x"); };
      destination d { file("/out/x.log"); };
      rewrite r { set("$(template t_alias) $(fmt_prog)", value("HOST")); };
      log { source(s); rewrite(r); destination(d); };
    """)
    assert(cfg.templates.keySet == Set("t_line", "t_alias", "fmt_prog"))
    assert(cfg.templateFunctions.keySet == Set("fmt_prog"))
    val routes = ConfigCompiler.compile(cfg, Map("s" -> logs))
    val hosts = routes.head.df.select("host").as[String].collect().toSet
    assert(hosts.contains("web1/nginx! [nginx]"), hosts)
    assert(hosts.contains("db1/postgres! [postgres]"), hosts)
  }

  test("template expansion cycles fail loudly") {
    val cfg = ConfigParser.parse("""
      template t_a "$(template t_b)";
      template t_b "$(template t_a)";
      source s { file("/x"); };
      destination d { file("/out/x.log"); };
      rewrite r { set("$(template t_a)", value("HOST")); };
      log { source(s); rewrite(r); destination(d); };
    """)
    val e = intercept[IllegalArgumentException](
      ConfigCompiler.compile(cfg, Map("s" -> logs)))
    assert(e.getMessage.contains("cycle"))
  }

  test("compile: filter + parser + conditional rewrite, two destinations") {
    val cfg = ConfigParser.parse(conf)
    val routes = ConfigCompiler.compile(cfg, Map("s_logs" -> logs))
    assert(routes.map(_.destination).sorted == Seq("d_all", "d_err"))
    val out = routes.head.df.cache()
    // f_warn: severity <= 4 (warning) and not postgres → the two nginx
    // rows (sev 4, 3) + kernel oom (sev 2)
    val hosts = out.select("host").collect().map(_.getString(0)).toSeq
    // nginx rows got host rewritten by the conditional set()
    assert(hosts.count(_ == "web1-edge") == 2)
    assert(hosts.contains("db1"))
    assert(out.count() == 3)
    // kv-parser put k into .kv.
    val ks = out.select(element_at(col("values"), ".kv.k")).collect()
      .flatMap(r => Option(r.getString(0))).sorted.toSeq
    assert(ks == Seq("1", "2"))
    // set-tag applied everywhere
    assert(out.filter(array_contains(col("tags"), "checked")).count() == 3)
    out.unpersist()
  }

  test("compile: junction with final + fallback channels") {
    val cfg = ConfigParser.parse("""
      source s { file("/x"); };
      destination d { file("/out"); };
      log {
        source(s);
        junction {
          channel { filter(program("nginx")); rewrite(set-tag("web")); flags(final); };
          channel { flags(fallback); };
        };
        destination(d);
      };
    """)
    val routes = ConfigCompiler.compile(cfg, Map("s" -> logs))
    val out = routes.head.df
    val tagged = out.filter(array_contains(col("tags"), "web"))
      .select("program").collect().map(_.getString(0)).toSet
    assert(tagged == Set("nginx"))
    assert(out.count() == 4) // final + fallback partition the stream
  }

  test("if/elif/else desugars to final-channel junctions (cfg-tree.c:391-431)") {
    val cfg = ConfigParser.parse("""
      source s { file("/x"); };
      destination d { file("/out"); };
      log {
        source(s);
        if (severity(emerg..crit)) {
          rewrite(set("page", value("action")));
        } elif (program("nginx")) {
          rewrite(set("route", value("action")));
          rewrite(set-tag("web"));
        } else {
          rewrite(set("archive", value("action")));
        };
        destination(d);
      };
    """)
    val out = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
    val acts = out.select("host", "program", "severity", "action").collect()
      .map(r => (r.getString(1), r.getInt(2), r.getString(3))).toSet
    // kernel oom sev 2 -> page; nginx sev 4,3 -> route; postgres sev 6 -> archive
    assert(acts == Set(("kernel", 2, "page"),
      ("nginx", 4, "route"), ("nginx", 3, "route"), ("postgres", 6, "archive")))
    assert(out.count() == 4) // chain partitions the stream, no dup/loss
    assert(out.filter(array_contains(col("tags"), "web")).count() == 2)
  }

  test("if without else: non-matching rows pass through unchanged") {
    val cfg = ConfigParser.parse("""
      source s { file("/x"); };
      destination d { file("/out"); };
      log {
        source(s);
        if (program("nginx")) { rewrite(set-tag("web")); };
        destination(d);
      };
    """)
    val out = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
    assert(out.count() == 4)
    assert(out.filter(array_contains(col("tags"), "web")).count() == 2)
  }

  test("block args: mandatory params and varargs (lib/tests/test_lexer_block.c)") {
    // `param()` (empty parens) declares a MANDATORY parameter: using
    // the block without supplying it is a config error; supplying it
    // substitutes the value (cfg-block.c _validate_mandatory_options)
    def defBlock(use: String) = s"""
      block rewrite b_mand(tagname()) { set-tag("`tagname`"); };
      source s { file("/x"); };
      destination d { file("/out"); };
      rewrite r { $use };
      log { source(s); rewrite(r); destination(d); };
    """
    intercept[RuntimeException] { ConfigParser.parse(defBlock("b_mand();")) }
    val ok = ConfigParser.parse(defBlock("b_mand(tagname(\"audited\"));"))
    assert(ok.rewrites.contains("r"))
    // an use-site arg outside the declared set is an error...
    def defV(decl: String, use: String) = s"""
      block rewrite b_va($decl) { set("`__VARARGS__`", value("vv")); };
      source s { file("/x"); };
      destination d { file("/out"); };
      rewrite r { $use };
      log { source(s); rewrite(r); destination(d); };
    """
    intercept[RuntimeException] {
      ConfigParser.parse(defV("known(\"1\")", "b_va(unknown(\"x\"));"))
    }
    // ...unless the definition accepts varargs (`...`): the extras
    // format into __VARARGS__ as `key(value) ` entries
    val va = ConfigParser.parse(defV("known(\"1\") ...", "b_va(unknown(\"x\"));"))
    assert(va.rewrites.contains("r"))
    val logs = Seq(("h1", "p", "m")).toDF("host", "program", "message")
    val out = ConfigCompiler.compile(va, Map("s" -> logs)).head.df
    assert(out.select(col("vv")).head.getString(0) == "unknown(x) ")
  }

  test("block definitions expand with backtick params and defaults") {
    val cfg = ConfigParser.parse("""
      block parser tagged_kv(prefix(".kv.") vsep("=")) {
        kv-parser(prefix("`prefix`") value-separator("`vsep`"));
      };
      block rewrite audit() {
        set-tag("audited");
        set("seen", value("state"));
      };
      source s { file("/x"); };
      destination d { file("/out"); };
      parser p_use { tagged_kv(prefix(".custom.")); };
      log {
        source(s);
        parser(p_use);
        rewrite(audit());
        destination(d);
      };
    """)
    val out = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
    // block param override: keys land under .custom., default vsep used
    val ks = out.select(element_at(col("values"), ".custom.k")).collect()
      .flatMap(r => Option(r.getString(0))).sorted.toSeq
    assert(ks == Seq("1", "2"))
    // multi-statement rewrite block expanded inline in the log path
    assert(out.filter(array_contains(col("tags"), "audited")).count() == 4)
    assert(out.filter(col("state") === "seen").count() == 4)
  }

  test("streaming compile: config text -> running pipeline -> partitioned files") {
    val inDir = java.nio.file.Files.createTempDirectory("graft-cfg-in").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(inDir, "a.log"),
      "<13>Jun  1 12:00:00 web1 nginx[7]: GET /\n" +
      "<11>Jun  1 12:00:01 db1 postgres[8]: commit\n" +
      "<30>Jun  1 12:00:02 web2 nginx[9]: GET /x\n")
    val outDir = java.nio.file.Files.createTempDirectory("graft-cfg-out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-cfg-cp").toString
    val cfg = ConfigParser.parse(s"""
      source s_app { file("$inDir/*.log"); };
      filter f_nginx { program("nginx"); };
      rewrite r { set-tag("web"); };
      destination d_by_host { file("/var/out/$$HOST/app.log"); };
      log { source(s_app); filter(f_nginx); rewrite(r); destination(d_by_host); };
    """)
    val routes = ConfigCompiler.compileStreaming(cfg, spark)
    assert(routes.size == 1 && routes.head.df.isStreaming)
    val q = ConfigCompiler.startFileRoute(routes.head, outDir, cp)
    try q.awaitTermination(60000) finally q.stop()
    val written = spark.read.parquet(outDir)
    assert(written.count() == 2) // postgres filtered out
    val hosts = new java.io.File(outDir).listFiles().map(_.getName)
      .filter(_.startsWith("host=")).sorted.toSeq
    assert(hosts == Seq("host=web1", "host=web2"))
    assert(written.filter(array_contains(col("tags"), "web")).count() == 2)
  }

  test("wildcard-file() source: base-dir/filename-pattern + monitoring knobs") {
    // modules/affile/wildcard-source.c:103-299 — the glob monitor;
    // max-files(N) maps to the per-trigger reader budget, and
    // monitor-method() validates against the reference's enum (Spark's
    // file source is poll-based either way)
    val inDir = java.nio.file.Files.createTempDirectory("graft-wild-in").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(inDir, "a.log"),
      "<13>Jun  1 12:00:00 web1 nginx[7]: GET /a\n")
    java.nio.file.Files.writeString(java.nio.file.Path.of(inDir, "b.log"),
      "<13>Jun  1 12:00:01 web2 nginx[8]: GET /b\n")
    java.nio.file.Files.writeString(java.nio.file.Path.of(inDir, "c.txt"),
      "<13>Jun  1 12:00:02 web3 nginx[9]: not matched by the pattern\n")
    val outDir = java.nio.file.Files.createTempDirectory("graft-wild-out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-wild-cp").toString
    val cfg = ConfigParser.parse(s"""
      source s_wild { wildcard-file(base-dir("$inDir") filename-pattern("*.log")
        max-files(1) monitor-method(poll)); };
      destination d { file("/var/out/app.log"); };
      log { source(s_wild); destination(d); };
    """)
    val routes = ConfigCompiler.compileStreaming(cfg, spark)
    assert(routes.size == 1 && routes.head.df.isStreaming)
    val q = ConfigCompiler.startFileRoute(routes.head, outDir, cp)
    try q.awaitTermination(60000) finally q.stop()
    val written = spark.read.parquet(outDir)
    assert(written.count() == 2) // c.txt excluded by the pattern
    assert(written.select("host").as[String].collect().sorted.toSeq ==
      Seq("web1", "web2"))
    // a bad monitor-method must fail the compile loudly
    val bad = ConfigParser.parse(s"""
      source s { wildcard-file(base-dir("$inDir") filename-pattern("*.log")
        monitor-method(epoll)); };
      destination d { file("/var/out/x.log"); };
      log { source(s); destination(d); };
    """)
    intercept[IllegalArgumentException] {
      ConfigCompiler.compileStreaming(bad, spark)
    }
    // max-files() on the batch-read variants (pad-size/encoding) has no
    // per-trigger meaning — rejected loudly instead of silently ignored
    for (variant <- Seq("pad-size(64)", "encoding(iso-8859-1)")) {
      val badMf = ConfigParser.parse(s"""
        source s { file("$inDir/a.log" $variant max-files(2)); };
        destination d { file("/var/out/x.log"); };
        log { source(s); destination(d); };
      """)
      intercept[IllegalArgumentException] {
        ConfigCompiler.compileStreaming(badMf, spark)
      }
    }
  }

  test("osquery() source: no-parse file + program override + json NVs") {
    // scl/osquery/plugin.conf:3-8
    val inDir = java.nio.file.Files.createTempDirectory("graft-osq-in").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(inDir, "results.log"),
      """{"name":"pack_osquery-monitoring_osquery_info","hostIdentifier":"host7","action":"added","columns":{"pid":"755","version":"2.3.2"}}""" + "\n")
    val cfg = ConfigParser.parse(s"""
      source s_osq { osquery(file("$inDir/*.log")); };
      destination d { file("/out/osq.log"); };
      log { source(s_osq); destination(d); };
    """)
    val (routes, _) = ConfigCompiler.compileStreamingPipeline(cfg, spark,
      java.nio.file.Files.createTempDirectory("graft-osq-sp").toString)
    val cp = java.nio.file.Files.createTempDirectory("graft-osq-cp").toString
    val q = routes.head.df.writeStream.format("memory").queryName("osq_out")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    val r = spark.table("osq_out").select(col("program"),
      element_at(col("values"), ".osquery.hostIdentifier").as("h"),
      element_at(col("values"), ".osquery.columns.pid").as("pid")).head()
    assert(r.getString(0) == "osquery")
    assert(r.getString(1) == "host7" && r.getString(2) == "755")
  }

  test("mbox() source: one record per From_-delimited mail, no-parse") {
    // scl/mbox/mbox.conf: file() with multi-line-prefix('^From ') +
    // flags(no-parse) — each mail (headers + body, internal newlines
    // kept) lands whole in message
    val inDir = java.nio.file.Files.createTempDirectory("graft-mbox-in").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(inDir, "inbox.mbox"),
      "From alice@example.com Fri Jan 12 03:04:05 2024\n" +
        "Subject: first\n\nbody one\n" +
        "From bob@example.com Fri Jan 12 04:05:06 2024\n" +
        "Subject: second\n\nbody two\nFromage is not a delimiter\n")
    val cfg = ConfigParser.parse(s"""
      source s_mb { mbox("$inDir/*.mbox"); };
      destination d { file("/out/mb.log"); };
      log { source(s_mb); destination(d); };
    """)
    val (routes, _) = ConfigCompiler.compileStreamingPipeline(cfg, spark,
      java.nio.file.Files.createTempDirectory("graft-mbox-sp").toString)
    val cp = java.nio.file.Files.createTempDirectory("graft-mbox-cp").toString
    val q = routes.head.df.writeStream.format("memory").queryName("mbox_out")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    val mails = spark.table("mbox_out").select("message")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(mails.size == 2, mails)
    assert(mails(0) == "From alice@example.com Fri Jan 12 03:04:05 2024\n" +
      "Subject: first\n\nbody one", mails(0))
    assert(mails(1) == "From bob@example.com Fri Jan 12 04:05:06 2024\n" +
      "Subject: second\n\nbody two\nFromage is not a delimiter", mails(1))
  }

  test("example-msg-generator() source: freq/num/template/values pairs") {
    // modules/examples/sources/msg-generator/msg-generator-source.c:
    // 109-131 — values() pairs land before the message template render,
    // so the template sees them; num() bounds the stream; default
    // message is the literal "-- Generated message. --"
    val cfg = ConfigParser.parse(s"""
      source s_gen { example-msg-generator(freq(0.01) num(20)
        template("hello $${who}") values("who" => "world")); };
      destination d { file("/out/gen.log"); };
      log { source(s_gen); destination(d); };
    """)
    val (routes, _) = ConfigCompiler.compileStreamingPipeline(cfg, spark,
      java.nio.file.Files.createTempDirectory("graft-gen-sp").toString)
    val cp = java.nio.file.Files.createTempDirectory("graft-gen-cp").toString
    val q = routes.head.df.writeStream.format("memory").queryName("gen_out")
      .option("checkpointLocation", cp).start()
    try {
      val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
      while (spark.table("gen_out").count() < 20 &&
          System.nanoTime < deadline) Thread.sleep(200)
    } finally q.stop()
    val rows = spark.table("gen_out")
      .select(col("message"), element_at(col("values"), "who").as("w"))
      .collect()
    assert(rows.length == 20, s"expected 20 generated, got ${rows.length}")
    assert(rows.forall(r => r.getString(0) == "hello world" &&
      r.getString(1) == "world"), rows.take(3).mkString(";"))
  }

  test("example-msg-generator() default message without template()") {
    val cfg = ConfigParser.parse(s"""
      source s_gen { example-msg-generator(freq(0.01) num(3)); };
      destination d { file("/out/gen2.log"); };
      log { source(s_gen); destination(d); };
    """)
    val (routes, _) = ConfigCompiler.compileStreamingPipeline(cfg, spark,
      java.nio.file.Files.createTempDirectory("graft-gen2-sp").toString)
    val cp = java.nio.file.Files.createTempDirectory("graft-gen2-cp").toString
    val q = routes.head.df.writeStream.format("memory").queryName("gen2_out")
      .option("checkpointLocation", cp).start()
    try {
      val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
      while (spark.table("gen2_out").count() < 3 &&
          System.nanoTime < deadline) Thread.sleep(200)
    } finally q.stop()
    val msgs = spark.table("gen2_out").select("message").collect()
      .map(_.getString(0)).distinct.toSeq
    assert(msgs == Seq("-- Generated message. --"), msgs)
  }

  test("test_use_syslogng_pid.py verbatim: use-syslogng-pid(yes) makes the " +
      "engine's own pid win over the driver-set $PID (logsource.c:619)") {
    def pidOf(opt: String): String = {
      val cfg = ConfigParser.parse(s"""
        source s_gen { example-msg-generator(freq(0.01) num(1)
          use-syslogng-pid($opt) values("PID" => "pid")); };
        destination d { file("/out/p.log"); };
        log { source(s_gen); destination(d); };
      """)
      val (routes, _) = ConfigCompiler.compileStreamingPipeline(cfg, spark,
        java.nio.file.Files.createTempDirectory("graft-pid-sp").toString)
      val out = routes.head.df
      val rendered = out.withColumn("__line",
        graft.template.Template.column("PID=$PID", out.columns.toSeq))
      val qn = s"pid_out_$opt"
      val q = rendered.writeStream.format("memory").queryName(qn)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-pid-cp").toString)
        .start()
      try {
        val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
        while (spark.table(qn).count() < 1 &&
            System.nanoTime < deadline) Thread.sleep(200)
      } finally q.stop()
      spark.table(qn).select("__line").head.getString(0)
    }
    assert(pidOf("yes") == s"PID=${ProcessHandle.current().pid()}")
    assert(pidOf("no") == "PID=pid")
  }

  test("test_backtick_substitution.py verbatim: @define value substitutes " +
      "into a global options statement and the config starts") {
    val cfg = ConfigParser.parse("""
      @define disable none
      options {
        mark-mode(`disable`);
      };
      source s { file("/x"); };
      destination d { file("/out"); };
      log { source(s); destination(d); };
    """)
    assert(cfg.options.get("mark-mode").contains("none"), cfg.options)
    val src = Seq((1L, "m")).toDF("event_id", "message")
      .withColumn("tags", array().cast("array<string>"))
    assert(ConfigCompiler.compile(cfg, Map("s" -> src)).head.df.count() == 1)
  }

  test("openbsd() source: klog-file override, standard syslog parse") {
    // modules/openbsd/openbsd-driver.c:58-125: dgram reader over
    // /dev/klog with default reader options — one line per message,
    // normal syslog parse (kernel lines: PRI + free text)
    val inDir = java.nio.file.Files.createTempDirectory("graft-obsd-in").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(inDir, "klog"),
      "<4>arp info overwritten for 10.0.0.1 by 00:11:22:33:44:55\n")
    val cfg = ConfigParser.parse(s"""
      source s_k { openbsd(klog-file("$inDir/klog*")); };
      destination d { file("/out/k.log"); };
      log { source(s_k); destination(d); };
    """)
    val (routes, _) = ConfigCompiler.compileStreamingPipeline(cfg, spark,
      java.nio.file.Files.createTempDirectory("graft-obsd-sp").toString)
    val cp = java.nio.file.Files.createTempDirectory("graft-obsd-cp").toString
    val q = routes.head.df.writeStream.format("memory").queryName("obsd_out")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    val r = spark.table("obsd_out")
      .select("facility", "severity", "message").head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 4, r)  // <4> = kern.warning
    assert(r.getString(2).startsWith("arp info overwritten"), r)
  }

  test("file() source with multi-line-mode(indented) assembles stacks") {
    // logproto-indented-multiline-server.c via config text: indented
    // continuation lines glue to the preceding record
    val inDir = java.nio.file.Files.createTempDirectory("graft-iml-in").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(inDir, "trace.log"),
      "Exception in thread main\n    at Foo.bar(Foo.java:1)\n" +
        "    at Baz.qux(Baz.java:2)\nnext line\n")
    val cfg = ConfigParser.parse(s"""
      source s_tr { file("$inDir/*.log" multi-line-mode(indented)
        flags(no-parse)); };
      destination d { file("/out/tr.log"); };
      log { source(s_tr); destination(d); };
    """)
    val (routes, _) = ConfigCompiler.compileStreamingPipeline(cfg, spark,
      java.nio.file.Files.createTempDirectory("graft-iml-sp").toString)
    val cp = java.nio.file.Files.createTempDirectory("graft-iml-cp").toString
    val q = routes.head.df.writeStream.format("memory").queryName("iml_out")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    val recs = spark.table("iml_out").select("message")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(recs == Seq(
      "Exception in thread main\n    at Foo.bar(Foo.java:1)\n" +
        "    at Baz.qux(Baz.java:2)",
      "next line"), recs)
  }

  test("inline filter comparison and severity range") {
    // word-form `eq` = string compare; symbolic `==` is the NUMERIC
    // family (atoi both sides) per filter-expr-parser.c:37-49
    val cfg = ConfigParser.parse("""
      source s { file("/x"); };
      destination d { file("/out"); };
      log { source(s); filter("$PROGRAM" eq "kernel"); destination(d); };
    """)
    val out = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
    assert(out.select("message").head.getString(0).contains("oom"))
  }

  test("grouping-by with context-values + sort-key and csv options") {
    val ev = Seq(
      ("h1", "b;2", 100L), ("h1", "a;1", 200L), ("h2", "c;9", 300L))
      .toDF("host", "message", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("tags", array().cast("array<string>"))
    val cfg = ConfigParser.parse("""
      source s { file("/x"); };
      parser p_csv { csv-parser(columns(val, num), delimiters(";"),
        flags(strip-whitespace)); };
      parser p_grp { grouping-by(key("$HOST") timeout(3600)
        sort-key("$val")
        aggregate(value("vals" "$(context-values $val)")
                  value("n" "$(context-length)")
                  value("ones" "$(grep ('$num' == '1') $val)"))); };
      destination d { file("/out"); };
      log { source(s); parser(p_csv); parser(p_grp); destination(d); };
    """)
    val out = ConfigCompiler.compile(cfg, Map("s" -> ev)).head.df
      .orderBy("key")
    val rows = out.select("key", "vals", "n", "ones").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq(("h1", "a,b", "2", "a"), ("h2", "c", "1", "")))
  }

  test("symbolic comparison is numeric with atoi semantics") {
    val cfg = ConfigParser.parse("""
      source s { file("/x"); };
      destination d { file("/out"); };
      log { source(s); filter("$LEVEL_NUM" <= "4"); destination(d); };
    """)
    val out = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
    assert(out.select("severity").collect().forall(_.getInt(0) <= 4))
  }

  test("@include expands files, globs, and directories with cycle guard") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-inc")
    val sub = Files.createDirectory(dir.resolve("conf.d"))
    def write(p: java.nio.file.Path, s: String) =
      Files.write(p, s.getBytes("UTF-8"))
    write(dir.resolve("main.conf"),
      """@version: 3.33
        |@include "common.conf"
        |@include "conf.d/*.conf"
        |log { source(s); parser(p1); parser(p2); destination(d); };
        |""".stripMargin)
    write(dir.resolve("common.conf"),
      "source s { file(\"/x\"); };\ndestination d { file(\"/out\"); };\n")
    write(sub.resolve("10-a.conf"), "parser p1 { kv-parser(prefix(\".kv.\")); };\n")
    write(sub.resolve("20-b.conf"), "parser p2 { json-parser(prefix(\".j.\")); };\n")
    val cfg = ConfigParser.parseFile(dir.resolve("main.conf").toString)
    assert(cfg.sources.contains("s") && cfg.parsers.keySet == Set("p1", "p2"))
    assert(cfg.logs.size == 1)
    // directory form includes every file in it
    val cfg2 = ConfigParser.parse(ConfigParser.resolveIncludes(
      "@include \"conf.d\"", dir))
    assert(cfg2.parsers.keySet == Set("p1", "p2"))
    // a self-including file is an error, not a hang
    write(dir.resolve("loop.conf"), "@include \"loop.conf\"\n")
    val e = intercept[IllegalArgumentException] {
      ConfigParser.parseFile(dir.resolve("loop.conf").toString)
    }
    assert(e.getMessage.contains("cycle"))
    // a glob in a directory component errors instead of silently
    // including nothing
    val e2 = intercept[IllegalArgumentException] {
      ConfigParser.resolveIncludes("@include \"conf.*/x.conf\"", dir)
    }
    assert(e2.getMessage.contains("filename component"))
  }

  test("hook-commands(): startup/setup at init, teardown/shutdown on stop") {
    val dir = java.nio.file.Files.createTempDirectory("hooks").toFile
    val log = new java.io.File(dir, "hooks.log").getAbsolutePath
    val cfg = graft.config.ConfigParser.parse(
      s"""source s_net { network(port(0));
         |  hook-commands(startup("echo up >> $log") setup("echo set >> $log")
         |    teardown("echo down >> $log") shutdown("echo off >> $log")); };
         |destination d { file("memory"); };
         |log { source(s_net); destination(d); };
         |""".stripMargin)
    val (_, listeners) = graft.config.ConfigCompiler
      .compileStreamingPipeline(cfg, spark, dir.getAbsolutePath + "/spool")
    def lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(log)), "UTF-8").split("\n").toSeq
    assert(lines == Seq("up", "set"))
    listeners("s_net").stop()
    assert(lines == Seq("up", "set", "down", "off"))

    // a failing startup aborts initialization
    val bad = graft.config.ConfigParser.parse(
      """source s2 { network(port(0)); hook-commands(startup("exit 7")); };
        |destination d { file("memory"); };
        |log { source(s2); destination(d); };
        |""".stripMargin)
    val e = intercept[IllegalStateException] {
      graft.config.ConfigCompiler.compileStreamingPipeline(
        bad, spark, dir.getAbsolutePath + "/spool2")
    }
    assert(e.getMessage.contains("aborting initialization"))
  }

  test("confgen: @module pragma registers a generator, invocation expands") {
    import org.apache.spark.sql.functions._
    val gen = java.nio.file.Files.createTempFile("confgen", ".sh")
    java.nio.file.Files.write(gen,
      "echo \"filter f_gen { severity($confgen_level); };\"\n".getBytes)
    val cfg = graft.config.ConfigParser.parse(
      s"""@module confgen context(filter) name(gen-sev) exec("sh $gen")
        |gen-sev(level("err"));
        |source s { file("x"); };
        |destination d { file("y"); };
        |log { source(s); filter(f_gen); destination(d); };
        |""".stripMargin)
    assert(cfg.filters.contains("f_gen"))
    val logs = Seq((1L, 3), (2L, 5)).toDF("event_id", "severity")
      .withColumn("facility", lit(1)).withColumn("host", lit("h"))
      .withColumn("program", lit("p")).withColumn("message", lit("m"))
      .withColumn("tags", array().cast("array<string>"))
      .withColumn("values", map().cast("map<string,string>"))
    val out = graft.config.ConfigCompiler.compile(cfg, Map("s" -> logs))
      .head.df.select("event_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L)) // severity err = 3
    // a failing generator aborts the parse
    intercept[IllegalArgumentException] {
      graft.config.ConfigParser.parse(
        """@module confgen context(root) name(boom) exec("exit 9")
          |boom();
          |""".stripMargin)
    }
  }

  test("keyword '-'/'_' equivalence (cfg_lexer_lookup_keyword, " +
      "cfg-lexer.c:186-218; functional configs use pad_size/ts_format)") {
    import org.apache.spark.sql.functions._
    // underscore spellings everywhere a keyword can appear: driver
    // names, option keys, parser statements, block defs + refs
    val cfg = graft.config.ConfigParser.parse(
      """block parser my_kv_block(px()) { kv_parser(prefix(`px`)); };
        |source s { file("x"); };
        |destination d { file("y"); };
        |filter f_sev { severity(err); };
        |log { source(s); filter(f_sev); parser(my_kv_block(px(".k.")));
        |  destination(d); };
        |""".stripMargin)
    // rule names with underscores stay verbatim (LL_IDENTIFIER)
    assert(cfg.filters.contains("f_sev"))
    val logs = Seq((1L, 3, "user=alice ok"), (2L, 5, "user=bob no"))
      .toDF("event_id", "severity", "message")
      .withColumn("facility", lit(1)).withColumn("host", lit("h"))
      .withColumn("program", lit("p"))
      .withColumn("tags", array().cast("array<string>"))
      .withColumn("values", map().cast("map<string,string>"))
    val out = graft.config.ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
    val rows = out.select("event_id", "values").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
    // kv value extends across spaces with no next key= (scanner rule)
    assert(rows(0).getMap[String, String](1)(".k.user") == "alice ok")
    // flag VALUES normalize too (cfg-grammar.y:1075 normalized_flag):
    // flags(no_parse) == flags(no-parse)
    val cfg2 = graft.config.ConfigParser.parse(
      """source s { file("x" flags(no_parse)); };
        |destination d { file("y"); };
        |log { source(s); flags(flow_control); destination(d); };
        |""".stripMargin)
    val src = cfg2.sources("s").stmts.head
    val fl = src.args.collectFirst {
      case graft.config.ConfigParser.KV("flags", vs) =>
        vs.collect { case graft.config.ConfigParser.Lit(v) => v } }.get
    assert(fl == Seq("no-parse"))
    assert(cfg2.logs.head.path.collect {
      case graft.config.ConfigParser.Flags(f) => f }.flatten == Seq("flow-control"))
  }

  test("undefined rule references fail initialization " +
      "(test_filter_call.c:31-40)") {
    def compileErr(body: String): String = {
      val cfg = graft.config.ConfigParser.parse(
        s"""source s { file("x"); };
          |destination d { file("y"); };
          |log { source(s); $body destination(d); };
          |""".stripMargin)
      val logs = Seq((1L, 3)).toDF("event_id", "severity")
        .withColumn("facility", org.apache.spark.sql.functions.lit(1))
        .withColumn("host", org.apache.spark.sql.functions.lit("h"))
        .withColumn("program", org.apache.spark.sql.functions.lit("p"))
        .withColumn("message", org.apache.spark.sql.functions.lit("m"))
        .withColumn("tags",
          org.apache.spark.sql.functions.array().cast("array<string>"))
        .withColumn("values",
          org.apache.spark.sql.functions.map().cast("map<string,string>"))
      intercept[IllegalArgumentException] {
        graft.config.ConfigCompiler.compile(cfg, Map("s" -> logs))
      }.getMessage
    }
    assert(compileErr("filter(undefined_filter);")
      .contains("Referenced filter rule not found"))
    assert(compileErr("parser(undefined_parser);")
      .contains("Referenced parser rule not found"))
    assert(compileErr("rewrite(undefined_rw);")
      .contains("Referenced rewrite rule not found"))
  }

  test("confgen registration validation (test_confgen.c:88-108, " +
      "confgen-plugin.c:148-185)") {
    def parseErr(cfg: String): String =
      intercept[Exception](graft.config.ConfigParser.parse(cfg)).getMessage
    // unknown context is rejected with the reference's message
    assert(parseErr(
      """@module confgen context(unknownclass) name(confgentest) exec("echo x")
        |""".stripMargin).contains("context value is unknown"))
    // each mandatory argument reports its own error
    assert(parseErr("@module confgen context(root) exec(\"echo x\")\n")
      .contains("name argument expected"))
    assert(parseErr("@module confgen name(x) exec(\"echo x\")\n")
      .contains("context argument expected"))
    assert(parseErr("@module confgen context(root) name(x)\n")
      .contains("exec argument expected"))
    // args accept any order, like cfg_args
    val gen = graft.config.ConfigParser.parse(
      """@module confgen name(noop) exec("echo ''") context(root)
        |""".stripMargin)
    assert(gen != null)
  }

  test("confgen: syslogconf(file()) built-in expands the classic config") {
    val f = java.nio.file.Files.createTempFile("syslogconf", ".conf")
    java.nio.file.Files.write(f, "mail.*\t/var/log/mail.log\n".getBytes)
    val cfg = graft.config.ConfigParser.parse(
      s"""syslogconf(file("$f"));\n""".stripMargin)
    assert(cfg.filters.contains("f_1"))
    assert(cfg.destinations.contains("d_1"))
    assert(cfg.logs.size == 1)
  }
}
