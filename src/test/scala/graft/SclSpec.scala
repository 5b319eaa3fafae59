package graft

import graft.config.{ConfigCompiler, ConfigParser}
import graft.operators.Scl
import org.apache.spark.sql.functions._

/** scl composites: default-network-drivers() auto-routing
  * (`/root/reference/scl/default-network-drivers/plugin.conf`),
  * ewmm-parser() (`scl/ewmm/ewmm.conf`), the cee adapter
  * (`scl/cee/adapter.conf`) — semantics driven from config text like
  * the scl itself. */
class SclSpec extends GraftSuite {
  import spark.implicits._

  private def route(lines: Seq[String]) = {
    val df = lines.toDF("message")
      .withColumn("tags", array().cast("array<string>"))
    val conf = """
      source s { file("/x"); };
      destination d { file("/out"); };
      parser p { default-network-drivers(); };
      log { source(s); parser(p); destination(d); };
    """
    ConfigCompiler.compile(ConfigParser.parse(conf), Map("s" -> df)).head.df
  }

  test("default-network-drivers routes mixed vendors, final beats fallback") {
    val out = route(Seq(
      // raw topic: detected BEFORE syslog parsing
      "<189>29: Jan 12 03:58:40: %SYS-5-CONFIG_I: Configured from console by console",
      "<134>1 2024-01-12T03:04:05Z gw1 CheckPoint 22103 - [action:\"Accept\"; src:\"10.7.79.7\";]",
      "<189>date=2024-01-12 time=03:04:05 devname=fw1 logid=0100032003",
      // syslog topic: detected on the parsed columns
      "<85>Jan 12 03:04:05 h1 sudo: root : TTY=pts/0 ; PWD=/ ; USER=root ; COMMAND=/bin/ls -la",
      "<6>Jan 12 03:04:05 h1 kernel: IN=eth0 OUT= SRC=1.2.3.4 PROTO=TCP DPT=22",
      "<13>Jan 12 03:04:05 h1 app: @cee:{\"event\":\"login\"}",
      // nothing matches -> the doesnotexist fallback passes it through
      "<13>Jan 12 03:04:05 h1 app: plain message"))
      .select(col("__channel"),
        element_at(col("values"), ".app.name").as("app"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(
      ("cisco", "cisco"), ("checkpoint", "checkpoint"),
      ("fortigate", "fortigate"), ("sudo", "sudo"),
      ("iptables", "iptables"), ("cee", "cee"), ("unknown", null)))
  }

  test("default-network-drivers tags matched applications like app-parser") {
    // app-parser-generator.c:79-80: set-tag('.app.<name>') +
    // set('<name>' value('.app.name'))
    val out = route(Seq(
      "<6>Jan 12 03:04:05 h1 kernel: IN=eth0 OUT= PROTO=UDP DPT=53"))
      .select(array_join(col("tags"), ",").as("tags")).head()
    assert(out.getString(0).contains(".app.iptables"))
  }

  test("ewmm round-trip: builtin NVs restored, hop-by-hop fields dropped") {
    // scl/ewmm/ewmm.conf:40-57 — PROGRAM @syslog-ng, MSG is the JSON
    // encoding of the original message's name-value pairs
    val out = route(Seq(
      "<13>1 2024-01-12T03:04:05Z relay1 @syslog-ng - - - " +
        "{\"MESSAGE\":\"original body\",\"PROGRAM\":\"nginx\",\"HOST\":\"web7\"," +
        "\"._TAGS\":\"prod,edge\",\".classifier.class\":\"system\",\"custom\":\"v1\"}"))
    val r = out.select(col("__channel"), col("host"), col("program"),
      col("message"), array_join(col("tags"), ",").as("tags"),
      element_at(col("values"), "custom").as("custom"),
      element_at(col("values"), ".classifier.class").as("cls"),
      element_at(col("values"), "._TAGS").as("hop")).head()
    assert(r.getString(0) == "ewmm")
    assert(r.getString(1) == "web7")       // HOST from the JSON wins
    assert(r.getString(2) == "nginx")      // PROGRAM restored after unset
    assert(r.getString(3) == "original body")
    assert(r.getString(4) == "prod,edge")  // ._TAGS -> tags
    assert(r.getString(5) == "v1")
    assert(r.getString(6) == "system")     // leading-dot NVs carried
    assert(r.getString(7) == null)         // hop-by-hop ._* dropped
  }

  test("ewmm-parser leaves non-ewmm rows untouched") {
    val df = Seq(("nginx", "GET /"), ("@syslog-ng", "{\"MESSAGE\":\"m\"}"))
      .toDF("program", "message")
    val out = Scl.ewmmParser(df).orderBy(col("program"))
      .select(col("program"), col("message")).collect()
    assert(out(0).getString(0) == null && out(0).getString(1) == "m")
    assert(out(1).getString(0) == "nginx" && out(1).getString(1) == "GET /")
  }

  test("cee adapter: marker gates the json parse, prefix .cee.") {
    val df = Seq(
      "@cee:{\"event\":\"login\",\"user\":\"jdoe\"}",
      "@cee: {\"event\":\"spaced\"}",     // whitespace after marker ok
      "not cee {\"event\":\"x\"}")
      .toDF("message")
    val conf = """
      source s { file("/x"); };
      destination d { file("/out"); };
      parser p { cee-parser(); };
      log { source(s); parser(p); destination(d); };
    """
    val out = ConfigCompiler.compile(ConfigParser.parse(conf), Map("s" -> df))
      .head.df
      .select(element_at(col("values"), ".cee.event").as("e"),
        element_at(col("values"), ".cee.user").as("u"))
      .collect()
    assert(out(0).getString(0) == "login" && out(0).getString(1) == "jdoe")
    assert(out(1).getString(0) == "spaced")
    assert(out(2).getString(0) == null)
  }

  test("json-parser(marker()) config form matches the cee adapter") {
    val df = Seq("@cee:{\"k\":\"v\"}").toDF("message")
    val conf = """
      source s { file("/x"); };
      destination d { file("/out"); };
      parser p { json-parser(prefix(".cee.") marker("@cee:")); };
      log { source(s); parser(p); destination(d); };
    """
    val out = ConfigCompiler.compile(ConfigParser.parse(conf), Map("s" -> df))
      .head.df.select(element_at(col("values"), ".cee.k")).head()
    assert(out.getString(0) == "v")
  }

  test("app-parser(topic()) statement: raw topic skips syslog-topic apps") {
    val df = Seq("<189>date=2024-01-12 time=03:04:05 devname=fw9 logid=1")
      .toDF("message")
    val out = Scl.appParser(df, "syslog-raw")
      .select(col("__channel"),
        element_at(col("values"), ".fortigate.devname").as("dev")).head()
    assert(out.getString(0) == "fortigate" && out.getString(1) == "fw9")
    // the same line on the syslog topic matches nothing
    val miss = Scl.appParser(
      df.withColumn("program", lit("x")).withColumn("facility", lit(3)),
      "syslog").select(col("__channel")).head()
    assert(miss.getString(0) == "unknown")
  }

  test("netskope/websense/cim/junos route and parse via the registry") {
    // sample lines from the reference's own scl comments
    // (scl/netskope/plugin.conf:26, scl/websense/plugin.conf:24,
    // scl/junos/plugin.conf:23)
    val out = route(Seq(
      """<134>{"count": 1, "severity_level": 2, "timestamp": 1547421943, "_insertion_epoch_timestamp": 1547421943, "user": "user@domain.com", "audit_log_event": "Login Successful", "type": "admin_audit_logs"}""",
      "<159>Dec 19 10:48:57 EST 10.203.28.21 vendor=Websense product=Security action=permitted dst_host=mail.google.com http_response=200",
      "<13>Jan 12 03:04:05 h1 app: @cim:{\"event\":\"login\"}",
      """<14>1 2019-04-12T14:29:06Z - RT_FLOW - RT_FLOW_SESSION_CLOSE [junos@2636.1.1.1.2.129 reason="TCP FIN" source-address="10.3.255.203" destination-port="80"] session closed"""))
      .select(col("__channel"),
        element_at(col("values"), ".netskope.user").as("ns"),
        element_at(col("values"), ".websense.dst_host").as("ws"),
        col("host").as("wshost"), col("program").as("wsprog"),
        element_at(col("values"), ".cim.event").as("cim"),
        element_at(col("values"), ".SDATA.junos@2636.1.1.1.2.129.reason").as("jr"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5), r.getString(6))).toSet
    assert(out.exists(r => r._1 == "netskope" && r._2 == "user@domain.com"))
    assert(out.exists(r => r._1 == "websense" && r._3 == "mail.google.com" &&
      r._4 == "10.203.28.21" && r._5 == "Websense"))
    assert(out.exists(r => r._1 == "cim" && r._6 == "login"))
    assert(out.exists(r => r._1 == "junos" && r._7 == "TCP FIN"))
  }

  test("panos auto-detects via the registry on the parsed message") {
    // the reference detects panos[syslog] as PROGRAM prefix "1,"
    // (LEGACY_MSGHDR split); our header model parses the same line to
    // NULL program + CSV message — same signal, translated
    val out = route(Seq(
      "<14>Jan 12 03:04:05 fw01 1,2024/01/12 03:04:05,001122,SYSTEM,general,1," +
        "2024/01/12 03:04:05,vsys1,eventid1,object1,,,general,informational," +
        "desc,112233,0x0,vsys_name,device_name"))
      .select(col("__channel"), col("host"), col("program"),
        element_at(col("values"), ".panos.type").as("typ"),
        element_at(col("values"), ".panos.eventid").as("eventid"))
      .head()
    assert(out.getString(0) == "panos")
    assert(out.getString(1) == "fw01")            // host from the syslog header
    assert(out.getString(2) == "paloalto_panos")  // PROGRAM rewrite, panos.conf:265
    assert(out.getString(3) == "SYSTEM" && out.getString(4) == "eventid1")
  }

  test("panos registry path: reference CONFIG goldens, 15- and 17-column") {
    // the reference's own functional-test lines
    // (tests/python_functional/functional_tests/parsers/panos) pushed
    // through the REGISTRY path: syslog parse strips the RFC3164
    // header, the un-tagged CSV starts at the program position
    // (LEGACY_MSGHDR), and the translated "1," message-prefix signal
    // routes to panos — locking the translation for both CONFIG
    // layouts (panos.conf tries 15 columns, falls back to 17)
    val config15 = "<14>Apr 14 16:54:18 paloalto.test.net 1,2020/04/14 16:54:18," +
      "unknown,CONFIG,0,0,2020/04/14 16:54:18,10.0.10.55,,set,admin,Web," +
      "Succeeded,deviceconfig system,127,0x0,0,0,0,0,,paloalto"
    val config17 = config15.replace("deviceconfig system,127",
      "deviceconfig system,before,after,127")
    val out = route(Seq(config15, config17))
      .select(col("__channel"), col("program"),
        element_at(col("values"), ".panos.type").as("typ"),
        element_at(col("values"), ".panos.path").as("path"),
        element_at(col("values"), ".panos.device_name").as("dev"),
        element_at(col("values"), ".panos.before_change_detail").as("before"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5))).toSet
    // golden: <paloalto_panos><CONFIG><deviceconfig system><paloalto>
    assert(out == Set(
      ("panos", "paloalto_panos", "CONFIG", "deviceconfig system", "paloalto", null),
      ("panos", "paloalto_panos", "CONFIG", "deviceconfig system", "paloalto", "before")))
  }

  test("format-ewmm -> parse -> ewmm-parser round-trips every field") {
    // the EWMM pair: formatEwmm is the destination template
    // (scl/ewmm/ewmm.conf format-ewmm), ewmmParser the source block;
    // a relay hop must be lossless — including SDATA, which rides the
    // RFC5424 SD field (not the JSON) and comes back via the parser's
    // .SDATA. promotion
    val df = Seq(1).toDF("i")
      .withColumn("host", lit("web7"))
      .withColumn("program", lit("nginx"))
      .withColumn("pid", lit("4242"))
      .withColumn("msgid", lit("ID47"))
      .withColumn("message", lit("GET / 200 \"quoted\" and \\slash"))
      .withColumn("facility", lit(4))
      .withColumn("severity", lit(6))
      .withColumn("ts", to_timestamp(lit("2024-01-12 03:04:05")))
      .withColumn("tags", array(lit("prod"), lit("edge")))
      .withColumn("values", map(
        lit(".classifier.class"), lit("system"),
        lit("custom"), lit("v1"),
        lit(".SDATA.meta.seq"), lit("9"),
        lit(".SDATA.meta.sys"), lit("az\"1]"),
        lit(".SDATA.origin.ip"), lit("10.0.0.7")))
    val wire = df.select(Scl.formatEwmm(df).as("message"))
    val line = wire.head().getString(0)
    assert(line.startsWith("<38>1 2024-01-12T03:04:05+00:00 web7 @syslog-ng - - ["))
    assert(line.contains("[meta seq=\"9\" sys=\"az\\\"1\\]\"]"))
    assert(line.contains("[origin ip=\"10.0.0.7\"]"))
    val back = Scl.ewmmParser(Scl.parseSyslogMessage(wire))
    val r = back.select(col("host"), col("program"), col("pid"),
      col("message"), array_join(col("tags"), ",").as("tags"),
      element_at(col("values"), "custom").as("custom"),
      element_at(col("values"), ".classifier.class").as("cls"),
      element_at(col("values"), ".SDATA.meta.sys").as("sd"),
      element_at(col("values"), ".SDATA.origin.ip").as("sdip")).head()
    assert(r.getString(0) == "web7")
    assert(r.getString(1) == "nginx")
    assert(r.getString(2) == "4242")
    assert(r.getString(3) == "GET / 200 \"quoted\" and \\slash")
    assert(r.getString(4) == "prod,edge")
    assert(r.getString(5) == "v1" && r.getString(6) == "system")
    assert(r.getString(7) == "az\"1]" && r.getString(8) == "10.0.0.7")
  }

  test("format-ewmm: dotted enterprise SD-IDs split at the LAST dot") {
    // logmsg.c log_msg_append_format_sdata splits elem/param with
    // memrchr — .SDATA.junos@2636.1.1.1.2.129.reason must serialize as
    // [junos@2636.1.1.1.2.129 reason="..."], not [junos@2636 1.1....]
    val df = Seq(1).toDF("i")
      .withColumn("message", lit("session closed"))
      .withColumn("values", map(
        lit(".SDATA.junos@2636.1.1.1.2.129.reason"), lit("TCP FIN"),
        lit(".SDATA.junos@2636.1.1.1.2.129.source-address"), lit("10.3.255.203")))
    val line = df.select(Scl.formatEwmm(df).as("m")).head().getString(0)
    assert(line.contains(
      "[junos@2636.1.1.1.2.129 reason=\"TCP FIN\" source-address=\"10.3.255.203\"]"),
      line)
    // and the round trip recovers the dotted NV names losslessly
    val back = Scl.ewmmParser(Scl.parseSyslogMessage(
      df.select(Scl.formatEwmm(df).as("message"))))
    val r = back.select(
      element_at(col("values"), ".SDATA.junos@2636.1.1.1.2.129.reason")).head()
    assert(r.getString(0) == "TCP FIN")
  }

  test("format-ewmm: default PRI is 13 (facility user, severity notice)") {
    // syslog-format.c DefaultPri — a frame with no facility/severity
    // must emit <13>, not facility-13's <109>
    val df = Seq(1).toDF("i").withColumn("message", lit("m"))
    val line = df.select(Scl.formatEwmm(df).as("m")).head().getString(0)
    assert(line.startsWith("<13>1 - - @syslog-ng - - - "), line)
  }

  test("format-gelf: typed GELF 1.1 payload with extras and NUL framing") {
    val df = Seq(1).toDF("i")
      .withColumn("host", lit("h1"))
      .withColumn("program", lit("app"))
      .withColumn("pid", lit("7"))
      .withColumn("message", lit("boom"))
      .withColumn("severity", lit(3))
      .withColumn("facility", lit(4))
      .withColumn("ts", to_timestamp(lit("2024-01-12 03:04:05")))
      .withColumn("values", map(
        lit(".classifier.class"), lit("violation"),
        lit("_team"), lit("ops"),
        lit(".kv.x"), lit("1"),
        lit("plain"), lit("excluded")))
    val line = df.select(Scl.formatGelf(df).as("g")).head().getString(0)
    assert(line.endsWith("\u0000"))
    val json = line.dropRight(1)
    // typed fields: level/timestamp/_pid are JSON numbers
    assert(json.startsWith(
      "{\"version\":\"1.1\",\"host\":\"h1\",\"short_message\":\"boom\"," +
        "\"level\":3,\"timestamp\":1705028645,\"_program\":\"app\",\"_pid\":7," +
        "\"_facility\":\"auth\",\"_class\":\"violation\""), json)
    // --key .* --key _* extras spliced; other keys excluded
    assert(json.contains("\"_team\":\"ops\"") && json.contains("\".kv.x\":\"1\""))
    assert(!json.contains("excluded"))
  }

  test("nested junctions keep the leaf channel label") {
    import graft.dsl.LogPath._
    val df = Seq(1, 2).toDF("n")
    val inner = Junction(Seq(
      Channel("leaf1", Seq(Filter(col("n") === 1)), Set(Final)),
      Channel("leaf2", Nil, Set(Fallback))))
    val out = compileJunction(df, Seq(Channel("outer", Seq(inner))))
      .orderBy("n").select("__channel").collect()
    assert(out(0).getString(0) == "leaf1" && out(1).getString(0) == "leaf2")
  }
}
