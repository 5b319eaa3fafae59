package graft

import org.apache.spark.sql.functions._
import graft.config.{ConfigCompiler, ConfigParser, SyslogConf}

/** syslogconf() conversion vs the reference's awk translator
  * (`/root/reference/scl/syslogconf/convert-syslogconf.awk`): golden
  * text fragments, parseability of the generated config, and an
  * end-to-end routing check through the compiled pipeline. */
class SyslogConfSpec extends GraftSuite {
  import spark.implicits._

  private val sample =
    """# classic syslogd config
      |*.emerg	*
      |mail.*	-/var/log/mail.log
      |kern.crit	@loghost
      |auth,authpriv.none;cron.=info	/var/log/cron.log
      |daemon.warning	|/dev/xconsole
      |mail.*	-/var/log/mail.log
      |""".stripMargin

  private lazy val converted = SyslogConf.convert(sample)

  test("generated text matches the awk translator's shapes") {
    assert(converted.contains("source msgs {\n\tsystem();\n\tnetwork(transport(udp));\n\tinternal();\n};"))
    // *.emerg: no facility term, emerg has no ..emerg suffix
    assert(converted.contains("filter f_1 {\n\tlevel(emerg);\n };"))
    // mail.*: * severity → debug..emerg range
    assert(converted.contains("filter f_2 {\n\tfacility(mail) and level(debug..emerg);\n };"))
    assert(converted.contains("filter f_3 {\n\tfacility(kern) and level(crit..emerg);\n };"))
    // .none selector: negated facility, no level term
    assert(converted.contains("filter f_4 {\n\tnot facility(auth,authpriv);\n };"))
    // =info: exact level
    assert(converted.contains("filter f_5 {\n\tfacility(cron) and level(info);\n };"))
    assert(converted.contains("filter f_6 {\n\tfacility(daemon) and level(warning..emerg);\n };"))
    // destinations: usertty for bare names, file with the '-' stripped,
    // network udp 514 for @host, pipe for |
    assert(converted.contains("destination d_1 { \n\tusertty(\"*\");\n};"))
    assert(converted.contains("destination d_2 { \n\tfile(\"/var/log/mail.log\");\n};"))
    assert(converted.contains("destination d_3 { \n\tnetwork(\"loghost\" transport(udp) port(514));\n};"))
    assert(converted.contains("destination d_4 { \n\tfile(\"/var/log/cron.log\");\n};"))
    assert(converted.contains("destination d_5 { \n\tpipe(\"/dev/xconsole\");\n};"))
    // the multi-selector line joins BOTH filters on one log path
    assert(converted.contains("log { source(msgs); filter(f_4); filter(f_5); destination(d_4); };"))
    // repeated mail line: filter and destination are deduped, the log
    // path is emitted again
    assert("filter f_2 ".r.findAllIn(converted).size == 1)
    assert("destination d_2 ".r.findAllIn(converted).size == 1)
    assert("log \\{ source\\(msgs\\); filter\\(f_2\\); destination\\(d_2\\); \\};".r
      .findAllIn(converted).size == 2)
  }

  test("generated config parses and routes end-to-end") {
    val cfg = ConfigParser.parse(converted)
    assert(cfg.logs.size == 6)

    // facility numbers: kern=0, user=1, mail=2, daemon=3, auth=4, cron=9
    val msgs = Seq(
      (1L, 1, 0, "panic"),   // user.emerg → d_1 only
      (2L, 2, 6, "mail in"), // mail.info → d_2
      (3L, 0, 2, "oops"),    // kern.crit → d_3
      (4L, 9, 6, "cron ok"), // cron.info + not auth → d_4
      (5L, 4, 6, "login"),   // auth.info → matches nothing
      (6L, 3, 4, "warn")     // daemon.warning → d_5
    ).toDF("event_id", "facility", "severity", "message")
      .withColumn("host", lit("h"))
      .withColumn("program", lit("p"))
      .withColumn("tags", array().cast("array<string>"))
      .withColumn("values", map().cast("map<string,string>"))

    val routes = ConfigCompiler.compile(cfg, Map("msgs" -> msgs))
    val byDest = routes.groupBy(_.destination).map { case (d, rs) =>
      d -> rs.flatMap(_.df.select("event_id").collect().map(_.getLong(0))).toSet
    }
    assert(byDest("d_1") == Set(1L))
    assert(byDest("d_2") == Set(2L))
    assert(byDest("d_3") == Set(3L))
    assert(byDest("d_4") == Set(4L))
    assert(byDest("d_5") == Set(6L))
  }
}
