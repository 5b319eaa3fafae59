package graft

import graft.config.{ConfigCompiler, ConfigParser}
import graft.template.Template
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Verbatim port of the reference's checkpoint and PAN-OS
  * python-functional e2e matrices
  * (`/root/reference/tests/python_functional/functional_tests/parsers/
  * checkpoint/test_checkpoint.py`, `parsers/panos/test_panos_parser.py`):
  * raw vendor line in (the generator's MESSAGE is the unparsed wire
  * line), scl parser statement through the compiled config path, file
  * destination template out. The python harness compares the formatted
  * output line; the file sink here writes structured rows, so the
  * destination's template() render is applied through the same
  * Template.column the formatted destinations use (DbParserBatterySpec
  * precedent).
  */
class SclVendorE2eBatterySpec extends GraftSuite {
  import spark.implicits._

  private def rendered(parserStmt: String, raw: String, tmpl: String): String = {
    val src = Seq(Tuple1(raw)).toDF("message")
      .withColumn("host", lit(null).cast("string"))
      .withColumn("program", lit(null).cast("string"))
      .withColumn("pid", lit(null).cast("string"))
      .withColumn("ts", lit(null).cast("timestamp"))
      .withColumn("tags", array().cast("array<string>"))
      .withColumn("values", map().cast("map<string,string>"))
    val cfg = ConfigParser.parse(s"""
      source s_gen { network(); };
      parser p_vendor { $parserStmt; };
      destination d_file { file("/out/output.log"); };
      log { source(s_gen); parser(p_vendor); destination(d_file); };
    """)
    val df = ConfigCompiler.compile(cfg, Map("s_gen" -> src)).head.df
    df.select(Template.column(tmpl, df.columns.toSeq).as("l")).head.getString(0)
  }

  // ---- test_checkpoint.py ----------------------------------------------------
  // template: '<${PROGRAM}><${HOST}><${S_DATE}>' — S_DATE is the BSD
  // stamp with a space-padded day.
  private val cpTemplate = "<${PROGRAM}><${HOST}><${S_DATE}>"

  private val cpBody =
    """[action:"Update"; flags:"150784"; ifdir:"inbound"; logid:"160571424"; """ +
    """loguid:"{0x5ab27965,0x0,0x5b20a8c0,0x7d5707b6}"; origin:"192.168.32.91"; """ +
    """originsicname:"CN=GW91,O=Domain2_Server..cuggd3"; sequencenum:"1"; """ +
    """time:"1521645925"; version:"5"; product:"Identity Awareness"; """ +
    """src:"192.168.32.69"; src_machine_name:"yonatanad";]"""

  test("test_checkpoint.py case 0: two-field date form (%Y-%m-%d %H:%M:%S)") {
    val raw = s"<134>1 2018-03-21 17:25:25 MDS-72 CheckPoint 13752 - $cpBody"
    assert(rendered("checkpoint-parser()", raw, cpTemplate) ==
      "<CheckPoint><MDS-72><Mar 21 17:25:25>")
  }

  test("test_checkpoint.py case 1: ISO-T date form without zone") {
    val raw = s"<134>1 2018-03-21T17:25:25 MDS-72 CheckPoint 13752 - $cpBody"
    assert(rendered("checkpoint-parser()", raw, cpTemplate) ==
      "<CheckPoint><MDS-72><Mar 21 17:25:25>")
  }

  test("test_checkpoint.py case 2: ISO-T date with Z suffix") {
    val raw = "<134>1 2019-11-27T02:58:25Z ABDP-CPLOG01 CheckPoint 22103 - " +
      """[action:"Accept"; flags:"18692"; ifdir:"inbound"; ifname:"bond1.734"; """ +
      """origin:"10.4.150.2"; time:"1574823505"; version:"1"; dst:"124.156.190.9"; """ +
      """proto:"6"; rule:"8"; rule_name:"3G IP Pool Outgoing"; s_port:"64442"; """ +
      """service:"80"; service_id:"http"; src:"10.7.79.7"; ]"""
    assert(rendered("checkpoint-parser()", raw, cpTemplate) ==
      "<CheckPoint><ABDP-CPLOG01><Nov 27 02:58:25>")
  }

  test("test_checkpoint.py case 3: single-digit day renders space-padded " +
      "(TS_FMT_BSD)") {
    val raw = "<134>1 2020-01-02T14:04:50Z fwmgmt CheckPoint 16559 - " +
      """[action:"Accept"; flags:"411908"; ifdir:"inbound"; origin:"172.16.0.2"; """ +
      """sequencenum:"6"; time:"1577973890"; version:"5"; dst:"192.203.230.10"; """ +
      """inzone:"Internal"; layer_name:"Network"; match_id:"7"; proto:"17"; """ +
      """s_port:"55263"; service:"53"; service_id:"domain-udp"; src:"10.126.0.154"; ]"""
    assert(rendered("checkpoint-parser()", raw, cpTemplate) ==
      "<CheckPoint><fwmgmt><Jan  2 14:04:50>")
  }

  test("checkpoint kv capture: values land under the .checkpoint. prefix") {
    val raw = s"<134>1 2018-03-21 17:25:25 MDS-72 CheckPoint 13752 - $cpBody"
    assert(rendered("checkpoint-parser()", raw,
      "${.checkpoint.action}/${.checkpoint.origin}/${.checkpoint.src_machine_name}") ==
      "Update/192.168.32.91/yonatanad")
  }

  // ---- test_panos_parser.py --------------------------------------------------
  test("test_panos_parser.py case 0: SYSTEM branch") {
    val raw = "<12>Apr 14 16:48:54 paloalto.test.net 1,2020/04/14 16:48:54," +
      "unknown,SYSTEM,auth,0,2020/04/14 16:48:54,,auth-fail,,0,0,general," +
      "medium,failed authentication for user 'admin'. Reason: Invalid " +
      "username/password. From: 10.0.10.55.,1718,0x0,0,0,0,0,,paloalto"
    assert(rendered("panos-parser()", raw,
      "<${PROGRAM}><${.panos.type}><${.panos.eventid}><${.panos.device_name}>") ==
      "<paloalto_panos><SYSTEM><auth-fail><paloalto>")
  }

  test("test_panos_parser.py case 1: SYSTEM branch with trailing extras " +
      "is still accepted") {
    val raw = "<12>Apr 14 16:48:54 paloalto.test.net 1,2020/04/14 16:48:54," +
      "unknown,SYSTEM,auth,0,2020/04/14 16:48:54,,auth-fail,,0,0,general," +
      "medium,failed authentication for user 'admin'. Reason: Invalid " +
      "username/password. From: 10.0.10.55.,1718,0x0,0,0,0,0,,paloalto,foo,bar"
    assert(rendered("panos-parser()", raw,
      "<${PROGRAM}><${.panos.type}><${.panos.eventid}><${.panos.device_name}>") ==
      "<paloalto_panos><SYSTEM><auth-fail><paloalto>")
  }

  test("test_panos_parser.py case 2: CONFIG branch (15-column layout)") {
    val raw = "<14>Apr 14 16:54:18 paloalto.test.net 1,2020/04/14 16:54:18," +
      "unknown,CONFIG,0,0,2020/04/14 16:54:18,10.0.10.55,,set,admin,Web," +
      "Succeeded,deviceconfig system,127,0x0,0,0,0,0,,paloalto"
    assert(rendered("panos-parser()", raw,
      "<${PROGRAM}><${.panos.type}><${.panos.path}><${.panos.device_name}>") ==
      "<paloalto_panos><CONFIG><deviceconfig system><paloalto>")
  }

  test("test_panos_parser.py case 3: CONFIG custom-log layout (before/" +
      "after change detail inserted)") {
    val raw = "<14>Apr 14 16:54:18 paloalto.test.net 1,2020/04/14 16:54:18," +
      "unknown,CONFIG,0,0,2020/04/14 16:54:18,10.0.10.55,,set,admin,Web," +
      "Succeeded,deviceconfig system,before,after,127,0x0,0,0,0,0,,paloalto"
    assert(rendered("panos-parser()", raw,
      "<${PROGRAM}><${.panos.type}><${.panos.path}><${.panos.device_name}>") ==
      "<paloalto_panos><CONFIG><deviceconfig system><paloalto>")
  }
}
