package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** linux-kmsg-format goldens ported from the reference's own battery
  * (`/root/reference/modules/linux-kmsg-format/tests/
  * test_linux_format_kmsg.c`) + the file(format(linux-kmsg)) /
  * system() config wiring. */
class KmsgSpec extends GraftSuite {
  import spark.implicits._

  private def scan(record: String): Row = {
    val rows = Seq(record).toDF("value")
      .select(graft.functions.KmsgScan(col("value")).as("p"))
      .select("p.*").collect()
    assert(rows.length == 1)
    rows.head
  }
  private def pairs(r: Row): Map[String, String] =
    r.getMap[String, String](r.fieldIndex("pairs")).toMap

  test("single line record (test_kmsg_single_line)") {
    val body = "Linux version 3.5-trunk-amd64 (Debian 3.5.2-1~experimental.1) " +
      "(debian-kernel@lists.debian.org) (gcc version 4.6.3 (Debian 4.6.3-1) ) " +
      "#1 SMP Mon Aug 20 04:17:46 UTC 2012"
    val r = scan(s"5,2,1;$body\n")
    assert(r.getBoolean(r.fieldIndex("ok")))
    assert(r.getInt(r.fieldIndex("pri")) == 5)
    assert(r.getString(r.fieldIndex("msgid")) == "2")
    assert(r.getString(r.fieldIndex("message")) == body)
    assert(pairs(r)(".linux.timestamp") == "1")
    assert(r.getLong(r.fieldIndex("stamp_usec")) == 1L)
  }

  test("multi line record with SUBSYSTEM/DEVICE (test_kmsg_multi_line)") {
    val r = scan("6,202,98513;pci_root PNP0A08:00: host bridge window [io  0x0000-0x0cf7]\n" +
      " SUBSYSTEM=acpi\n DEVICE=+acpi:PNP0A08:00\n")
    assert(r.getInt(r.fieldIndex("pri")) == 6)
    assert(r.getString(r.fieldIndex("msgid")) == "202")
    assert(r.getString(r.fieldIndex("message")) ==
      "pci_root PNP0A08:00: host bridge window [io  0x0000-0x0cf7]")
    val p = pairs(r)
    assert(p(".linux.SUBSYSTEM") == "acpi")
    assert(p(".linux.DEVICE.type") == "acpi")
    assert(p(".linux.DEVICE.name") == "PNP0A08:00")
  }

  test("extra comma fields before ; are skipped (test_kmsg_with_extra_fields)") {
    val r = scan("5,2,0,some extra field,3,4,5;And this is the real message\n")
    assert(r.getInt(r.fieldIndex("pri")) == 5)
    assert(r.getString(r.fieldIndex("msgid")) == "2")
    assert(r.getString(r.fieldIndex("message")) == "And this is the real message")
  }

  test("device decomposition b/c/n/+/unknown (test_kmsg_device_parsing)") {
    val block = pairs(scan("6,202,98513;Fake message\n DEVICE=b12:1\n"))
    assert(block(".linux.DEVICE.type") == "block")
    assert(block(".linux.DEVICE.major") == "12")
    assert(block(".linux.DEVICE.minor") == "1")

    val char = pairs(scan("6,202,98513;Fake message\n DEVICE=c3:4\n"))
    assert(char(".linux.DEVICE.type") == "char")
    assert(char(".linux.DEVICE.major") == "3")
    assert(char(".linux.DEVICE.minor") == "4")

    val net = pairs(scan("6,202,98513;Fake message\n DEVICE=n8\n"))
    assert(net(".linux.DEVICE.type") == "netdev")
    assert(net(".linux.DEVICE.index") == "8")

    val unk = pairs(scan("6,202,98513;Fake message\n DEVICE=w12345\n"))
    assert(unk(".linux.DEVICE.type") == "<unknown>")
    assert(unk(".linux.DEVICE.name") == "w12345")
  }

  test("malformed header fails closed (msg_invalid_block)") {
    // "6,202;..." — the seq scan stops at ';' gracefully, the caller
    // skips it, then the timestamp scan hits 'F' and fails
    // (log_msg_parse_kmsg error path).
    val r = scan("6,202;Fake message\n DEVICE=b12:1\n")
    assert(!r.getBoolean(r.fieldIndex("ok")))
    assert(scan("garbage").getBoolean(0) == false)
    assert(scan("5,2,1").getBoolean(0) == false) // no ';' ever
    assert(scan("").getBoolean(0) == false)
  }

  test("non-digit inside seq aborts the msgid but parse continues") {
    // kmsg_parse_seq returns TRUE at the first non-digit; pos++ skips
    // that char, the timestamp parse picks up from there.
    val r = scan("5,2x123,7;msg\n")
    assert(r.getBoolean(r.fieldIndex("ok")))
    assert(r.isNullAt(r.fieldIndex("msgid")))
    assert(pairs(r)(".linux.timestamp") == "123")
  }

  test("bootUsec anchors stamp_usec (kmsg_to_absolute_time)") {
    val rows = Seq("6,1,500000;up\n").toDF("value")
      .select(graft.functions.KmsgScan(col("value"), bootUsec = 1700000000000000L).as("p"))
      .select("p.stamp_usec").collect()
    assert(rows.head.getLong(0) == 1700000000500000L)
  }

  test("parsedKmsg + system() config wiring end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("kmsg").toFile
    val f = new java.io.File(dir, "kmsg.log")
    val w = new java.io.PrintWriter(f)
    // one record per line in the spool file: continuation pairs are
    // rare in file capture; cover the single-line form + a reject
    w.println("6,100,1000;eth0: link up")
    w.println("13,101,2000;audit: rule added")
    w.println("not-kmsg garbage")
    w.close()

    val cfg = graft.config.ConfigParser.parse(
      s"""source s_sys { system(kmsg-file("${dir.getAbsolutePath}/*.log")); };
         |destination d { file("memory"); };
         |log { source(s_sys); destination(d); };
         |""".stripMargin)
    val (routes, listeners) = graft.config.ConfigCompiler
      .compileStreamingPipeline(cfg, spark, dir.getAbsolutePath + "/spool")
    assert(listeners.isEmpty)
    val q = routes.head.df.writeStream.format("memory")
      .queryName("kmsg_e2e").outputMode("append")
      .option("checkpointLocation", dir.getAbsolutePath + "/ckpt").start()
    try {
      q.processAllAvailable()
      val got = spark.table("kmsg_e2e")
        .select("program", "facility", "severity", "message").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
      assert(got == Set(
        ("kernel", 0, 6, "eth0: link up"),
        ("kernel", 1, 5, "audit: rule added")))
    } finally q.stop()
  }
}
