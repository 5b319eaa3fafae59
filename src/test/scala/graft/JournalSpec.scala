package graft

import graft.functions.JournalExportScan
import org.apache.spark.sql.functions._

/** systemd-journal() source: Journal Export Format decode + the
  * journal-reader.c field→macro mapping (see Sources.journalEntries). */
class JournalSpec extends GraftSuite {

  private def scanOne(bytes: Array[Byte]): Seq[Map[String, String]] = {
    import spark.implicits._
    Seq(bytes).toDF("content")
      .select(explode(JournalExportScan(col("content"))).as("f"))
      .collect().map(_.getMap[String, String](0).toMap).toSeq
  }

  test("export scan: text fields, entry separation, last-wins duplicates") {
    val bytes = JournalExportScan.build(Seq(
      Seq("MESSAGE" -> "first", "KEY" -> "old", "KEY" -> "new"),
      Seq("MESSAGE" -> "second", "_PID" -> "42")))
    val es = scanOne(bytes)
    assert(es.length == 2, es)
    assert(es(0) == Map("MESSAGE" -> "first", "KEY" -> "new"), es(0))
    assert(es(1) == Map("MESSAGE" -> "second", "_PID" -> "42"), es(1))
  }

  test("export scan: binary field carries newlines and any bytes") {
    val multi = "line one\nline two\nand=equals"
    val bytes = JournalExportScan.build(Seq(
      Seq("MESSAGE" -> multi, "PLAIN" -> "x")))
    val es = scanOne(bytes)
    assert(es == Seq(Map("MESSAGE" -> multi, "PLAIN" -> "x")), es)
  }

  test("export scan: truncated binary field fails closed, prior entries kept") {
    val good = JournalExportScan.build(Seq(Seq("MESSAGE" -> "ok")))
    // claims 1000 payload bytes, supplies 3
    val bad = "BROKEN\n".getBytes ++
      Array[Byte](0xe8.toByte, 0x03, 0, 0, 0, 0, 0, 0) ++ "abc".getBytes
    val es = scanOne(good ++ bad)
    assert(es == Seq(Map("MESSAGE" -> "ok")), es)
  }

  test("export scan: EOF without trailing blank line still ends the entry") {
    val es = scanOne("MESSAGE=tail\nKEY=v\n".getBytes)
    assert(es == Seq(Map("MESSAGE" -> "tail", "KEY" -> "v")), es)
  }

  test("systemd-journal() config e2e: macro mapping, default pri, prefix") {
    // journal-reader.c:156-238 — MESSAGE/_HOSTNAME/_PID macros,
    // SYSLOG_FACILITY/PRIORITY overwrite DEFAULT_PRIO (local0.notice =
    // 16/5), program = SYSLOG_IDENTIFIER else _COMM, all fields also
    // land under prefix() in values
    val dir = java.nio.file.Files.createTempDirectory("graft-jrnl-in").toString
    java.nio.file.Files.write(java.nio.file.Path.of(dir, "cap.export"),
      JournalExportScan.build(Seq(
        Seq("MESSAGE" -> "full entry", "_HOSTNAME" -> "web1",
          "_PID" -> "77", "SYSLOG_IDENTIFIER" -> "nginx",
          "_COMM" -> "nginx-bin", "SYSLOG_FACILITY" -> "3",
          "PRIORITY" -> "6", "__REALTIME_TIMESTAMP" -> "1700000000000000",
          "CUSTOM" -> "cv"),
        Seq("MESSAGE" -> "bare entry", "_COMM" -> "cron"))))
    val cfg = config.ConfigParser.parse(s"""
      source s_j { systemd-journal(journal-file("$dir/*.export")); };
      destination d { file("/out/j.log"); };
      log { source(s_j); destination(d); };
    """)
    val (routes, _) = config.ConfigCompiler.compileStreamingPipeline(cfg, spark,
      java.nio.file.Files.createTempDirectory("graft-jrnl-sp").toString)
    val cp = java.nio.file.Files.createTempDirectory("graft-jrnl-cp").toString
    val q = routes.head.df.writeStream.format("memory").queryName("jrnl_out")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    val rows = spark.table("jrnl_out")
      .orderBy("message")
      .select(col("message"), col("host"), col("pid"), col("program"),
        col("facility"), col("severity"),
        unix_micros(col("ts")).as("us"),
        element_at(col("values"), ".journald.CUSTOM").as("cv"),
        element_at(col("values"), ".journald.MESSAGE").as("vm"))
      .collect()
    assert(rows.length == 2, rows.mkString(";"))
    val bare = rows(0)
    assert(bare.getString(0) == "bare entry" && bare.isNullAt(1) &&
      bare.isNullAt(2) && bare.getString(3) == "cron" &&
      bare.getInt(4) == 16 && bare.getInt(5) == 5, bare)
    val full = rows(1)
    assert(full.getString(0) == "full entry" && full.getString(1) == "web1" &&
      full.getString(2) == "77" && full.getString(3) == "nginx" &&
      full.getInt(4) == 3 && full.getInt(5) == 6 &&
      full.getLong(6) == 1700000000000000L &&
      full.getString(7) == "cv" && full.getString(8) == "full entry", full)
  }

  test("systemd-journal(): max-field-size truncation and prefix override") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jrnl2-in").toString
    java.nio.file.Files.write(java.nio.file.Path.of(dir, "cap.export"),
      JournalExportScan.build(Seq(
        Seq("MESSAGE" -> "m", "BIG" -> ("x" * 50)))))
    val df = graft.streaming.Sources.journalEntries(spark, s"$dir/*.export",
      prefix = "jd.", maxFieldSize = 10)
    val cp = java.nio.file.Files.createTempDirectory("graft-jrnl2-cp").toString
    val q = df.writeStream.format("memory").queryName("jrnl2_out")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    val r = spark.table("jrnl2_out")
      .select(element_at(col("values"), "jd.BIG")).head()
    assert(r.getString(0) == "x" * 10, r)
  }
}
