package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.PacctScan

/** pacct format decode vs `/root/reference/modules/pacctformat/
  * pacct-format.c` semantics, including its formatting quirks, plus the
  * pacct() scl source e2e (`scl/pacct/plugin.conf`). */
class PacctSpec extends GraftSuite {
  import spark.implicits._

  private def scan(bytes: Array[Byte]): (String, Map[String, String]) = {
    val rows = Seq(Tuple1(bytes)).toDF("rec")
      .select(PacctScan(col("rec")).as("p")).select("p.*").collect()
    val r = rows.head
    (r.getString(0),
      if (r.isNullAt(1)) null else r.getMap[String, String](1).toMap)
  }

  test("well-formed v3 record decodes every field with reference formatting") {
    val rec = PacctScan.build(flag = 0x12, tty = 1034, exitcode = 9,
      uid = 1000, gid = 100, pid = 4242, ppid = 1, btime = 5000,
      etime = 123f, comps = Seq(10, 20, 30, 40, 50, 60, 70, 80), comm = "bash")
    val (msg, p) = scan(rec)
    assert(msg == null)
    assert(p(".pacct.ac_flag") == "12")
    assert(p(".pacct.ac_tty") == "1034")
    assert(p(".pacct.ac_exitcode") == "9")
    assert(p(".pacct.ac_uid") == "1000")
    assert(p(".pacct.ac_gid") == "100")
    assert(p(".pacct.ac_pid") == "4242")
    assert(p(".pacct.ac_ppid") == "1")
    assert(p(".pacct.ac_btime") == "5000.00") // < 8192: comp decode is identity
    assert(p(".pacct.ac_etime") == "   123.00") // %9.2f space padding
    assert(p(".pacct.ac_utime") == "10.00")
    assert(p(".pacct.ac_stime") == "20.00")
    assert(p(".pacct.ac_mem") == "30")
    assert(p(".pacct.ac_io") == "40")
    assert(p(".pacct.ac_rw") == "50")
    assert(p(".pacct.ac_minflt") == "60")
    assert(p(".pacct.ac_majflt") == "70")
    assert(p(".pacct.ac_swaps") == "80")
    assert(p(".pacct.ac_comm") == "bash")
  }

  test("comp_t exponent decode (PACCT_CONVERT_COMP_TO_ULONG)") {
    // 0x2005: mantissa 5, exponent 1 → 5 << 3 = 40
    assert(PacctScan.compToLong(0x2005) == 40L)
    // exponent 7 → << 21
    assert(PacctScan.compToLong((7 << 13) | 3) == (3L << 21))
    // mantissa mask is 13 bits
    assert(PacctScan.compToLong(0x1fff) == 8191L)
  }

  test("btime goes through the comp decode — the reference's quirk") {
    val rec = PacctScan.build(0, 0, 0, 0, 0, 0, 0, btime = 0x2005, 0f,
      Seq(0, 0, 0, 0, 0, 0, 0, 0), "x")
    val (_, p) = scan(rec)
    assert(p(".pacct.ac_btime") == "40.00")
  }

  test("ac_comm with all 16 bytes used (no NUL) stops at ACCT_COMM") {
    val rec = PacctScan.build(0, 0, 0, 0, 0, 0, 0, 0, 0f,
      Seq(0, 0, 0, 0, 0, 0, 0, 0), "abcdefghijklmnopQRS")
    val (_, p) = scan(rec)
    assert(p(".pacct.ac_comm") == "abcdefghijklmnop")
  }

  test("short record and wrong version produce the reference error text") {
    val (shortMsg, shortP) = scan(Array.fill[Byte](10)(0))
    assert(shortMsg == "Error parsing process accounting record, record too " +
      "small; rec_size='10', expected_size='64'")
    assert(shortP == null)

    val v2 = PacctScan.build(0, 0, 0, 0, 0, 0, 0, 0, 0f,
      Seq(0, 0, 0, 0, 0, 0, 0, 0), "x")
    v2(1) = 2
    val (verMsg, verP) = scan(v2)
    assert(verMsg == "Error parsing process accounting record, only the v3 " +
      "format is supported; version='2'")
    assert(verP == null)
  }

  test("pacct() source e2e: binary file → records stream") {
    val dir = java.nio.file.Files.createTempDirectory("pacct").toFile
    val f = new java.io.File(dir, "pacct")
    val out = new java.io.FileOutputStream(f)
    out.write(PacctScan.build(1, 0, 0, 1000, 100, 10, 1, 100, 1f,
      Seq(1, 2, 3, 4, 5, 6, 7, 8), "cron"))
    out.write(PacctScan.build(2, 0, 0, 1001, 100, 11, 1, 200, 2f,
      Seq(1, 2, 3, 4, 5, 6, 7, 8), "sshd"))
    out.close()

    val cfg = graft.config.ConfigParser.parse(
      s"""source s_acct { pacct(file("${dir.getAbsolutePath}/pacct*")); };
         |destination d { file("memory"); };
         |log { source(s_acct); destination(d); };
         |""".stripMargin)
    val (routes, _) = graft.config.ConfigCompiler
      .compileStreamingPipeline(cfg, spark, dir.getAbsolutePath + "/spool")
    val q = routes.head.df.writeStream.format("memory")
      .queryName("pacct_e2e").outputMode("append")
      .option("checkpointLocation", dir.getAbsolutePath + "/ckpt").start()
    try {
      q.processAllAvailable()
      val got = spark.table("pacct_e2e")
        .select(element_at(col("values"), ".pacct.ac_comm"),
          element_at(col("values"), ".pacct.ac_uid"), col("tags")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getSeq[String](2))).toSet
      assert(got == Set(("cron", "1000", Seq(".pacct")),
        ("sshd", "1001", Seq(".pacct"))))
    } finally q.stop()
  }
}
