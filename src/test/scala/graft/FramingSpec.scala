package graft

import graft.functions.FramedRecords
import org.apache.spark.sql.functions._

/** RFC6587 octet-counted framing edge cases
  * (logproto-framed-server.c). */
class FramingSpec extends GraftSuite {
  import spark.implicits._

  private def frames(payload: String, maxMsgSize: Int = 65536,
      trim: Boolean = true): Seq[String] =
    Seq(payload).toDF("s")
      .select(FramedRecords(col("s"), maxMsgSize, trim).as("r"))
      .head.getSeq[String](0)

  test("well-formed frames split on byte counts") {
    assert(frames("5 hello6 world!") == Seq("hello", "world!"))
    assert(frames("3 a b2 cd") == Seq("a b", "cd"))
    // frame bodies may contain digits and spaces
    assert(frames("4 12 34 5678") == Seq("12 3", "5678"))
  }

  test("octet counts are bytes, not characters") {
    // 'é' is 2 bytes in UTF-8: a 3-byte frame holds 'é' + '!'
    assert(frames("3 é!2 ok") == Seq("é!", "ok"))
  }

  test("trailing partial frame is dropped") {
    assert(frames("5 hello3 ab") == Seq("hello")) // short body
    assert(frames("5 hello12") == Seq("hello")) // header without space
    assert(frames("5 hello12 ") == Seq("hello")) // body missing entirely
  }

  test("invalid header aborts like LPS_ERROR, keeping prior frames") {
    assert(frames("5 helloxx 4 oops") == Seq("hello"))
    assert(frames("xx") == Seq())
    // more than 10 header digits is invalid (MAX_FRAME_LEN_DIGITS)
    assert(frames("99999999999 x") == Seq())
  }

  test("oversized frames: trimmed when trim_large_messages, else abort") {
    assert(frames("10 0123456789", maxMsgSize = 4) == Seq("0123"))
    assert(frames("10 01234567893 abc", maxMsgSize = 4) == Seq("0123", "abc"))
    assert(frames("10 01234567893 abc", maxMsgSize = 4, trim = false) == Seq())
    assert(frames("3 abc10 0123456789", maxMsgSize = 4, trim = false) == Seq("abc"))
  }

  test("reference simple-messages battery (test-framed-server.c:33-66)") {
    assert(frames("32 0123456789ABCDEF0123456789ABCDEF", maxMsgSize = 32) ==
      Seq("0123456789ABCDEF0123456789ABCDEF"))
    // frame bodies may contain newlines
    assert(frames("10 01234567\n\n", maxMsgSize = 32) == Seq("01234567\n\n"))
    // octet counts are BYTES of the utf8 text (30 bytes = 21 chars)
    assert(frames("30 árvíztűrőtükörfúrógép", maxMsgSize = 32) ==
      Seq("árvíztűrőtükörfúrógép"))
  }

  test("trim cycles across frames (test-framed-server.c:130-204)") {
    // multiple cycles: normal / trimmed-multibuffer / normal
    assert(frames("1 07 1abcdef1 2", maxMsgSize = 2) == Seq("0", "1a", "2"))
    // trimmed frame's tail ends right before the next frame header
    assert(frames("3 01\n15 1abcdefg12345674 2abc", maxMsgSize = 8) ==
      Seq("01\n", "1abcdefg", "2abc"))
    // small + big in one stream read
    assert(frames("2 ab16 0123456789ABCDEF", maxMsgSize = 10) ==
      Seq("ab", "0123456789"))
  }

  test("proxy protocol v1 header: reference test battery") {
    import graft.functions.ProxyProtoHeader
    // (line, expectedValid) pairs ported verbatim from
    // /root/reference/lib/logproto/tests/test-proxy-proto.c:42-85
    val battery = Seq(
      ("PROXY UNKNOWN\r\n", true),
      ("PROXY UNKNOWN extra ignored parameters\r\n", true),
      ("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444\r\n", true),
      ("PROXY TCP6 ::1 ::2 3333 4444\r\n", true),
      ("PROXY UNKNOWN\n", true),
      ("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444\n", true),
      ("PROXY UNKNOWN\r", true),
      ("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444\r", true),
      ("PROXY\r\n", false),
      ("PROXY TCP4\r\n", false),
      ("PROXY TCP4 1.1.1.1\r\n", false),
      ("PROXY TCP4 1.1.1.1 2.2.2.2\r\n", false),
      ("PROXY TCP4 1.1.1.1 2.2.2.2 3333\r\n", false),
      ("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444 extra param\r\n", true),
      ("PROXY TCP4  1.1.1.1 2.2.2.2 3333 4444\r\n", true),
      ("PROXY TCP4 1.1.1.1  2.2.2.2 3333 4444\r\n", true),
      ("PROXY TCP4 1.1.1.1 2.2.2.2  3333 4444\r\n", true),
      ("PROXY TCP4 1.1.1.1 2.2.2.2 3333  4444\r\n", true),
      ("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444 \r\n", true),
      ("PROXY  TCP4 1.1.1.1 2.2.2.2 3333 4444\r\n", false),
      ("PROXY TCP6 1.1.1.1 2.2.2.2 3333 4444\r\n", true),
      ("PROXY TCP4 ::1 ::2 3333 4444\r\n", true),
      ("PROXY TCP4 1.1.1 2.2.2.2 3333 4444\r\n", true),
      ("PROXY TCP4 1.1.1.1.1 2.2.2.2 3333 4444\r\n", true),
      ("PROXY TCP6 ::1::0 ::1 3333 4444\r\n", true),
      ("PROXY TCP4 1.1.1.1 2.2.2.2 33333 0\r\n", true),
      ("PROXY TCP4 1.1.1.1 2.2.2.2 33333 -1\r\n", true),
      ("PROXY TCP4 1.1.1.1 2.2.2.2 33333 65536\r\n", true),
      ("PROXY TCP3 1.1.1.1 2.2.2.2 3333 4444\r\n", false),
      ("PROXY TCP4 " + "pad" * 51, false)) // > 216 bytes
    val out = battery.map(_._1).toDF("line")
      .select(ProxyProtoHeader(col("line")).as("h"))
      .select("h.valid").collect().map(_.getBoolean(0)).toSeq
    battery.zip(out).foreach { case ((line, expected), got) =>
      assert(got == expected, s"'${line.trim}' expected valid=$expected")
    }
  }

  test("proxy protocol v1 field capture and payload strip") {
    import graft.functions.ProxyProtoHeader
    val h = Seq("PROXY TCP4 192.168.0.1 10.0.0.1 33333  443\r")
      .toDF("line").select(ProxyProtoHeader(col("line")).as("h")).head.getStruct(0)
    assert((h.getBoolean(0), h.getBoolean(1), h.getInt(2), h.getString(3),
      h.getString(4), h.getInt(5), h.getInt(6)) ==
      (true, false, 4, "192.168.0.1", "10.0.0.1", 33333, 443))
    // whole-payload strip: handshake line off, body lines keep aux pairs
    val payload = "PROXY TCP6 ::1 ::2 10 20\nline one\nline two"
    val row = Seq(payload).toDF("p")
      .select(ProxyProtoHeader.stripPayload(col("p")).as("s"))
      .select(col("s.body"),
        ProxyProtoHeader.nvPairs(col("s.info")).as("nv"))
      .head
    assert(row.getString(0) == "line one\nline two")
    val nv = row.getMap[String, String](1)
    assert(nv("PROXIED_SRCIP") == "::1" && nv("PROXIED_DSTPORT") == "20" &&
      nv("PROXIED_IP_VERSION") == "6")
    // PROXY UNKNOWN: valid handshake, but no aux pairs (early return)
    val unk = Seq("PROXY UNKNOWN\nmsg").toDF("p")
      .select(ProxyProtoHeader.stripPayload(col("p")).as("s"))
      .select(col("s.info.valid"), ProxyProtoHeader.nvPairs(col("s.info")).as("nv"))
      .head
    assert(unk.getBoolean(0) && unk.getMap[String, String](1).isEmpty)
  }

  test("file-based framed source emits records with lineage") {
    val dir = java.nio.file.Files.createTempDirectory("framed")
    java.nio.file.Files.write(dir.resolve("a.log"),
      "5 <13>h4 test".getBytes("UTF-8"))
    val out = graft.streaming.Sources.framedRecords(spark, dir.toString + "/*.log")
    assert(out.select("record").collect().map(_.getString(0)).toSeq ==
      Seq("<13>h", "test"))
    assert(out.select("source_file").head.getString(0).endsWith("a.log"))
  }
}
