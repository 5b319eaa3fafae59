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
