package graft

import graft.streaming.Sources

/** Port of `/root/reference/lib/logproto/tests/test-text-server.c` —
  * the DEFAULT newline-framed server's fetch semantics, driven through
  * the engine's encoded-file line source (the batch analog of
  * logproto-text-server). The mock-transport chunking/IO-error cases
  * (multi_read, io_error, the accumulator API) are the streaming
  * buffer's concern — covered by FramingSpec and the multiline
  * batteries; what this battery pins is the MESSAGE BOUNDARY contract:
  * which byte payload yields which message sequence.
  */
class TextServerBatterySpec extends GraftSuite {

  private def linesOf(bytes: Array[Byte], charset: String = "UTF-8"): Seq[String] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-textsrv")
    val f = dir.resolve("in.log")
    java.nio.file.Files.write(f, bytes)
    Sources.fileLinesEncoded(spark, f.toString, charset)
      .select("value").collect().map(_.getString(0)).toSeq
  }

  test("empty lines are messages; trailing newline is not (test_log_proto_text_server_no_encoding:80-119)") {
    // the C battery fetches "01234567", "", "01234567", "" ... from a
    // payload with blank lines: every interior \n\n boundary is an
    // EMPTY message, and the single trailing newline closes the last
    // line without emitting an extra empty
    assert(linesOf("01234567\n\n01234567\n\n01234567\n\n01234567\n01234567\n".getBytes("UTF-8"))
      == Seq("01234567", "", "01234567", "", "01234567", "", "01234567", "01234567"))
    // an empty payload yields no messages at all
    assert(linesOf(Array.emptyByteArray) == Seq.empty)
    // a payload of ONE newline is one empty message
    assert(linesOf("\n".getBytes("UTF-8")) == Seq(""))
  }

  test("no EOL before EOF: the partial last line IS a message (:127-142)") {
    assert(linesOf("01234567".getBytes("UTF-8")) == Seq("01234567"))
    assert(linesOf("01234\n567\n890\n".getBytes("UTF-8")) == Seq("01234", "567", "890"))
    assert(linesOf("foobar\nfoobaz".getBytes("UTF-8")) == Seq("foobar", "foobaz"))
  }

  test("partial multi-byte char at EOF is DROPPED, not replaced (:177-193)") {
    // a lone utf-8 lead byte: the reference drops the conversion
    // leftovers at EOF ("EOF read on a channel with leftovers from
    // previous character conversion, dropping input") — no U+FFFD
    assert(linesOf(Array(0xc3.toByte)) == Seq.empty)
    // a complete line followed by a dangling lead byte keeps the line
    // and drops only the tail
    assert(linesOf("foo\n".getBytes("UTF-8") :+ 0xc3.toByte) == Seq("foo"))
  }

  test("utf-8 / iso-8859-2 / ucs-4 payloads decode to the same line (:195-254)") {
    val word = "árvíztűrőtükörfúrógép"
    assert(linesOf((word + "\n").getBytes("UTF-8")) == Seq(word))
    assert(linesOf((word + "\n").getBytes(
      java.nio.charset.Charset.forName("ISO-8859-2")), "ISO-8859-2") == Seq(word))
    // the C battery's exact UCS-4 byte string (big-endian 32-bit)
    val ucs4 = (word + "\n").codePoints().toArray.flatMap { cp =>
      Array[Byte]((cp >> 24).toByte, (cp >> 16).toByte, (cp >> 8).toByte, cp.toByte)
    }
    assert(linesOf(ucs4, "UTF-32BE") == Seq(word))
  }

  test("invalid encoding name fails loudly (:256-273)") {
    intercept[Exception] {
      linesOf("x\n".getBytes("UTF-8"), "never-ever-is-going-to-be-such-an-encoding")
    }
  }
}
