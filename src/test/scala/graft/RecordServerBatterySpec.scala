package graft

import graft.streaming.Sources

/** Port of `/root/reference/lib/logproto/tests/test-record-server.c` —
  * the pad-size() record server in its binary, padded, and
  * padded-with-encoding forms. The binary form is the pacct scan
  * (verbatim chunks, PacctSpec); this battery pins the PADDED forms.
  */
class RecordServerBatterySpec extends GraftSuite {

  private def write(bytes: Array[Byte]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-recsrv")
    val f = dir.resolve("in.bin")
    java.nio.file.Files.write(f, bytes)
    f.toString
  }

  private def padded(bytes: Array[Byte], size: Int,
      charset: Option[String] = None): Seq[String] =
    Sources.paddedRecords(spark, write(bytes), size, charset)
      .select("value").collect().map(_.getString(0)).toSeq

  // the C battery's shared payload: full record, newline-padded,
  // NUL-padded records of size 32
  private val fullRec = "0123456789ABCDEF0123456789ABCDEF".getBytes("UTF-8")
  private val nlPad = ("01234567" + "\n" * 24).getBytes("UTF-8")
  private val nulPad = "01234567".getBytes("UTF-8") ++ Array.fill[Byte](24)(0)

  test("padded records: NUL C-string cut + trailing whitespace strip; short tail skipped (test_log_proto_padded_record_server_no_encoding:67-105)") {
    val word = "árvíztűrőtükörfúrógép" // 21 chars, 26 utf-8 bytes
    val utf8Rec = {
      val b = (word + "\n\n").getBytes("UTF-8")
      b ++ Array.fill[Byte](32 - b.length)(0)
    }
    val iso2Rec = {
      val b = (word + "\n" * 11).getBytes(
        java.nio.charset.Charset.forName("ISO-8859-2"))
      assert(b.length == 32)
      b
    }
    // ucs4 record: starts with a NUL byte -> C-string read is ""
    val ucs4Rec = "árvíztűr".codePoints().toArray.flatMap { cp =>
      Array[Byte]((cp >> 24).toByte, (cp >> 16).toByte, (cp >> 8).toByte, cp.toByte)
    }
    assert(ucs4Rec.length == 32)
    val payload = fullRec ++ nlPad ++ nulPad ++ utf8Rec ++ ucs4Rec ++
      "01234".getBytes("UTF-8") // short tail -> LPS_ERROR; batch skips
    val rows = padded(payload, 32)
    assert(rows(0) == "0123456789ABCDEF0123456789ABCDEF")
    assert(rows(1) == "01234567") // newline padding strips
    assert(rows(2) == "01234567") // NUL cut
    assert(rows(3) == word)       // utf8 passes through, \n\n + NULs strip
    assert(rows(4) == "")         // leading NUL -> empty message
    assert(rows.length == 5)      // the 5-byte tail never becomes a record
  }

  test("padded records with ucs-4 encoding: raw-byte boundaries, decoded trailing newline strips (:107-129)") {
    def ucs4(s: String): Array[Byte] = s.codePoints().toArray.flatMap { cp =>
      Array[Byte]((cp >> 24).toByte, (cp >> 16).toByte, (cp >> 8).toByte, cp.toByte)
    }
    // record 1: 8 chars terminated by record size; record 2: 7 chars +
    // an encoded newline (strips as trailing whitespace)
    val payload = ucs4("árvíztűr") ++ ucs4("árvíztű\n") ++
      "01234".getBytes("UTF-8")
    val rows = padded(payload, 32, Some("UTF-32BE"))
    assert(rows == Seq("árvíztűr", "árvíztű"))
  }

  test("padded record that cannot convert in its entirety fails loudly (:131-147)") {
    // 31-byte record size, ucs-4: the last code point is truncated —
    // the reference's LPS_ERROR "Byte sequence too short, cannot
    // convert an individual frame in its entirety"
    val payload = "árvíztűr".codePoints().toArray.flatMap { cp =>
      Array[Byte]((cp >> 24).toByte, (cp >> 16).toByte, (cp >> 8).toByte, cp.toByte)
    }.take(31)
    val e = intercept[Exception] {
      padded(payload, 31, Some("UTF-32BE"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains(
      "Byte sequence too short, cannot convert an individual frame in its entirety")), e.getMessage)
  }

  test("padded records with iso-8859-2: utf8 expansion past the record size is fine (:149-176)") {
    val word = "árvíztűrőtükörfúrógép" + "é" * 11 // 32 iso-8859-2 bytes
    val payload = word.getBytes(java.nio.charset.Charset.forName("ISO-8859-2"))
    assert(payload.length == 32)
    assert(padded(payload, 32, Some("ISO-8859-2")) == Seq(word))
  }

  test("charset decode FINISHES: stateful shift charsets emit all output when input is fully consumed") {
    import graft.functions.CharsetDecode
    // ISO-2022-JP with the closing shift-back: full decode
    val full = Array[Byte](0x1b, 0x24, 0x42, 0x24, 0x22, 0x24, 0x24,
      0x1b, 0x28, 0x42)
    assert(CharsetDecode.decode(full, "ISO-2022-JP").toString == "あい")
    // no trailing shift-back — every byte still CONSUMED, the decoder is
    // left mid-shift-state; the finish pass (endOfInput=true + flush)
    // must not lose output
    val noClose = Array[Byte](0x1b, 0x24, 0x42, 0x24, 0x22, 0x24, 0x24)
    assert(CharsetDecode.decode(noClose, "ISO-2022-JP").toString == "あい")
    // a trailing INCOMPLETE escape still drops silently in stream mode
    val partial = full ++ Array[Byte](0x1b, 0x24)
    assert(CharsetDecode.decode(partial, "ISO-2022-JP").toString == "あい")
    // ...and still errors in frame mode
    intercept[IllegalArgumentException] {
      CharsetDecode.decode(partial, "ISO-2022-JP", frame = true)
    }
  }

  test("pad-size(N) encoding(cs) compose through the config front end") {
    val word = "árvíztűrőtükörfúrógép" + "é" * 11
    val path = write(word.getBytes(
      java.nio.charset.Charset.forName("ISO-8859-2")))
    val cfg = graft.config.ConfigParser.parse(s"""
      source s { file("$path" pad-size(32) encoding(iso-8859-2)
        flags(no-parse)); };
      destination d { file("/out"); };
      log { source(s); destination(d); };
    """)
    val (routes, ls) = graft.config.ConfigCompiler.compileStreamingPipeline(
      cfg, spark, java.nio.file.Files.createTempDirectory("graft-sp").toString)
    try {
      val rows = routes.head.df.select("message").collect().map(_.getString(0))
      assert(rows.toSeq == Seq(word))
    } finally ls.values.foreach(_.stop())
  }
}
