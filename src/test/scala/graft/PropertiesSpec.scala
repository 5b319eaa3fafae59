package graft

import graft.functions.{FormatJson, JsonFlatten}
import graft.operators.{Parsers, ValuePairs}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based round trips (SURVEY §5: "format-json ∘ json-parser =
  * id, implode ∘ explode = id"). ScalaCheck drives generators; each
  * property evaluates a batch of cases through one Spark job.
  */
class PropertiesSpec extends GraftSuite {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  private val safeKey: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(8))
  private val safeVal: Gen[String] = Gen.listOf(
    Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const(' '), 1 -> Gen.oneOf('"', '\\', 'é')))
    .map(_.mkString.take(20))

  test("JsonFlatten(FormatJson(m)) == m for flat maps") {
    val gen = Gen.mapOf(Gen.zip(safeKey, safeVal)).map(_.take(6))
    check(Prop.forAll(gen) { m =>
      val df = Seq(1).toDF("x").select(
        FormatJson(map(m.toSeq.flatMap(kv => Seq(lit(kv._1), lit(kv._2))): _*)).as("j"))
      val back = df.select(JsonFlatten(col("j")).as("m")).head.getMap[String, String](0)
      back == m
    })
  }

  test("formatFlatJson parses back via JsonFlatten (sorted keys)") {
    val gen = Gen.mapOf(Gen.zip(safeKey, safeVal)).map(_.take(5)).suchThat(_.nonEmpty)
    check(Prop.forAll(gen) { m =>
      val df = Seq(1).toDF("x").select(
        ValuePairs.formatFlatJson(map(m.toSeq.flatMap(kv => Seq(lit(kv._1), lit(kv._2))): _*)).as("j"))
      df.select(JsonFlatten(col("j")).as("m")).head.getMap[String, String](0) == m
    })
  }

  test("kvParse recovers generated pairs") {
    val gen = Gen.mapOf(Gen.zip(safeKey, safeVal.map(_.replace("\\", "")))).map(_.take(5))
      .suchThat(_.nonEmpty)
    check(Prop.forAll(gen) { m =>
      val line = m.toSeq.map { case (k, v) => s"""$k="${v.replace("\"", "\\\"")}"""" }
        .mkString(" ")
      val back = Seq(line).toDF("s").select(Parsers.kvParse(col("s")).as("m"))
        .head.getMap[String, String](0)
      back == m
    })
  }

  test("syslog format ∘ parse = id on header fields") {
    val host = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))
    val prog = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(10))
    val gen = Gen.zip(host, prog, Gen.choose(0, 191), Gen.choose(1, 99999),
      Gen.alphaNumStr.map(_.take(30)))
    check(Prop.forAll(gen) { case (h, p, pri, pid, msg) =>
      val line = s"<$pri>Jun 12 10:20:30 $h $p[$pid]: $msg"
      val r = Seq(line).toDF("s")
        .select(graft.functions.GraftFunctions.parse_syslog(col("s"), 2024).as("p"))
        .select(col("p.host"), col("p.program"), col("p.pid"),
          col("p.facility"), col("p.severity"), col("p.message")).head
      r.getString(0) == h && r.getString(1) == p && r.getString(2) == pid.toString &&
        r.getInt(3) == pri / 8 && r.getInt(4) == pri % 8 && r.getString(5) == msg
    })
  }

  test("cidr matching agrees with manual prefix check (v4 + v6)") {
    import graft.functions.CidrMatch
    val ipv4 = Gen.listOfN(4, Gen.choose(0, 255)).map(_.mkString("."))
    check(Prop.forAll(ipv4, Gen.choose(0, 32)) { (ip, bits) =>
      val net = ip // network == address → always a match at any prefix
      val df = Seq(ip).toDS().toDF("ip")
      df.select(graft.functions.GraftFunctions.cidr_match(s"$net/$bits", col("ip")).as("m"))
        .head.getBoolean(0)
    })
    val hexGroup = Gen.listOfN(4, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
    val ipv6 = Gen.listOfN(8, hexGroup).map(_.mkString(":"))
    check(Prop.forAll(ipv6) { ip =>
      val df = Seq(ip).toDS().toDF("ip")
      // /128 must require full equality; flipping the last group breaks it
      val full = df.select(graft.functions.GraftFunctions.cidr_match(s"$ip/128", col("ip")).as("m"))
        .head.getBoolean(0)
      val flipped = ip.dropRight(4) + (if (ip.endsWith("0000")) "0001" else "0000")
      val nomatch = df.select(graft.functions.GraftFunctions.cidr_match(s"$flipped/128", col("ip")).as("m"))
        .head.getBoolean(0)
      full && !nomatch
    })
  }

  test("framed_records ∘ octet-encode = id (RFC6587 round trip)") {
    val frameGen: Gen[String] = Gen.listOf(
      Gen.frequency(6 -> Gen.alphaNumChar, 1 -> Gen.const(' '),
        1 -> Gen.numChar, 1 -> Gen.const('\u00e9')))
      .map(_.mkString.take(40))
    val gen = Gen.listOf(frameGen).map(_.take(8))
    check(Prop.forAll(gen) { frames =>
      val payload = frames.map { f =>
        s"${f.getBytes("UTF-8").length} $f"
      }.mkString
      val out = Seq(payload).toDF("s")
        .select(graft.functions.FramedRecords(col("s"), 65536, true).as("r"))
        .head.getSeq[String](0)
      out == frames
    })
  }

  test("hot-path scanners never throw on arbitrary input") {
    val junk: Gen[String] = Gen.listOf(Gen.frequency(
      6 -> Gen.choose(' ', '~'),
      2 -> Gen.choose(0.toChar, 0x1F.toChar),
      1 -> Gen.oneOf('\u00e9', '\u4e2d', '<', '>', '[', ']', '@', '"'),
      1 -> Gen.numChar)).map(_.mkString.take(300))
    check(Prop.forAll(junk) { s =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      graft.functions.SyslogLineParser.parse(s, 2024) != null &&
      graft.functions.KvScan.scan(u, '=', "", false) != null &&
      graft.functions.FramedRecords.split(u, 1024, true) != null &&
      graft.functions.Sketches.rollingFingerprint(u, 8, 4) != null &&
      graft.functions.ProxyProtoHeader.parse(u) != null &&
      graft.pipeline.MediaHeaders.decode(s.getBytes("UTF-8")) != null &&
      graft.functions.KmsgScan.scan(u, 0L) != null &&
      graft.functions.PacctScan.scan(s.getBytes("UTF-8")) != null &&
      graft.functions.BinaryChunks.chunks(s.getBytes("UTF-8"), 64) != null
    })
  }

  test("kmsg scan fails closed, never throws, on hostile headers") {
    val junk: Gen[String] = Gen.listOf(Gen.frequency(
      4 -> Gen.numChar,
      2 -> Gen.oneOf(',', ';', '\n', '=', ' '),
      2 -> Gen.choose(' ', '~'))).map(_.mkString.take(200))
    check(Prop.forAll(junk) { s =>
      val r = graft.functions.KmsgScan.scan(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 0L)
      // ok=false rows carry no partial data beyond the struct contract
      r != null && (r.getBoolean(0) || r.isNullAt(5))
    })
  }

  test("pacct scan on arbitrary 64-byte records decodes without throwing") {
    val rec: Gen[Array[Byte]] =
      Gen.containerOfN[Array, Byte](64, Gen.choose(Byte.MinValue, Byte.MaxValue))
    check(Prop.forAll(rec) { b =>
      b(1) = 3 // force v3 so the field decode path runs
      val r = graft.functions.PacctScan.scan(b)
      r != null && r.isNullAt(0) && !r.isNullAt(1)
    })
  }

  test("vendor parsers never throw on arbitrary lines (incl. hostile pri)") {
    // a poison line must not fail a 100 TB scan: ANSI casts are guarded
    // (e.g. an oversized <999...9> pri would overflow an unbounded cast)
    val junk: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.choose(' ', '~'),
      1 -> Gen.oneOf('<', '>', ':', '%', ',', '|', '='),
      1 -> Gen.numChar)).map(_.mkString.take(200))
    val hostile = Gen.oneOf(
      junk,
      junk.map(s => "<99999999999999999999>" + s),
      junk.map(s => "<189>" + s + ": %"),
      junk.map(s => "PROXY TCP4 " + s),
      junk.map(s => "RIFF1234WAVE" + s))
    check(Prop.forAll(Gen.listOf(hostile).map(_.take(5))) { lines =>
      val df = lines.toDF("message")
      graft.operators.VendorParsers.cisco(df).count() == lines.size &&
      graft.operators.VendorParsers.checkpoint(df).count() == lines.size &&
      graft.operators.VendorParsers.panos(df).count() == lines.size
    })
  }

  test("round-3 vendor parsers never throw on arbitrary lines") {
    val junk: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.choose(' ', '~'),
      1 -> Gen.oneOf('=', ';', ':', '"', '[', ']', ''),
      1 -> Gen.numChar)).map(_.mkString.take(200))
    val hostile = Gen.oneOf(
      junk,
      junk.map(s => "PROTO=" + s),
      junk.map(s => s + " : TTY=a ; SUBJECT=spoof ; COMMAND=" + s),
      junk.map(s => "<189>date=2021-01-15 time=" + s),
      junk.map(s => "vhost:99999999999999999999 " + s),
      junk.map(s => "1.2.3.4 - - [" + s + "] \"" + s + "\" 200 -"),
      junk.map(s => "<134>{" + s),
      junk.map(s => s + " vendor=Websense " + s),
      junk.map(s => "@cee:" + s))
    check(Prop.forAll(Gen.listOf(hostile).map(_.take(5))) { lines =>
      val df = lines.toDF("message")
      graft.operators.VendorParsers.iptables(df).count() == lines.size &&
      graft.operators.VendorParsers.sudo(df).count() == lines.size &&
      graft.operators.VendorParsers.fortigate(df).count() == lines.size &&
      graft.operators.VendorParsers.apacheAccesslog(df).count() == lines.size &&
      graft.operators.VendorParsers.netskope(df).count() == lines.size &&
      graft.operators.VendorParsers.websense(df).count() == lines.size &&
      graft.operators.Scl.ceeParser(df).count() == lines.size
    })
  }

  test("text-analysis ops never throw on arbitrary text") {
    import org.apache.spark.sql.functions.col
    val junk: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.choose(' ', '~'),
      2 -> Gen.oneOf(' ', '\t', '\n', '@', '.', '<', '>'),
      1 -> Gen.oneOf('é', '中'),
      1 -> Gen.numChar)).map(_.mkString.take(200))
    check(Prop.forAll(Gen.listOf(junk).map(_.take(5))) { texts =>
      val df = texts.toDF("text")
      df.select(graft.pipeline.TextAnalysis.repetitionMetrics(col("text")))
        .count() == texts.size &&
      df.select(graft.pipeline.TextAnalysis.piiRedact(col("text")))
        .count() == texts.size
    })
  }

  test("SnmpTrapdScan never throws; hostile input fails closed") {
    // a throwing expression is a job-killer at scale: any byte soup —
    // truncated headers, stray brackets/parens/tabs, near-miss
    // timestamps — must yield ok=false (drop) or a parse, never an
    // exception
    val near: Gen[String] = Gen.oneOf(
      "2017-05-10 12:46:14 h [UDP: x]:",
      "2017-05-10 12:46:14 h [UDP: x]:\n",
      "2017-05-10 12:46:14 h [no-close\nk = v",
      "2017-05-10 12:46:14", "9999-99-99 99:99:99 h [x]:\nk = v",
      "2017-05-10 12:46:14 h [x]: ent\n\t T (1) Uptime: u\nk = v",
      "2017-05-10 12:46:14 h [x]: ent\n\t T (1 Uptime broken")
    val junk: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.choose(' ', '~'),
      2 -> Gen.oneOf('\t', '\n', '[', ']', '(', ')', '=', ':', '"'),
      1 -> Gen.numChar)).map(_.mkString.take(120))
    val hostile = Gen.oneOf(junk, near,
      junk.map("2017-05-10 12:46:14 host [UDP: t]:\n" + _))
    check(Prop.forAll(Gen.listOf(hostile).map(_.take(6))) { lines =>
      val df = lines.toDF("message")
      // parsed count <= input count and the query never throws
      Parsers.snmptrapdParser(df).count() <= lines.size
    })
  }

  test("substEach preserves non-matching text verbatim") {
    // the NUL-fence split/rebuild must be the identity off-match:
    // masking a corpus with no card numbers returns it untouched, and
    // arbitrary text never throws
    val junk: Gen[String] = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaChar, 2 -> Gen.oneOf(' ', '\n', '*', '$', '\\', '.'),
      1 -> Gen.choose('!', ','))).map(_.mkString.take(150))
    check(Prop.forAll(Gen.listOf(junk).map(_.take(6))) { texts =>
      val df = texts.toDF("message")
      val out = graft.operators.Rewrites.creditCardMask(df)
        .collect().map(_.getString(0)).toSeq
      out == texts // no digits -> no matches -> identity
    })
  }
  test("ParseNumber agrees with Long.parseLong on plain decimals") {
    check(Prop.forAll(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)) { n =>
      graft.config.ParseNumber.parseNumber(n.toString).contains(n) &&
        graft.config.ParseNumber.parseDecNumber(n.toString).contains(n) &&
        graft.config.ParseNumber.parseNumberWithSuffix(n.toString).contains(n)
    })
  }

  test("ParseNumber suffix multipliers compose") {
    val small = Gen.chooseNum(0L, 1000000L)
    check(Prop.forAll(small) { n =>
      graft.config.ParseNumber.parseNumberWithSuffix(n.toString + "K").contains(n * 1000L) &&
        graft.config.ParseNumber.parseNumberWithSuffix(n.toString + "Kib").contains(n * 1024L) &&
        graft.config.ParseNumber.parseNumberWithSuffix(n.toString + "b").contains(n)
    })
  }

  test("CfgLexerSubst escapes round-trip through value splicing") {
    // any value spliced into a "string" context must re-lex to the same
    // decoded content (encode-after-decode stability)
    val content = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.oneOf('"', '\\', ' ', '\n', '\r'),
      1 -> Gen.const('x'))).map(_.mkString.take(20))
    check(Prop.forAll(content) { v =>
      val quoted = "\"" + v.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case c => c.toString
      } + "\""
      val out = graft.config.CfgLexerSubst.invoke("\"`x`\"",
        Map("x" -> quoted), Map.empty, Map.empty)
      // the spliced string must decode back to v
      graft.config.CfgLexerSubst.extractStringLiteral(out).contains(v)
    })
  }

  test("list str-repr: parse(encode(xs)) == xs for any elements") {
    // any strings, incl. quotes/commas/controls/unicode — dropped only
    // rule: unquoted-empty elements skip, but encode quotes empties
    val anyStr = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 1 -> Gen.oneOf(',', '\'', '"', '\\', ' '),
      1 -> Gen.oneOf('\n', '\t', 'ű'))).map(_.mkString.take(15))
    val gen = Gen.listOf(anyStr).map(_.take(6))
    check(Prop.forAll(gen) { xs =>
      val sb = new java.lang.StringBuilder
      xs.zipWithIndex.foreach { case (x, i) =>
        if (i > 0) sb.append(',')
        graft.functions.ListRepr.encodeElement(x, sb)
      }
      val out = new scala.collection.mutable.ArrayBuffer[String]
      graft.functions.ListRepr.parse(sb.toString, out)
      out.toSeq == xs
    })
  }

  test("csv scan never throws and never loses bytes under greedy") {
    // arbitrary junk through the scanner: with a greedy last column and
    // no delimiters hit before it, concat of scanned values + skipped
    // delimiters covers the input; at minimum the scan must not throw
    val junk = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar, 1 -> Gen.oneOf(',', '"', '\'', '\\', ' ', '='),
      1 -> Gen.oneOf('\t', '\n', 'é'))).map(_.mkString.take(30))
    check(Prop.forAll(junk) { s =>
      val r = Seq(s).toDF("s")
        .select(graft.functions.CsvScan(col("s"), Seq("a", "b", "c"), ",",
          Nil, "\"\"''", "double-char", greedy = true, stripWhitespace = false,
          None).as("p"))
        .selectExpr("p.a", "p.b", "p.c", "p.valid").head()
      // never throws; greedy scan always consumes all input -> valid
      // unless a non-greedy column ran dry
      r.getBoolean(3) || (0 to 2).exists(r.isNullAt)
    })
  }

  test("HyperplaneBuckets == per-table HOF signer on arbitrary vectors, keys bounded") {
    // the compiled signer must agree with the Column-form chain on ANY
    // vector (the corpus spec covers the real data; this covers the
    // space) and every bucket stays under 2^planes
    val vecGen = Gen.listOfN(16,
      Gen.chooseNum(-2.0, 2.0).map(_.toFloat)).map(_.toSeq)
    check(Prop.forAll(Gen.listOfN(20, vecGen)) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "v")
      val planes = 6; val tables = 3
      val hof = df.select(col("vec_id"), array((0 until tables).map(t =>
        graft.pipeline.Similarity.hyperplaneBucket(col("v"), planes,
          91L + t, 16)): _*).as("bs"))
      val comp = df.select(col("vec_id"), graft.functions.HyperplaneBuckets(
        col("v"), 91L, planes, tables, 16).as("bs"))
      val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val c = comp.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      h == c && c.values.forall(_.forall(b => b >= 0 && b < (1L << planes)))
    })
  }

  test("chunking covers every token exactly once per stride window (both tokenizers)") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(5))
    val textGen = Gen.listOf(Gen.frequency(
      8 -> word, 1 -> Gen.const("42"), 1 -> Gen.const("a,b!"))).map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(8, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      Seq[(org.apache.spark.sql.Column => org.apache.spark.sql.Column, String)](
        ((t: org.apache.spark.sql.Column) =>
          filter(graft.pipeline.TextAnalysis.tokens(t), x => x =!= ""), " "),
        (graft.pipeline.TextAnalysis.bpeishTokens _, "")
      ).forall { case (tok, sep) =>
        val nTokens = df.select(col("doc_id"), size(tok(col("text"))).as("n"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        val chunks = graft.pipeline.TextAnalysis.chunkDocuments(df,
            col("doc_id"), col("text"), chunkTokens = 4, overlap = 1,
            tokenizer = tok, joinSep = sep)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        val byDoc = chunks.groupBy(_._1)
        byDoc.forall { case (did, cs) =>
          val n = nTokens(did)
          val sorted = cs.sortBy(_._2)
          // chunk k starts at k*stride; indices contiguous from 0; the
          // last chunk reaches token n exactly; every chunk non-empty
          sorted.map(_._2).toSeq == (0 until sorted.length) &&
            sorted.forall(_._3 > 0) &&
            sorted.last._2 * 3 + sorted.last._3 == n.toLong &&
            sorted.init.forall(_._3 == 4L)
        } && nTokens.forall { case (did, n) => (n == 0) == !byDoc.contains(did) }
      }
    })
  }

  test("packing conserves tokens and tiles sequences for arbitrary corpora (both counters)") {
    val textGen = Gen.listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar)
      .map(_.mkString.take(4))).map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(10, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        t => size(filter(graft.pipeline.TextAnalysis.tokens(t), x => x =!= ""))
          .cast("long"),
        t => graft.pipeline.TextAnalysis.bpeishTokenCount(t).cast("long")
      ).forall { counter =>
        val total = df.select(coalesce(sum(counter(col("text"))), lit(0L)))
          .head.getLong(0)
        val packed = graft.pipeline.TextAnalysis.packSequences(df,
            col("doc_id"), col("text"), seqLen = 5, groupSpan = 3,
            tokenCountOf = counter)
          .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
        packed.map(_._3).sum == total &&
          packed.groupBy(_._1).forall { case (_, rows) =>
            val slices = rows.map(r => (r._2, r._3)).sortBy(_._1)
            slices.head._1 == 0L &&
              slices.sliding(2).forall {
                case Array((o1, n1), (o2, _)) => o1 + n1 == o2
                case _ => true
              }
          }
      }
    })
  }

  test("SdataKeyEscape output is always a valid SD-NAME") {
    val raw = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('=', ' ', '[', ']', '"', '@'),
      1 -> Gen.oneOf('á', 'ű', '\u00ad'))).map(_.mkString.take(12))
    check(Prop.forAll(raw) { k =>
      val esc = graft.functions.SdataKeyEscape.escape(
        org.apache.spark.unsafe.types.UTF8String.fromString(k)).toString
      // no unsafe chars survive, and ASCII-only output
      esc.forall(c => c < 128 && c != '=' && c != ' ' && c != '[' &&
        c != ']' && c != '"')
    })
  }
}
