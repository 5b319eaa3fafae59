package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `parse_syslog(line, refYear)` — parse an RFC3164/RFC5424 line into a
  * struct (see [[graft.model.LogSchema.parsedSchema]]).
  *
  * Semantics follow `/root/reference/modules/syslogformat/syslog-format.c`.
  * Codegen emits one static call so the expression stays inside
  * whole-stage codegen (no interpreted fallback on the hot path).
  */
case class ParseSyslog(line: Expression, refYear: Expression,
    flags: Seq[String] = Nil, refMonth: Int = -1,
    badHostname: String = null) extends BinaryExpression {
  override def left: Expression = line
  override def right: Expression = refYear
  override def dataType: DataType = graft.model.LogSchema.parsedSchema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "parse_syslog"

  // flags(...) parse options (msg-format.h:37-60); utf8 flags are no-ops
  // on already-decoded strings
  private val noParse = flags.contains("no-parse")
  private val expectHostname = flags.contains("expect-hostname")
  private val noHostname = flags.contains("no-hostname")
  private val noParseDate = flags.contains("no-parse-date")
  private val syslogProtocol = flags.contains("syslog-protocol")
  private val checkHostname = flags.contains("check-hostname")
  private val noHeader = flags.contains("no-header")
  private val local = flags.contains("local")

  @transient private lazy val badRe: java.util.regex.Pattern =
    if (badHostname == null) null else java.util.regex.Pattern.compile(badHostname)

  /** Instance entry for the bad-hostname path (the compiled regex
    * travels with the expression). */
  def parseOne(l: UTF8String, y: Int): org.apache.spark.sql.catalyst.InternalRow =
    SyslogLineParser.parseRow(l, y, noParse, expectHostname, noHostname,
      noParseDate, refMonth, badRe, syslogProtocol, checkHostname, noHeader,
      local)

  override protected def nullSafeEval(l: Any, y: Any): Any =
    SyslogLineParser.parseRow(l.asInstanceOf[UTF8String], y.asInstanceOf[Int],
      noParse, expectHostname, noHostname, noParseDate, refMonth, badRe,
      syslogProtocol, checkHostname, noHeader, local)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (badHostname == null)
      // hot path: one STATIC call per row, no reference-object load
      nullSafeCodeGen(ctx, ev, (l, y) =>
        s"${ev.value} = graft.functions.SyslogLineParser.parseRow($l, $y, " +
          s"$noParse, $expectHostname, $noHostname, $noParseDate, $refMonth, " +
          s"null, $syslogProtocol, $checkHostname, $noHeader, $local);")
    else {
      val self = ctx.addReferenceObj("ps", this, classOf[ParseSyslog].getName)
      nullSafeCodeGen(ctx, ev, (l, y) =>
        s"${ev.value} = $self.parseOne($l, $y);")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ParseSyslog =
    copy(line = newLeft, refYear = newRight)
}

/** `ipv4_to_int(ip)` — dotted-quad to uint32 (as long), like the
  * reference's `$(ipv4-to-int)` (`/root/reference/modules/basicfuncs/
  * ip-funcs.c`). Null on malformed input. */
case class Ipv4ToInt(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ipv4_to_int"

  override protected def nullSafeEval(v: Any): Any = {
    val r = Ipv4ToInt.toLong(v.asInstanceOf[UTF8String])
    if (r < 0) null else java.lang.Long.valueOf(r)
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.functions.Ipv4ToInt.toLong($v);
         |if (${ev.value} < 0) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Ipv4ToInt = copy(c)
}

object Ipv4ToInt {
  /** Returns -1 on malformed input (valid results are in [0, 2^32)).
    * (Named `toLong`, not `eval`: a companion method named like the
    * instance `eval(InternalRow)` gets no static forwarder, which breaks
    * the generated java.) */
  def toLong(ip: UTF8String): Long = {
    val s = ip.toString
    var acc = 0L; var octet = -1L; var parts = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch >= '0' && ch <= '9') {
        octet = (if (octet < 0) 0 else octet) * 10 + (ch - '0')
        if (octet > 255) return -1L
      } else if (ch == '.') {
        if (octet < 0 || parts == 3) return -1L
        acc = (acc << 8) | octet; octet = -1; parts += 1
      } else return -1L
      i += 1
    }
    if (octet < 0 || parts != 3) return -1L
    (acc << 8) | octet
  }
}

/** `cidr_match(cidr, ip)` — netmask()/netmask6() CIDR containment
  * (`/root/reference/lib/filter/filter-netmask.c`, `filter-netmask6.c`).
  * The CIDR is config-time constant; the parsed network bytes + prefix
  * length ship inside the expression. Handles IPv4 and IPv6 literals
  * (no DNS — non-literal input is simply no-match). */
case class CidrMatch(child: Expression, cidr: String) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "cidr_match"

  @transient private lazy val compiled: (Array[Byte], Int) = CidrMatch.compile(cidr)

  def matches(ip: UTF8String): Boolean =
    CidrMatch.prefixMatch(CidrMatch.parseIp(ip.toString), compiled._1, compiled._2)

  override protected def nullSafeEval(v: Any): Any =
    matches(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cidrMatch", this, classOf[CidrMatch].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.matches($v);")
  }

  override protected def withNewChildInternal(c: Expression): CidrMatch = copy(child = c)
}

object CidrMatch {
  /** Lenient like the reference's filter init: an unparsable CIDR
    * (`aaaaaa/32`, `/8`, `::/599`, `::/aaa`), empty pattern or
    * out-of-range prefix compiles to a never-matching filter
    * (`test_filters_netmask6.c:175-190`); a bare address without `/`
    * is a host match (`::1` == `::1/128`, `127.0.0.1` == `/32`). */
  private[functions] def compile(cidr: String): (Array[Byte], Int) = {
    val slash = cidr.indexOf('/')
    val (addr, bitsStr) =
      if (slash < 0) (cidr, null)
      else (cidr.substring(0, slash), cidr.substring(slash + 1))
    val bytes = parseIp(addr)
    if (bytes == null) return (null, -1)
    val maxBits = bytes.length * 8
    val bits =
      if (bitsStr == null) maxBits
      else try bitsStr.toInt catch { case _: NumberFormatException => -1 }
    if (bits < 0 || bits > maxBits) (null, -1) else (bytes, bits)
  }

  /** Literal IPv4/IPv6 parse, null on anything else. IPv4 yields 4
    * bytes, IPv6 16 — families never cross-match (like the reference's
    * separate netmask/netmask6 filters). */
  private[functions] def parseIp(s: String): Array[Byte] = {
    if (s == null || s.isEmpty) return null
    val looksV4 = s.forall(c => (c >= '0' && c <= '9') || c == '.')
    val looksV6 = s.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
      (c >= 'A' && c <= 'F') || c == ':' || c == '.')
    if (!looksV4 && !looksV6) return null
    if (looksV4) {
      val v = Ipv4ToInt.toLong(UTF8String.fromString(s))
      if (v < 0) return null
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    } else try {
      // literal-only: getByName never resolves for valid v6 literals
      java.net.InetAddress.getByName(s).getAddress
    } catch { case _: Exception => null }
  }

  private[functions] def prefixMatch(ip: Array[Byte], net: Array[Byte], bits: Int): Boolean = {
    if (ip == null || net == null || ip.length != net.length) return false
    var remaining = bits
    var i = 0
    while (remaining >= 8) {
      if (ip(i) != net(i)) return false
      i += 1; remaining -= 8
    }
    if (remaining == 0) true
    else {
      val mask = (0xFF << (8 - remaining)) & 0xFF
      (ip(i) & mask) == (net(i) & mask)
    }
  }
}

/** `ipv6_to_longs(ip)` — IPv6 literal as array<bigint> [hi, lo] (network
  * byte order: hi = bytes 0..7). IPv4 literals are lifted to their
  * ::ffff:0:0/96 v4-mapped form, mirroring libmaxminddb's probe behavior
  * for v4 addresses against ip_version 6 databases
  * (`/root/reference/modules/geoip2/geoip-parser.c:56-70` semantics).
  * Null for non-literal input. */
case class Ipv6ToLongs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ipv6_to_longs"
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    Ipv6ToLongs.toLongs(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val out = ctx.freshName("v6")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $out =
          graft.functions.Ipv6ToLongs.toLongs(${c.value});
        if ($out != null) { ${ev.isNull} = false; ${ev.value} = $out; }
      }""")
  }

  override protected def withNewChildInternal(c: Expression): Ipv6ToLongs = copy(child = c)
}

object Ipv6ToLongs {
  def toLongs(s: UTF8String): ArrayData = {
    val b0 = CidrMatch.parseIp(s.toString)
    if (b0 == null) return null
    val b = if (b0.length == 16) b0 else {
      val m = new Array[Byte](16)
      m(10) = -1; m(11) = -1
      System.arraycopy(b0, 0, m, 12, 4)
      m
    }
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (b(i) & 0xFFL); i += 1 }
    while (i < 16) { lo = (lo << 8) | (b(i) & 0xFFL); i += 1 }
    new GenericArrayData(Array(hi, lo))
  }
}

/** `md4(s)` — hex MD4 digest for the reference's `$(md4)` template
  * function (`/root/reference/modules/cryptofuncs/cryptofuncs.c`; the
  * JDK ships no MD4 provider, so the compression function is
  * implemented from the public RFC 1320 specification). */
case class Md4(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md4"

  override protected def nullSafeEval(v: Any): Any =
    Md4.hex(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.Md4.hex($v)")

  override protected def withNewChildInternal(c: Expression): Md4 = copy(c)
}

object Md4 {
  def hex(s: UTF8String): UTF8String = {
    val d = digest(s.getBytes)
    val out = new Array[Byte](32)
    val hexChars = "0123456789abcdef"
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** RFC 1320: three 16-op rounds over 64-byte blocks, MD5-style
    * padding, little-endian state out. */
  def digest(msg: Array[Byte]): Array[Byte] = {
    var a = 0x67452301; var b = 0xefcdab89; var c = 0x98badcfe; var d = 0x10325476
    // append 0x80, zero-pad to 56 mod 64, then the 64-bit LE bit length
    val padZeros = (56 - (msg.length + 1) % 64 + 64) % 64
    val total = msg.length + 1 + padZeros + 8
    val buf = java.util.Arrays.copyOf(msg, total)
    buf(msg.length) = 0x80.toByte
    val bitLen = msg.length.toLong * 8
    var i = 0
    while (i < 8) { buf(total - 8 + i) = ((bitLen >>> (8 * i)) & 0xff).toByte; i += 1 }

    val x = new Array[Int](16)
    var off = 0
    while (off < total) {
      var j = 0
      while (j < 16) {
        val p = off + 4 * j
        x(j) = (buf(p) & 0xff) | ((buf(p + 1) & 0xff) << 8) |
          ((buf(p + 2) & 0xff) << 16) | ((buf(p + 3) & 0xff) << 24)
        j += 1
      }
      val (a0, b0, c0, d0) = (a, b, c, d)
      @inline def rotl(v: Int, s: Int): Int = (v << s) | (v >>> (32 - s))
      // round 1: F = (x&y)|(~x&z)
      var k = 0
      while (k < 16) {
        val f = (b & c) | (~b & d)
        val t = rotl(a + f + x(k), Md4.S1(k % 4))
        a = d; d = c; c = b; b = t
        k += 1
      }
      // round 2: G = (x&y)|(x&z)|(y&z), k column-major
      k = 0
      while (k < 16) {
        val g = (b & c) | (b & d) | (c & d)
        val t = rotl(a + g + x((k % 4) * 4 + k / 4) + 0x5a827999, Md4.S2(k % 4))
        a = d; d = c; c = b; b = t
        k += 1
      }
      // round 3: H = x^y^z, k bit-reversed order
      k = 0
      while (k < 16) {
        val h = b ^ c ^ d
        val t = rotl(a + h + x(Md4.K3(k)) + 0x6ed9eba1, Md4.S3(k % 4))
        a = d; d = c; c = b; b = t
        k += 1
      }
      a += a0; b += b0; c += c0; d += d0
      off += 64
    }
    val out = new Array[Byte](16)
    val state = Array(a, b, c, d)
    i = 0
    while (i < 16) { out(i) = ((state(i / 4) >>> (8 * (i % 4))) & 0xff).toByte; i += 1 }
    out
  }

  private val S1 = Array(3, 7, 11, 19)
  private val S2 = Array(3, 5, 9, 13)
  private val S3 = Array(3, 9, 11, 15)
  private val K3 = Array(0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15)
}

/** C printf `%.*f` of a double: the EXACT binary expansion, correctly
  * rounded like glibc — Java's Formatter zero-pads past ~17 significant
  * digits, so the reference's 20-decimal float renders
  * (`/root/reference/modules/basicfuncs/numeric-funcs.c` format_number,
  * precision 20) can't use format_string. */
case class CFormatDouble(child: Expression, precision: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "c_format_double"

  override protected def nullSafeEval(v: Any): Any =
    CFormatDouble.fmt(v.asInstanceOf[Double], precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d =>
      s"${ev.value} = graft.functions.CFormatDouble.fmt($d, $precision);")

  override protected def withNewChildInternal(newChild: Expression): CFormatDouble =
    copy(child = newChild)
}

object CFormatDouble {
  def fmt(d: Double, p: Int): UTF8String = UTF8String.fromString {
    if (java.lang.Double.isNaN(d)) "nan"
    else if (java.lang.Double.isInfinite(d)) (if (d > 0) "inf" else "-inf")
    else new java.math.BigDecimal(d)
      .setScale(p, java.math.RoundingMode.HALF_EVEN).toPlainString
  }
}

/** RFC5424 SD-NAME escaping (`/root/reference/lib/logmsg/logmsg.c:882-900`
  * log_msg_sdata_append_key_escaped): the spec has no key escaping, so
  * bytes outside ASCII and the structurally unsafe `= space [ ] "` set
  * percent-encode as uppercase %XX per UTF-8 byte — "bácsi" renders
  * b%C3%A1csi, "bar[0]" renders bar%5B0%5D, while '@' and friends stay. */
case class SdataKeyEscape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sdata_key_escape"

  override protected def nullSafeEval(v: Any): Any =
    SdataKeyEscape.escape(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SdataKeyEscape.escape($s);")

  override protected def withNewChildInternal(c: Expression): SdataKeyEscape =
    copy(child = c)
}

object SdataKeyEscape {
  def escape(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b >= 0x80 || b == '=' || b == ' ' || b == '[' || b == ']' || b == '"')
        sb.append(f"%%$b%02X")
      else sb.append(b.toChar)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** WELF value escaping (`/root/reference/lib/utf8utils.c:62-110`
  * append_unsafe_utf8_as_escaped_BINARY, as `$(format-welf)` calls it —
  * format-welf.c:67-74): \b \f \n \r \t named, backslash doubled,
  * other control chars < 32 as `\x%02x`; in the quoted form (values
  * containing a space) the double quote is the one unsafe char and
  * escapes as `\"`. DEL and C1 controls pass through (the reference
  * only special-cases uchar < 32). */
case class WelfEscape(child: Expression, quoted: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "welf_escape"

  override protected def nullSafeEval(v: Any): Any =
    WelfEscape.escape(v.asInstanceOf[UTF8String], quoted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WelfEscape.escape($s, $quoted);")

  override protected def withNewChildInternal(c: Expression): WelfEscape =
    copy(child = c)
}

object WelfEscape {
  def escape(s: UTF8String, quoted: Boolean): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length + 8)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      c match {
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\\' => sb.append("\\\\")
        case ctrl if ctrl < ' ' => sb.append(f"\\x${ctrl.toInt}%02x")
        case '"' if quoted => sb.append("\\\"")
        case other => sb.append(other)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** CEF extension-value escaping (`/root/reference/modules/cef/
  * format-cef-extension.c:67-107` tf_cef_append_escaped): `=`, `\n`,
  * `\r`, `\\` get backslash escapes; NUL renders `\x00` (the invalid-
  * byte path of the reference's UTF-8 walk); other control chars < 32
  * render `\u%04x` (TAB is \\u0009); everything else passes through. */
case class CefEscape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cef_escape"

  override protected def nullSafeEval(v: Any): Any =
    CefEscape.escape(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CefEscape.escape($s);")

  override protected def withNewChildInternal(c: Expression): CefEscape =
    copy(child = c)
}

object CefEscape {
  def escape(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length + 8)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      c match {
        case '=' => sb.append("\\=")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\\' => sb.append("\\\\")
        case '\u0000' => sb.append("\\x00")
        case ctrl if ctrl < 32 => sb.append(f"\\u${ctrl.toInt}%04x")
        case other => sb.append(other)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** linux-audit hex-dump decode (`/root/reference/modules/kvformat/
  * linux-audit-parser.c:73-131` _parse_linux_audit_hexstring): decodes
  * an even-length all-hex value, mapping NUL separators to TAB, but
  * ONLY when at least one decoded byte is something the kernel would
  * have hex-escaped (< 0x21, > 0x7e, or '"') AND the result is valid
  * UTF-8 — "41607E" stays raw because A`~ never needed escaping.
  * Null when the value doesn't qualify (callers fall back to the raw
  * text). */
case class AuditHexDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "audit_hex_decode"

  override protected def nullSafeEval(v: Any): Any =
    AuditHexDecode.decode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.functions.AuditHexDecode.decode($s);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(c: Expression): AuditHexDecode =
    copy(child = c)
}

object AuditHexDecode {
  def decode(v: UTF8String): UTF8String = {
    val s = v.toString
    val n = s.length
    if (n == 0 || (n % 2) != 0) return null
    val bytes = new Array[Byte](n / 2)
    var escapeworthy = false
    var i = 0
    while (i < n) {
      val hi = Character.digit(s.charAt(i), 16)
      val lo = Character.digit(s.charAt(i + 1), 16)
      if (hi < 0 || lo < 0) return null
      var b = (hi << 4) | lo
      if (b < 0x21 || b > 0x7e || b == '"') escapeworthy = true
      if (b == 0) b = '\t'
      bytes(i / 2) = b.toByte
      i += 2
    }
    if (!escapeworthy) return null
    // g_utf8_validate: reject invalid UTF-8 output
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      UTF8String.fromString(out)
    } catch {
      case _: java.nio.charset.CharacterCodingException => null
    }
  }
}

/** Arbitrary-charset decode (the `encoding()` source option,
  * `lib/logproto/logproto-text-server.c` + logreader options): Spark's
  * `decode` only speaks the ANSI charset shortlist, but syslog sources
  * regularly declare iso-8859-x / windows-125x payloads. MID-STREAM
  * invalid byte sequences decode with the replacement character (GLib
  * conversion inserts replacements rather than failing mid-stream),
  * but an INCOMPLETE multi-byte sequence at the very end of the
  * payload is DROPPED, not replaced — the text server's EOF-with-
  * conversion-leftovers path ("EOF read on a channel with leftovers
  * from previous character conversion, dropping input",
  * test-text-server.c:177-193): a lone 0xC3 tail yields no output, not
  * U+FFFD. */
case class CharsetDecode(child: Expression, charset: String,
    frame: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "charset_decode"

  override protected def nullSafeEval(v: Any): Any =
    CharsetDecode.decode(v.asInstanceOf[Array[Byte]], charset, frame)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = graft.functions.CharsetDecode.decode($b, "$charset", $frame);""")

  override protected def withNewChildInternal(c: Expression): CharsetDecode =
    copy(child = c)
}

object CharsetDecode {
  def decode(bytes: Array[Byte], charset: String): UTF8String =
    decode(bytes, charset, frame = false)

  /** `frame = false`: the stream form — a trailing incomplete sequence
    * drops silently (the text server's EOF-leftovers path).
    * `frame = true`: the record form — a frame whose bytes don't
    * convert in their entirety is an ERROR
    * ("Byte sequence too short, cannot convert an individual frame in
    * its entirety", logproto-record-server.c via
    * test-record-server.c:131-147). */
  def decode(bytes: Array[Byte], charset: String, frame: Boolean): UTF8String = {
    import java.nio.charset.{Charset, CodingErrorAction}
    val dec = Charset.forName(charset).newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val cb = java.nio.CharBuffer.allocate(
      (bytes.length * dec.maxCharsPerByte()).toInt + 1)
    // endOfInput = false: a trailing INCOMPLETE sequence stays
    // unconsumed (UNDERFLOW) and is dropped — never flushed into a
    // replacement char (the reference's EOF-leftovers drop)
    dec.decode(bb, cb, false)
    if (frame && bb.hasRemaining)
      throw new IllegalArgumentException(
        "Byte sequence too short, cannot convert an individual frame in its entirety")
    if (!bb.hasRemaining) {
      // fully consumed: FINISH the decode — stateful/shift charsets
      // (ISO-2022-*) may hold pending output or final shift state that
      // only the endOfInput pass + flush() emit; skipping them silently
      // dropped trailing chars even when every input byte was consumed
      dec.decode(bb, cb, true)
      dec.flush(cb)
    }
    cb.flip()
    UTF8String.fromString(cb.toString)
  }
}

/** Column builders + SQL registration for graft's custom expressions. */
object GraftFunctions {
  import org.apache.spark.sql.functions.lit

  def parse_syslog(line: Column, refYear: Int = 2024): Column =
    parse_syslog(line, refYear, Nil)

  def parse_syslog(line: Column, refYear: Int, flags: Seq[String]): Column =
    ColumnBridge.column(ParseSyslog(
      ColumnBridge.expression(line),
      ColumnBridge.expression(lit(refYear)), flags))

  /** parse_syslog with a reference month enabling the missing-year
    * Dec/Jan adjacency heuristic (wallclocktime.c
    * determine_year_for_month). */
  def parse_syslog(line: Column, refYear: Int, refMonth: Int,
      flags: Seq[String]): Column =
    ColumnBridge.column(ParseSyslog(
      ColumnBridge.expression(line),
      ColumnBridge.expression(lit(refYear)), flags, refMonth))

  /** parse_syslog with the global `bad-hostname()` regex: a first
    * token matching it is never taken as the hostname
    * (msg-format.h bad_hostname). */
  def parse_syslog(line: Column, refYear: Int, flags: Seq[String],
      badHostname: String): Column =
    ColumnBridge.column(ParseSyslog(
      ColumnBridge.expression(line),
      ColumnBridge.expression(lit(refYear)), flags, -1, badHostname))

  def ipv4_to_int(ip: Column): Column =
    ColumnBridge.column(Ipv4ToInt(ColumnBridge.expression(ip)))

  def cidr_match(cidr: String, ip: Column): Column =
    ColumnBridge.column(CidrMatch(ColumnBridge.expression(ip), cidr))

  def ipv6_to_longs(ip: Column): Column =
    ColumnBridge.column(Ipv6ToLongs(ColumnBridge.expression(ip)))

  def md4(s: Column): Column =
    ColumnBridge.column(Md4(ColumnBridge.expression(s)))

  def c_format_double(d: Column, precision: Int): Column =
    ColumnBridge.column(CFormatDouble(ColumnBridge.expression(d), precision))

  def sdata_key_escape(s: Column): Column =
    ColumnBridge.column(SdataKeyEscape(ColumnBridge.expression(s)))

  def cef_escape(s: Column): Column =
    ColumnBridge.column(CefEscape(ColumnBridge.expression(s)))

  def welf_escape(s: Column, quoted: Boolean): Column =
    ColumnBridge.column(WelfEscape(ColumnBridge.expression(s), quoted))

  def audit_hex_decode(s: Column): Column =
    ColumnBridge.column(AuditHexDecode(ColumnBridge.expression(s)))

  def charset_decode(bytes: Column, charset: String): Column =
    ColumnBridge.column(CharsetDecode(ColumnBridge.expression(bytes), charset))

  /** Record-frame decode: incomplete trailing sequence = loud error
    * (the padded-record server's per-frame conversion contract). */
  def charset_decode_frame(bytes: Column, charset: String): Column =
    ColumnBridge.column(CharsetDecode(ColumnBridge.expression(bytes), charset,
      frame = true))

  /** Register SQL names (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("parse_syslog", {
      case Seq(l) => ParseSyslog(l, Literal(2024))
      case Seq(l, y) => ParseSyslog(l, y)
      case _ => throw new IllegalArgumentException("parse_syslog(line[, refYear])")
    }, "built-in")
    reg.createOrReplaceTempFunction("ipv4_to_int",
      exprs => Ipv4ToInt(exprs.head), "built-in")
  }
}
